package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement, SQLException}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** JDBC sink/source with the reference's relational semantics
  * (`consumer.py:127-197`, `cdc_data_dump.sql:27-40`): the CDC event log
  * is an append-only table with UNIQUE(event_id), and replayed events are
  * dropped — Postgres `ON CONFLICT (event_id) DO NOTHING`.
  *
  * Idempotence is implemented portably: each partition batch-inserts
  * inside a transaction; a duplicate-key failure rolls the batch back and
  * re-applies row-by-row, swallowing ONLY SQLState 23505 (unique
  * violation — the same state on Postgres, Derby, H2). On a dialect with
  * a conflict clause, pass `insertSuffix = "ON CONFLICT (event_id) DO
  * NOTHING"` and the fallback never triggers. JdbcSinkSpec exercises the
  * whole path against embedded Derby (ships with Spark — no new
  * dependency).
  *
  * Scale notes: one connection per partition, batched statements,
  * single-transaction-per-batch — the JDBC analog of the micro-batch
  * apply. The event log's parquet form stays the source of truth at
  * 100 TB; this sink serves the reference's operational-Postgres role
  * (dashboards, point lookups), where the working set is the CURRENT
  * state, not the full history.
  */
object JdbcSink {

  /** Idempotent append: INSERT every row, silently dropping rows that
    * violate the table's unique/primary key. Map/array/struct columns
    * must be serialized (e.g. `to_json`) by the caller first — same as
    * the reference storing payloads as JSONB text.
    */
  def appendDedup(
      df: DataFrame,
      url: String,
      table: String,
      insertSuffix: String = "",
      batchSize: Int = 500
  ): Unit = {
    val schema = df.schema
    schema.fields.foreach { f =>
      require(
        atomic(f.dataType),
        s"JDBC sink needs atomic columns; serialize ${f.name}: ${f.dataType.simpleString} first (to_json)"
      )
    }
    val cols = schema.fieldNames
    val insert =
      s"INSERT INTO $table (${cols.mkString(", ")}) VALUES (${cols.map(_ => "?").mkString(", ")}) $insertSuffix".trim
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val conn = DriverManager.getConnection(url)
        try {
          conn.setAutoCommit(false)
          val ps = conn.prepareStatement(insert)
          rows.grouped(batchSize).foreach { group =>
            try {
              group.foreach { r => bind(ps, r, schema); ps.addBatch() }
              ps.executeBatch()
              conn.commit()
            } catch {
              case e: SQLException if isUniqueViolation(e) =>
                conn.rollback()
                // JDBC leaves post-failure batch contents driver-defined:
                // some drivers keep the unexecuted commands queued, and
                // the NEXT group's addBatch would re-execute them. Clear
                // explicitly before reusing the statement.
                ps.clearBatch()
                insertRowByRow(conn, insert, schema, group)
            }
          }
        } finally conn.close()
      }
    }
  }

  /** Read a JDBC table back as a DataFrame (thin `spark.read.jdbc`;
    * partitioned reads via the standard partitionColumn options belong
    * at the call site).
    */
  def read(spark: SparkSession, url: String, table: String): DataFrame =
    spark.read.format("jdbc").option("url", url).option("dbtable", table).load()

  /** The per-row retry path of [[appendDedup]]: one statement per row,
    * each guarded by a SAVEPOINT. On PostgreSQL any error aborts the
    * whole transaction (every later statement fails with 25P02), so
    * swallowing 23505 alone is not enough — the savepoint rollback
    * restores the transaction after each duplicate, which also works on
    * Derby/H2. Commit once at the end.
    */
  private def insertRowByRow(
      conn: Connection,
      insert: String,
      schema: StructType,
      rows: Seq[Row]
  ): Unit = {
    val ps = conn.prepareStatement(insert)
    rows.foreach { r =>
      val sp = conn.setSavepoint()
      try {
        bind(ps, r, schema)
        ps.executeUpdate()
        conn.releaseSavepoint(sp)
      } catch {
        case e: SQLException if isUniqueViolation(e) =>
          conn.rollback(sp) // ON CONFLICT DO NOTHING
      }
    }
    conn.commit()
  }

  private def isUniqueViolation(e: SQLException): Boolean = {
    // BatchUpdateException wraps the violation as next/cause on some drivers
    var cur: SQLException = e
    while (cur != null) {
      if (cur.getSQLState == "23505") return true
      cur = Option(cur.getNextException).getOrElse(
        cur.getCause match { case s: SQLException => s; case _ => null }
      )
    }
    false
  }

  private def atomic(t: DataType): Boolean = t match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _ => true
  }

  private def bind(ps: PreparedStatement, row: Row, schema: StructType): Unit =
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      if (row.isNullAt(i)) ps.setObject(i + 1, null)
      else f.dataType match {
        case StringType => ps.setString(i + 1, row.getString(i))
        case TimestampType => ps.setTimestamp(i + 1, row.getAs[java.sql.Timestamp](i))
        case DateType => ps.setDate(i + 1, row.getAs[java.sql.Date](i))
        case BooleanType => ps.setBoolean(i + 1, row.getBoolean(i))
        case _ => ps.setObject(i + 1, row.get(i))
      }
    }
}
