package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSession

/** Property-style tests for the diff operator (SURVEY.md §5:
  * diff(a,a)=∅, apply(diff(a,b), a) = b, insert/delete duality) over
  * seeded randomized snapshots — deterministic, no extra test deps
  * (scalatest+scalacheck only are on the classpath; the scalatestplus
  * bridge is not, so cases are generated with a fixed-seed Random).
  */
class DiffPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSession.spark
  import spark.implicits._

  private type Snap = Map[String, (Option[String], Option[String])]

  private def genSnapshot(rnd: scala.util.Random): Snap = {
    val cells = Seq(Some("1"), Some("2"), Some("x"), Some("y"), None)
    (0 until rnd.nextInt(10)).map { _ =>
      val k = rnd.nextInt(10).toString
      (k, (cells(rnd.nextInt(cells.length)), cells(rnd.nextInt(cells.length))))
    }.toMap
  }

  private def toDf(m: Snap) =
    m.toSeq.map { case (k, (a, b)) => (k, a, b) }.toDF("k", "a", "b")

  private val cases: Seq[(Snap, Snap)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(12)((genSnapshot(rnd), genSnapshot(rnd)))
  }

  test("diff(x, x) is always empty") {
    cases.map(_._1).filter(_.nonEmpty).foreach { m =>
      assert(SnapshotDiff.diff(toDf(m), Some(toDf(m)), "k").count() === 0, s"case: $m")
    }
  }

  test("applying diff(prev -> next) onto prev reconstructs next") {
    cases.foreach { case (prev, next) =>
      val events = SnapshotDiff
        .diff(toDf(next), Some(toDf(prev)), "k")
        .select("event_type", "key_value", "new_values")
        .collect()
        .map(r =>
          (r.getString(0), r.getString(1),
            Option(r.getMap[String, String](2)).map(_.toMap).getOrElse(Map.empty[String, String]))
        )
      val reconstructed = events.foldLeft(prev.map { case (k, (a, b)) =>
        k -> Map("a" -> a.orNull, "b" -> b.orNull)
      }) { case (state, (etype, k, newVals)) =>
        etype match {
          case "delete" => state - k
          case _ =>
            state + (k -> Map(
              "a" -> newVals.getOrElse("a", null),
              "b" -> newVals.getOrElse("b", null)
            ))
        }
      }
      val want = next.map { case (k, (a, b)) => k -> Map("a" -> a.orNull, "b" -> b.orNull) }
      assert(reconstructed === want, s"prev=$prev next=$next")
    }
  }

  test("insert/delete duality: swapping snapshots swaps insert and delete sets") {
    cases.foreach { case (prev, next) =>
      val fwd = SnapshotDiff.diff(toDf(next), Some(toDf(prev)), "k")
        .select("event_type", "key_value").as[(String, String)].collect()
      val bwd = SnapshotDiff.diff(toDf(prev), Some(toDf(next)), "k")
        .select("event_type", "key_value").as[(String, String)].collect()
      def keys(evs: Array[(String, String)], t: String) = evs.filter(_._1 == t).map(_._2).toSet
      assert(keys(fwd, "insert") === keys(bwd, "delete"))
      assert(keys(fwd, "delete") === keys(bwd, "insert"))
      assert(keys(fwd, "update") === keys(bwd, "update"))
    }
  }
}
