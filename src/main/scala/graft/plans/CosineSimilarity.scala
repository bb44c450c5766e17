package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native cosine similarity over two float/double array columns.
  *
  * Rationale (SURVEY.md §7.3 custom-surface policy: compose built-ins
  * first, custom Expression second): the built-in formulation
  * `aggregate(zip_with(a,b,*),0.0,+)` allocates an intermediate array
  * and boxes per element; this expression runs one primitive loop per
  * row with zero allocation. Summation order matches the sequential
  * fold exactly (acc starts at 0.0, left-to-right), so results are
  * bit-identical to [[graft.functions.Fns.cosine]] — asserted in
  * PlansSpec.
  *
  * Interpreted eval (CodegenFallback): the per-row loop IS the hot
  * loop; codegen would inline the same arithmetic. Null if either side
  * is null, mismatched lengths raise.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects array<float|double>, got ${left.dataType} / ${right.dataType}"
      )
  }

  @inline private def valueAt(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    require(b.numElements() == n, s"cosine_sim: length mismatch $n vs ${b.numElements()}")
    val af = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
    val bf = right.dataType.asInstanceOf[ArrayType].elementType == FloatType
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = valueAt(a, i, af)
      val y = valueAt(b, i, bf)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression,
      newRight: Expression
  ): Expression = copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Column-API entry point. */
  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(
      CosineSimilarity(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b))
    )
}
