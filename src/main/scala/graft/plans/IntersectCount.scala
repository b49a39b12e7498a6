package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ArrayIntersect, BinaryExpression, Expression, Size}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Distinct-common-element count of two `array<bigint>` columns —
  * exactly `size(array_intersect(a, b))`, without materializing the
  * intersection: sort two primitive copies, merge-count skipping
  * duplicates. The builtin pair builds a hash set AND allocates the
  * result array only for `size` to read its length; on the dedup
  * verify joins (d67/e8), where this runs once per candidate pair over
  * hash arrays the length of a document, the count is the only thing
  * ever consumed. Null elements follow `array_intersect`: a null
  * present in BOTH arrays counts once.
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"intersect_count expects two array<bigint>, got ${l.sql}, ${r.sql}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.IntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IntersectCount =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  def compute(a: ArrayData, b: ArrayData): Int = {
    val (xs, nullA) = longsOf(a)
    val (ys, nullB) = longsOf(b)
    java.util.Arrays.sort(xs)
    java.util.Arrays.sort(ys)
    var i = 0; var j = 0; var n = 0
    while (i < xs.length && j < ys.length) {
      val x = xs(i); val y = ys(j)
      if (x == y) {
        n += 1
        while (i < xs.length && xs(i) == x) i += 1
        while (j < ys.length && ys(j) == x) j += 1
      } else if (x < y) i += 1
      else j += 1
    }
    if (nullA && nullB) n + 1 else n
  }

  private def longsOf(arr: ArrayData): (Array[Long], Boolean) = {
    val n = arr.numElements()
    var hasNull = false
    var cnt = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true else cnt += 1
      i += 1
    }
    val out = new Array[Long](cnt)
    i = 0
    var k = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { out(k) = arr.getLong(i); k += 1 }
      i += 1
    }
    (out, hasNull)
  }
}

/** Optimizer rule: rewrite `size(array_intersect(a, b))` over long
  * arrays into [[IntersectCount]]. Injected by
  * [[graft.GraftExtensions]], so the rewrite applies cluster-wide via
  * `spark.sql.extensions` with no query change — the Catalyst-native
  * way to retrofit a cheaper kernel under an existing declarative
  * surface. Guarded to `legacySizeOfNull = false` (the default;
  * legacy mode returns -1 for null input, which IntersectCount does
  * not model) and to long element types on BOTH sides.
  */
object IntersectCountRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(l, r), false)
          if isLongArray(l.dataType) && isLongArray(r.dataType) =>
        IntersectCount(l, r)
    }

  private def isLongArray(dt: DataType): Boolean = dt match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
}
