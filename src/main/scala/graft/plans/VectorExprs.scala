package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native vector expressions over `array<float>` embedding columns.
  *
  * Precision contract: every element is widened float→double and the
  * fold is sequential left-to-right — identical to the composed
  * `aggregate(zip_with(…))` formulation AND to the DuckDB oracle's
  * `list_aggregate('sum')`, so cosine scores stay bit-exact while the
  * interpreted per-element lambda overhead disappears.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression {

  private def okType(dt: DataType) = dt match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects array<float|double>, got ${left.dataType.sql}, ${right.dataType.sql}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  private def isFloatL = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def isFloatR = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.compute(a.asInstanceOf[ArrayData], isFloatL,
      b.asInstanceOf[ArrayData], isFloatR)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.CosineSim.compute($a, $isFloatL, $b, $isFloatR);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x: Double = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y: Double = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }
}

/** All multi-table sign-LSH buckets of a vector in one pass: output is
  * `array<long>` with one bucket id per hash table. The plane matrix is
  * part of the expression (tiny, deterministic, travels with the plan —
  * a broadcast-free literal). Sign rule: projection >= 0 sets bit i,
  * matching the composed `when(proj >= 0, 1<<i)` formulation.
  */
case class LshBuckets(child: Expression, planes: Seq[Seq[Double]],
                      planesPerTable: Int) extends UnaryExpression {
  // Seq params keep case-class equality value-based (semanticEquals/CSE)
  require(planes.nonEmpty && planes.length % planesPerTable == 0)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val flat: Array[Double] = planes.flatten.toArray
  @transient private lazy val dim: Int = planes.head.length

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], isFloat, flat, dim,
      planes.length, planesPerTable)

  // plane matrix goes into a codegen reference object rather than a
  // giant literal string
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("lshPlanesFlat", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.LshBuckets.compute($c, $isFloat, $flatRef, " +
        s"$dim, ${planes.length}, $planesPerTable);")
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

object LshBuckets {
  def compute(v: ArrayData, vFloat: Boolean, flat: Array[Double], dim: Int,
              nPlanes: Int, planesPerTable: Int): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      vec(i) = if (vFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val nTables = nPlanes / planesPerTable
    val out = new Array[Any](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0L
      var p = 0
      while (p < planesPerTable) {
        val base = (t * planesPerTable + p) * dim
        var proj = 0.0
        var j = 0
        while (j < n) { proj += vec(j) * flat(base + j); j += 1 }
        if (proj >= 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = java.lang.Long.valueOf(bucket)
      t += 1
    }
    new GenericArrayData(out)
  }
}
