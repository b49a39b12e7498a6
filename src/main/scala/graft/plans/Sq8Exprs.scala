package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native scalar-quantization (SQ8) expressions.
  *
  * Why native and not composed per-dimension built-ins: a 64-dim
  * encode unrolled as `array(least(floor(...)), ...)` plus a 64-term
  * score sum expands into ONE generated method whose bytecode exceeds
  * Janino's 64 KB hard limit — whole-stage codegen then compiles the
  * plan, fails, and (with the default `spark.sql.codegen.fallback`)
  * silently re-runs the stage INTERPRETED. The bench's fallback gate
  * caught e15/e17 doing exactly that. These loop expressions generate
  * a one-call method body instead, and each is a single `while` over
  * the dimension.
  *
  * Precision contract (the DuckDB oracle reproduces both formulas
  * bit-exactly, so the math must not be "improved"):
  *  - encode: `min(floor((x − mn_i) · 255 / (mx_i − mn_i)), 255)` as
  *    double math in that association, cast to int; a zero-range
  *    dimension emits code 0 (the round-5 NaN guard).
  *  - score: left-to-right d-ascending fold of
  *    `q_i · (mn_i + (code_i + 0.5) · scale_i)` with
  *    `scale_i = (mx_i − mn_i) / 255` precomputed in double.
  */
object Sq8Compute {

  def encode(v: ArrayData, isFloat: Boolean,
             mns: Array[Double], mxs: Array[Double]): GenericArrayData = {
    val d = mns.length
    val out = new Array[Int](d)
    var i = 0
    while (i < d) {
      val mn = mns(i); val mx = mxs(i)
      if (mx != mn) {
        val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
        out(i) = Math.min(Math.floor((x - mn) * 255.0 / (mx - mn)), 255.0).toInt
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  def score(q: ArrayData, isFloat: Boolean, code: ArrayData,
            mns: Array[Double], scales: Array[Double]): Double = {
    val d = mns.length
    if (d == 0) return 0.0
    def qAt(i: Int): Double =
      if (isFloat) q.getFloat(i).toDouble else q.getDouble(i)
    // seed with term 0 (not 0.0 + term0) so the fold is EXACTLY the
    // left-assoc reduce of the composed formulation, -0.0 included
    var s = qAt(0) * (mns(0) + (code.getInt(0) + 0.5) * scales(0))
    var i = 1
    while (i < d) {
      s += qAt(i) * (mns(i) + (code.getInt(i) + 0.5) * scales(i))
      i += 1
    }
    s
  }
}

/** Per-dimension 8-bit codes of an embedding under global min/max
  * scalar quantization — see [[Sq8Compute.encode]]. */
case class Sq8Encode(child: Expression, mns: Seq[Double], mxs: Seq[Double])
    extends UnaryExpression {
  private def isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val mnArr = mns.toArray
  private lazy val mxArr = mxs.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode expects array<float|double>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(input: Any): Any =
    Sq8Compute.encode(input.asInstanceOf[ArrayData], isFloat, mnArr, mxArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mns", mnArr, "double[]")
    val mxRef = ctx.addReferenceObj("sq8Mxs", mxArr, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.Sq8Compute.encode($c, $isFloat, $mnRef, $mxRef);")
  }
  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** Inner product of a float query against the midpoint reconstruction
  * of an SQ8 code — see [[Sq8Compute.score]]. */
case class Sq8Score(left: Expression, right: Expression,
                    mns: Seq[Double], scales: Seq[Double])
    extends BinaryExpression {
  private def isFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val mnArr = mns.toArray
  private lazy val scArr = scales.toArray

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"sq8_score expects (array<float|double>, array<int>), got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_score"

  override def nullSafeEval(q: Any, code: Any): Any =
    Sq8Compute.score(q.asInstanceOf[ArrayData], isFloat,
      code.asInstanceOf[ArrayData], mnArr, scArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mnRef = ctx.addReferenceObj("sq8Mns", mnArr, "double[]")
    val scRef = ctx.addReferenceObj("sq8Scales", scArr, "double[]")
    nullSafeCodeGen(ctx, ev, (q, c) =>
      s"${ev.value} = graft.plans.Sq8Compute.score($q, $isFloat, $c, $mnRef, $scRef);")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Sq8Score =
    copy(left = l, right = r)
}
