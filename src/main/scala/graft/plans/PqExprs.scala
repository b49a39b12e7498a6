package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native product-quantization expressions (SURVEY §2c `e7_pq_adc`).
  *
  * The codebook rides inside the expression as a flattened `Seq` param
  * (value equality → semanticEquals/CSE) and enters generated code as a
  * reference object — the inline-literal formulation of the same math
  * exceeded Janino's method limit at m·ks·subDim = 1024 literals and
  * fell out of codegen entirely.
  *
  * Precision contract (shared with the DuckDB oracle): subvector
  * distances accumulate d-ascending in double (`sum += diff*diff`);
  * argmin scans j-ascending with strict `<`, so ties keep the first
  * codeword — exactly `list_position(dl, list_min(dl))`.
  *
  * Codebook layout: `flat((s*ks + j)*subDim + d)` = component d of
  * codeword j in subspace s.
  */
object PqCompute {
  /** A short vector would otherwise surface as a context-free
    * ArrayIndexOutOfBounds deep in generated code. */
  private def checkDim(v: ArrayData, m: Int, subDim: Int): Unit =
    if (v.numElements() < m * subDim)
      throw new IllegalArgumentException(
        s"PQ input vector has ${v.numElements()} components, needs >= ${m * subDim}")

  def subDist(v: ArrayData, vFloat: Boolean, flat: Array[Double],
              s: Int, j: Int, ks: Int, subDim: Int): Double = {
    val base = (s * ks + j) * subDim
    val off = s * subDim
    var sum = 0.0
    var d = 0
    while (d < subDim) {
      val x = if (vFloat) v.getFloat(off + d).toDouble else v.getDouble(off + d)
      val diff = x - flat(base + d)
      sum += diff * diff
      d += 1
    }
    sum
  }

  def encode(v: ArrayData, vFloat: Boolean, flat: Array[Double],
             m: Int, ks: Int, subDim: Int): ArrayData = {
    checkDim(v, m, subDim)
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      var best = Double.PositiveInfinity
      var code = 0
      var j = 0
      while (j < ks) {
        val dist = subDist(v, vFloat, flat, s, j, ks, subDim)
        if (dist < best) { best = dist; code = j }
        j += 1
      }
      out(s) = java.lang.Integer.valueOf(code)
      s += 1
    }
    new GenericArrayData(out)
  }

  def lut(v: ArrayData, vFloat: Boolean, flat: Array[Double],
          m: Int, ks: Int, subDim: Int): ArrayData = {
    checkDim(v, m, subDim)
    val out = new Array[Any](m * ks)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < ks) {
        out(s * ks + j) =
          java.lang.Double.valueOf(subDist(v, vFloat, flat, s, j, ks, subDim))
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** ADC: sum of the code-selected lookup cells, s-ascending. */
  def adc(lut: ArrayData, code: ArrayData, ks: Int): Double = {
    val m = code.numElements()
    var sum = 0.0
    var s = 0
    while (s < m) {
      sum += lut.getDouble(s * ks + code.getInt(s))
      s += 1
    }
    sum
  }
}

trait PqCodebook { self: UnaryExpression =>
  def codebook: Seq[Double]
  def m: Int
  def ks: Int
  def subDim: Int
  require(codebook.length == m * ks * subDim, "codebook must be m*ks*subDim")

  @transient protected lazy val flat: Array[Double] = codebook.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<float|double>, got ${other.sql}")
  }
  protected def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
}

/** PQ codes of a vector: `array<int>` of length m, one codeword index
  * per subspace — the 32×-narrower scan-side representation. */
case class PqEncode(child: Expression, codebook: Seq[Double],
                    m: Int, ks: Int, subDim: Int)
    extends UnaryExpression with PqCodebook {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  override def nullSafeEval(input: Any): Any =
    PqCompute.encode(input.asInstanceOf[ArrayData], isFloat, flat, m, ks, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PqCompute.encode($c, $isFloat, $ref, $m, $ks, $subDim);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Per-query ADC lookup table: `array<double>` of m·ks exact subvector
  * distances, indexed `s*ks + j`. Computed once per query, broadcast
  * with it — candidate scoring then needs no float math at all. */
case class PqLut(child: Expression, codebook: Seq[Double],
                 m: Int, ks: Int, subDim: Int)
    extends UnaryExpression with PqCodebook {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  override def nullSafeEval(input: Any): Any =
    PqCompute.lut(input.asInstanceOf[ArrayData], isFloat, flat, m, ks, subDim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCodebook", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PqCompute.lut($c, $isFloat, $ref, $m, $ks, $subDim);")
  }
  override protected def withNewChildInternal(newChild: Expression): PqLut =
    copy(child = newChild)
}

/** Asymmetric-distance score: m lookups + adds per candidate. */
case class PqAdc(left: Expression, right: Expression, ks: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"pq_adc expects (array<double>, array<int>), got ${l.sql}, ${r.sql}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"

  override def nullSafeEval(lut: Any, code: Any): Any =
    PqCompute.adc(lut.asInstanceOf[ArrayData], code.asInstanceOf[ArrayData], ks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, c) =>
      s"${ev.value} = graft.plans.PqCompute.adc($l, $c, $ks);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdc =
    copy(left = l, right = r)
}
