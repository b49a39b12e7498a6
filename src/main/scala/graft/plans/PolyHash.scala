package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial string hash: fold (acc·31 + codepoint) mod `modulus`
  * over the characters. Unlike xxhash64/murmur it is engine-portable —
  * the identical fold is expressible in plain SQL (`list_reduce` over
  * per-character `ascii()` codes, which return Unicode codepoints),
  * which is what lets the MinHash pipeline carry a full DuckDB oracle.
  * ASCII text folds over the raw UTF-8 bytes (identical values, no
  * String allocation); non-ASCII falls back to codepoint iteration so
  * the oracle convention holds beyond ASCII too. `modulus` must keep
  * acc·31+cp inside a Long.
  */
case class PolyHash(child: Expression, modulus: Long) extends UnaryExpression {
  require(modulus > 0 && modulus < Long.MaxValue / 32)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "poly_hash"

  override def nullSafeEval(input: Any): Any =
    PolyHash.compute(input.asInstanceOf[UTF8String], modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.PolyHash.compute($c, ${modulus}L);")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  def compute(s: UTF8String, modulus: Long): Long = {
    val bytes = s.getBytes
    var acc = 0L
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      else {
        acc = (acc * 31 + bytes(i)) % modulus
        i += 1
      }
    }
    if (!ascii) {
      // per-CODEPOINT fold (the oracle's per-character ascii() terms);
      // restart — mixing byte and codepoint terms would match neither
      acc = 0L
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % modulus
        j += Character.charCount(cp)
      }
    }
    acc
  }
}
