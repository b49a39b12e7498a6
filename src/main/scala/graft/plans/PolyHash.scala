package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Polynomial string hash: fold (acc·31 + byte) mod `modulus` over the
  * UTF-8 bytes. Unlike xxhash64/murmur it is engine-portable — the
  * identical fold is expressible in plain SQL (`list_reduce` over
  * `ascii` codes), which is what lets the MinHash pipeline carry a full
  * DuckDB oracle. For ASCII text (this corpus) bytes == `ascii()`
  * codepoints. `modulus` must keep acc·31+255 inside a Long.
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
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % modulus
      i += 1
    }
    acc
  }
}
