package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass text statistics behind `Text.tokenCount` /
  * `stopwordCount` / `punctCount` (the d1/d2/d12/d21/d37 components):
  * struct(n_tokens, n_stop, n_punct) from the raw text with no token
  * array materialization and no interpreted lambdas.
  *
  * Semantics replicate the composed forms EXACTLY (equivalence-tested):
  *  - n_tokens = size(split(trim(text), "\\s+")) over the RAW text —
  *    tokenization calls the same UTF8String trim/split kernels
  *    Spark's own trim/split expressions call;
  *  - n_stop   = size(filter(split(trim(lower(text)), "\\s+"),
  *    isin(Stopwords))) — occurrences, not distinct presence, over the
  *    LOWERED token stream (lowering cannot create whitespace, but it
  *    can change token content, so the lowered stream is walked
  *    separately);
  *  - n_punct  = length(text) − length(regexp_replace(text,
  *    "[^a-z0-9 ]", "")) — code points outside {a-z, 0-9, space} of
  *    the RAW text (uppercase counts as punct, the d2 oracle's rule).
  *
  * Several extractions of different fields in one projection are
  * semantically-equal case-class instances, so codegen subexpression
  * elimination evaluates the struct once per row.
  */
case class TextStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats expects string, got ${other.sql}")
  }

  override def dataType: DataType = TextStats.Schema
  override def prettyName: String = "text_stats"

  override def nullSafeEval(input: Any): Any =
    TextStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.TextStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

object TextStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_stop", LongType, nullable = false),
    StructField("n_punct", LongType, nullable = false)))

  /** Text.Stopwords, cached as UTF8Strings. */
  private val StopU: Array[UTF8String] =
    Array("the", "a", "and", "of", "to", "in").map(UTF8String.fromString)

  private val SplitWs = UTF8String.fromString("\\s+")

  def compute(text: UTF8String): InternalRow = {
    val nTokens = text.trim().split(SplitWs, -1).length.toLong
    val lowToks = text.toLowerCase.trim().split(SplitWs, -1)
    var nStop = 0L
    var t = 0
    while (t < lowToks.length) {
      var s = 0
      var matched = false
      while (!matched && s < StopU.length) {
        if (lowToks(t).equals(StopU(s))) matched = true
        s += 1
      }
      if (matched) nStop += 1
      t += 1
    }
    // punct = code points outside {a-z, 0-9, space} on the RAW text
    // (matches the per-code-point [^a-z0-9 ] regex class semantics)
    val s = text.toString
    var nPunct = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val keep = (cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9') || cp == ' '
      if (!keep) nPunct += 1
      i += Character.charCount(cp)
    }
    new GenericInternalRow(Array[Any](nTokens, nStop, nPunct))
  }
}
