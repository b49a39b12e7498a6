package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass Gopher document-quality signals (the d36 battery,
  * Rae et al. 2021 table A1): word count, summed word length,
  * symbol count ('#' chars + non-overlapping '...' matches),
  * alphabetic-word count and required-stopword count — computed in a
  * single traversal with no token-array materialization and no
  * interpreted higher-order lambdas.
  *
  * Semantically EQUAL to the composed formulation
  * `size(split(trim(lower(text)),"\\s+"))` / `aggregate(transform(...))`
  * / `regexp_replace` counts (equivalence-tested in NativePropertySpec):
  * tokenization calls the same `UTF8String.toLowerCase/trim/split`
  * Spark's own lower/trim/split expressions call, so the token stream
  * cannot drift from the oracle's `regexp_split_to_array(trim(lower()))`.
  * The round-6 data made the composed form the slowest text row
  * (~1.3 s deep-warm at sf0.1); the §6d rule — an interpreted lambda
  * fold in a hot projection costs 50-80× a native expression — applies.
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_stats expects string, got ${other.sql}")
  }

  override def dataType: DataType = GopherStats.Schema
  override def prettyName: String = "gopher_stats"

  override def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.GopherStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("sum_wlen", LongType, nullable = false),
    StructField("n_sym", LongType, nullable = false),
    StructField("n_alpha", LongType, nullable = false),
    StructField("n_req_stop", LongType, nullable = false)))

  /** The Gopher required-stopword list (d36). */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val StopU: Array[UTF8String] =
    RequiredStopwords.map(UTF8String.fromString).toArray

  private val SplitWs = UTF8String.fromString("\\s+")

  def compute(text: UTF8String): InternalRow = {
    // symbol counts over the RAW text, exactly as the composed
    // length-difference forms: '#' chars, and '...' matches consumed
    // left-to-right non-overlapping (regexp_replace semantics). Both
    // target ASCII bytes, which never occur inside multi-byte UTF-8
    // sequences, so the byte scan equals the char scan.
    val raw = text.getBytes
    var nHash = 0L
    var i = 0
    while (i < raw.length) {
      if (raw(i) == '#') nHash += 1
      i += 1
    }
    var nEll = 0L
    i = 0
    while (i < raw.length) {
      if (raw(i) == '.' && i + 2 < raw.length &&
          raw(i + 1) == '.' && raw(i + 2) == '.') {
        nEll += 1; i += 3
      } else i += 1
    }
    // token stream via Spark's OWN lower/trim/split kernels — the
    // same calls the composed split(trim(lower(text))) chain makes
    val toks = text.toLowerCase.trim().split(SplitWs, -1)
    var nWords = 0L
    var sumWlen = 0L
    var nAlpha = 0L
    val seen = new Array[Boolean](StopU.length)
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      nWords += 1
      sumWlen += tok.numChars()
      val b = tok.getBytes
      var hasAlpha = false
      var j = 0
      while (!hasAlpha && j < b.length) {
        if (b(j) >= 'a' && b(j) <= 'z') hasAlpha = true
        j += 1
      }
      if (hasAlpha) nAlpha += 1
      var s = 0
      while (s < StopU.length) {
        if (!seen(s) && tok.equals(StopU(s))) seen(s) = true
        s += 1
      }
      t += 1
    }
    var nStop = 0L
    var s = 0
    while (s < StopU.length) { if (seen(s)) nStop += 1; s += 1 }
    new GenericInternalRow(Array[Any](nWords, sumWlen, nHash + nEll, nAlpha, nStop))
  }
}
