package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native winnowing fingerprints over a token array, one pass:
  * polynomial hash of every k-token shingle (bytes of the tokens
  * joined by ' ' — identical to hashing the concat_ws shingle string),
  * then the minimum of every w-wide sliding hash window, deduplicated
  * and sorted. Semantically equal to the composed
  * `sort_array(array_distinct(transform(sequence, i ->
  * array_min(slice(hashes, i, w)))))` formulation (equivalence-tested),
  * but with no intermediate shingle strings, no per-window slice
  * copies, and no interpreted lambdas — the whole sketch stays inside
  * WholeStageCodegen via `doGenCode`.
  *
  * Fewer-than-k tokens hash the whole join as ONE shingle, matching
  * `WordShingles` (and the DuckDB oracle's CASE branch).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int, modulus: Long)
    extends UnaryExpression {
  require(k > 0 && w > 0 && modulus > 0 && modulus < Long.MaxValue / 32)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints expects array<string>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"

  override def nullSafeEval(input: Any): Any =
    WinnowFingerprints.compute(input.asInstanceOf[ArrayData], k, w, modulus)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WinnowFingerprints.compute($c, $k, $w, ${modulus}L);")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Fold one token's characters into the running hash: raw bytes for
    * ASCII (identical values, no allocation), per-codepoint otherwise —
    * the same convention as [[PolyHash]], matching the oracle's
    * per-character `ascii()` terms on any input. */
  private def foldToken(acc0: Long, tok: org.apache.spark.unsafe.types.UTF8String,
                        modulus: Long): Long = {
    val bytes = tok.getBytes
    var ascii = true
    var i = 0
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false else i += 1
    }
    var acc = acc0
    if (ascii) {
      i = 0
      while (i < bytes.length) { acc = (acc * 31 + bytes(i)) % modulus; i += 1 }
    } else {
      val str = tok.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * 31 + cp) % modulus
        j += Character.charCount(cp)
      }
    }
    acc
  }

  def compute(toks: ArrayData, k: Int, w: Int, modulus: Long): ArrayData = {
    val n = toks.numElements()
    // shingle hash = poly fold over tokens i..i+k-1 joined by ' '
    // (0x20); < k tokens -> one whole-array shingle
    val nSh = if (n < k) 1 else n - k + 1
    val span = if (n < k) math.max(n, 0) else k
    val hashes = new Array[Long](nSh)
    var i = 0
    while (i < nSh) {
      var acc = 0L
      var j = 0
      while (j < span) {
        if (j > 0) acc = (acc * 31 + 0x20L) % modulus
        if (!toks.isNullAt(i + j)) {
          acc = foldToken(acc, toks.getUTF8String(i + j), modulus)
        }
        j += 1
      }
      hashes(i) = acc
      i += 1
    }
    // sliding-window minima (w is small; the simple scan beats a deque)
    val nWin = math.max(nSh - w + 1, 1)
    val mins = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i < nWin) {
      var m = hashes(i)
      var j = 1
      while (j < w && i + j < nSh) {
        if (hashes(i + j) < m) m = hashes(i + j)
        j += 1
      }
      mins.add(m)
      i += 1
    }
    val out = new Array[Any](mins.size)
    val it = mins.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }
}
