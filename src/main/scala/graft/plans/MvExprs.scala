package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native one-pass replacements for the T24 split chains.
  *
  * Why these exist (SURVEY §6d's lesson, measured again in round 6):
  * Spark's `StringSplit` routes every non-empty pattern through
  * `String.split(regex, limit)`, and both `Pattern.quote("þ")`
  * (= `\Qþ\E`, 5 chars) and the multivalue marker alternation miss
  * Java's single-char fast path — so the composed formulations
  * Pattern.compile PER ROW (per exploded element on the FEFD path).
  * These expressions do the same work in one byte scan with no regex,
  * no String round-trip, and stay inside whole-stage codegen.
  *
  * Equivalence with the composed regex formulations is property-tested
  * in NativePropertySpec; the driver oracles pin the query-level
  * results.
  */
object MvOps {

  /** `split(s, Pattern.quote(sep), -1)` for a literal separator:
    * byte-scan for the separator's UTF-8 encoding, interior AND
    * trailing empties kept (limit -1 semantics). */
  def splitBytes(s: UTF8String, sep: Array[Byte]): GenericArrayData = {
    val bytes = s.getBytes
    val parts = new java.util.ArrayList[UTF8String](8)
    var start = 0
    var i = 0
    val n = bytes.length
    val sn = sep.length
    while (i <= n - sn) {
      var m = 0
      while (m < sn && bytes(i + m) == sep(m)) m += 1
      if (m == sn) {
        parts.add(UTF8String.fromBytes(bytes, start, i - start))
        i += sn
        start = i
      } else i += 1
    }
    parts.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(parts.toArray)
  }

  /** True when `s?[0-9]+:` matches at `i`; returns the end offset
    * (exclusive) via the Int result, or -1 when it does not match. */
  private def markerEnd(b: Array[Byte], i: Int): Int = {
    var p = i
    val n = b.length
    if (p < n && b(p) == 's') p += 1
    val d0 = p
    while (p < n && b(p) >= '0' && b(p) <= '9') p += 1
    if (p > d0 && p < n && b(p) == ':') p + 1 else -1
  }

  /** `filter(split(s, "(^s?[0-9]+:|#(s?[0-9]+:)?)", -1), _ != "")` —
    * the reference's multivalue element decode — in one scan. */
  def markerSplit(s: UTF8String): GenericArrayData = {
    val b = s.getBytes
    val n = b.length
    val parts = new java.util.ArrayList[UTF8String](8)
    var start = 0
    var i = 0
    // leading positional marker (the regex's ^-anchored alternative)
    val lead = markerEnd(b, 0)
    if (lead > 0) { i = lead; start = lead }
    while (i < n) {
      if (b(i) == '#') {
        if (i > start) parts.add(UTF8String.fromBytes(b, start, i - start))
        // greedy optional marker after the separator
        val e = markerEnd(b, i + 1)
        i = if (e > 0) e else i + 1
        start = i
      } else i += 1
    }
    if (n > start) parts.add(UTF8String.fromBytes(b, start, n - start))
    new GenericArrayData(parts.toArray)
  }

  private def hexVal(c: Byte): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else -1

  /** Latin-1 bytes → UTF-8 string (what `decode(x, "ISO-8859-1")`
    * produces): bytes < 0x80 copy through, the rest expand to the
    * 2-byte UTF-8 encoding of U+0080..U+00FF. */
  private def latin1(b: Array[Byte], from: Int, until: Int): UTF8String = {
    var extra = 0
    var i = from
    while (i < until) { if ((b(i) & 0x80) != 0) extra += 1; i += 1 }
    if (extra == 0) return UTF8String.fromBytes(b, from, until - from)
    val out = new Array[Byte](until - from + extra)
    var o = 0
    i = from
    while (i < until) {
      val v = b(i) & 0xff
      if (v < 0x80) { out(o) = v.toByte; o += 1 }
      else {
        out(o) = (0xc0 | (v >> 6)).toByte
        out(o + 1) = (0x80 | (v & 0x3f)).toByte
        o += 2
      }
      i += 1
    }
    UTF8String.fromBytes(out)
  }

  /** The whole FEFD decode chain
    * `split(split(decode(unhex(blob), "ISO-8859-1"), þ), ý)` in one
    * pass over the hex text: returns fields (0xFE-delimited) of
    * multivalue elements (0xFD-delimited) as array<array<string>>.
    * Null on malformed hex, exactly like `unhex`. */
  def feFdDecode(s: UTF8String): GenericArrayData = {
    val hexb = s.getBytes
    // `unhex` odd-length semantics: the FIRST digit is its own byte
    // ("ABC" -> 0x0A 0xBC); any non-hex digit nulls the whole value
    val odd = (hexb.length & 1) != 0
    val n = hexb.length / 2 + (if (odd) 1 else 0)
    val raw = new Array[Byte](n)
    var h = 0
    var i = 0
    if (odd) {
      val v = hexVal(hexb(0))
      if (v < 0) return null
      raw(0) = v.toByte
      h = 1; i = 1
    }
    while (i < n) {
      val hi = hexVal(hexb(h)); val lo = hexVal(hexb(h + 1))
      if (hi < 0 || lo < 0) return null
      raw(i) = ((hi << 4) | lo).toByte
      h += 2; i += 1
    }
    val fields = new java.util.ArrayList[GenericArrayData](8)
    var elems = new java.util.ArrayList[UTF8String](4)
    var start = 0
    i = 0
    while (i < n) {
      val v = raw(i) & 0xff
      if (v == 0xfe) {
        elems.add(latin1(raw, start, i))
        fields.add(new GenericArrayData(elems.toArray))
        elems = new java.util.ArrayList[UTF8String](4)
        start = i + 1
      } else if (v == 0xfd) {
        elems.add(latin1(raw, start, i))
        start = i + 1
      }
      i += 1
    }
    elems.add(latin1(raw, start, n))
    fields.add(new GenericArrayData(elems.toArray))
    new GenericArrayData(fields.toArray)
  }
}

/** `split(str, Pattern.quote(sep), -1)` without the per-row
  * Pattern.compile — see [[MvOps.splitBytes]]. */
case class SplitChar(child: Expression, sep: String) extends UnaryExpression {
  require(sep.nonEmpty, "separator must be non-empty")
  private lazy val sepBytes = sep.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"split_char expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "split_char"

  override def nullSafeEval(input: Any): Any =
    MvOps.splitBytes(input.asInstanceOf[UTF8String], sepBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sepBytes", sepBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MvOps.splitBytes($c, $sepRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): SplitChar =
    copy(child = newChild)
}

/** The reference's multivalue element decode (`controllers/index.js:93`)
  * as one scan — see [[MvOps.markerSplit]]. */
case class MvMarkerSplit(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mv_marker_split expects string, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mv_marker_split"

  override def nullSafeEval(input: Any): Any =
    MvOps.markerSplit(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.MvOps.markerSplit($c);")

  override protected def withNewChildInternal(newChild: Expression): MvMarkerSplit =
    copy(child = newChild)
}

/** The packed BLOB FE/FD record decode
  * (`controllers/index.js:591-600`) as one pass — see
  * [[MvOps.feFdDecode]]. */
case class MvDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"mv_decode expects string, got ${other.sql}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false), containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "mv_decode"

  override def nullSafeEval(input: Any): Any =
    MvOps.feFdDecode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.GenericArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.plans.MvOps.feFdDecode(${childGen.value});
          ${ev.isNull} = ${ev.value} == null;
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): MvDecode =
    copy(child = newChild)
}
