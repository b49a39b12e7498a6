package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Binary PPM (P6) image codec — pure JVM, no external libraries. PPM
  * is a real, widely-supported image format (header `P6\n<w> <h>\n255\n`
  * + raw interleaved RGB bytes), which makes the multimodal decode path
  * REAL in this container: parse, dimensions, channel statistics and
  * box resize all operate on actual pixel data. For a compressed
  * format, see [[GifCodec]] (real LZW); JPEG/PNG (DCT/deflate) still
  * need an external codec — that seam stays in
  * [[Multimodal.extractFeatures]]'s documented stub.
  */
object PpmCodec {

  /** Per-axis dimension cap: keeps w·h·3 (and every (y·w+x)·3 pixel
    * index) inside exact Int/Long arithmetic for any accepted header. */
  val MaxDim = 32767

  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  /** Encode raw interleaved RGB as binary PPM. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    s"P6\n$width $height\n255\n".getBytes("US-ASCII") ++ rgb
  }

  /** Decode a binary PPM; None on malformed input (null-not-fail,
    * matching the engine's KSQL-style malformed-value semantics).
    * Handles arbitrary whitespace and `#` comments in the header. */
  def decode(payload: Array[Byte]): Option[Image] = {
    var pos = 0
    def skipWs(): Unit = {
      var go = true
      while (go && pos < payload.length) {
        val b = payload(pos)
        if (b == '#') { while (pos < payload.length && payload(pos) != '\n') pos += 1 }
        else if (b == ' ' || b == '\t' || b == '\r' || b == '\n') pos += 1
        else go = false
      }
    }
    def int(): Int = {
      skipWs()
      // accumulate in Long and cap: a corrupt 4294967297 would wrap an
      // Int to a bogus small dimension and decode the wrong pixels
      var v = 0L
      var any = false
      while (pos < payload.length && payload(pos) >= '0' && payload(pos) <= '9') {
        if (v <= MaxDim) v = v * 10 + (payload(pos) - '0')
        pos += 1; any = true
      }
      if (!any || v > MaxDim) -1 else v.toInt
    }
    if (payload == null || payload.length < 2 ||
      payload(0) != 'P' || payload(1) != '6') return None
    pos = 2
    val w = int(); val h = int(); val maxval = int()
    if (w <= 0 || h <= 0 || maxval != 255 || pos >= payload.length) return None
    pos += 1 // single whitespace after maxval
    // both dims are <= MaxDim here, so w*h*3 fits a Long exactly and
    // need.toInt is safe whenever the payload-length guard passes
    val need = w.toLong * h * 3
    if (need > payload.length - pos) return None
    Some(Image(w, h, java.util.Arrays.copyOfRange(payload, pos, pos + need.toInt)))
  }

  /** Box-average resize to (tw, th): each target pixel is the floor of
    * the mean of its source cell, per channel — a real downscale. */
  def resizeBox(img: Image, tw: Int, th: Int): Image = {
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val y0 = ty * img.height / th
      val y1 = math.max((ty + 1) * img.height / th, y0 + 1)
      var tx = 0
      while (tx < tw) {
        val x0 = tx * img.width / tw
        val x1 = math.max((tx + 1) * img.width / tw, x0 + 1)
        var c = 0
        while (c < 3) {
          var s = 0L
          var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              s += payloadAt(img, x, y, c); n += 1; x += 1
            }
            y += 1
          }
          out((ty * tw + tx) * 3 + c) = (s / n).toByte
          c += 1
        }
        tx += 1
      }
      ty += 1
    }
    Image(tw, th, out)
  }

  private def payloadAt(img: Image, x: Int, y: Int, c: Int): Int =
    img.rgb((y * img.width + x) * 3 + c) & 0xff
}

/** RIFF/WAVE PCM audio codec — pure JVM, no external libraries. WAV is
  * a real, ubiquitous container (RIFF header + `fmt ` and `data`
  * chunks, little-endian); 16-bit mono PCM decode makes the audio
  * modality path REAL here, like [[PpmCodec]] for images. Compressed
  * audio (MP3/AAC) would need an external codec — that seam stays in
  * [[Multimodal.extractFeatures]]'s documented stub.
  */
object WavCodec {

  /** Sample-count cap (~16 min at 8 kHz): keeps every byte offset and
    * the abs-sum (n · 32768 max) inside exact Int/Long arithmetic. */
  val MaxSamples = 1 << 23

  final case class Audio(sampleRate: Int, samples: Array[Short])

  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)

  /** Encode 16-bit mono PCM as a canonical WAV file. */
  def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    require(samples.length <= MaxSamples, "too many samples")
    val dataLen = samples.length * 2
    val pcm = new Array[Byte](dataLen)
    var i = 0
    while (i < samples.length) {
      pcm(i * 2) = (samples(i) & 0xff).toByte
      pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
      i += 1
    }
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate * 2) ++
      le16(2) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++ pcm
  }

  /** Encode 16-bit STEREO PCM as a canonical WAV file (2 channels,
    * interleaved L,R frames, blockAlign 4). */
  def encodeStereo(sampleRate: Int, left: Array[Short],
                   right: Array[Short]): Array[Byte] = {
    require(left.length == right.length, "channel length mismatch")
    require(left.length <= MaxSamples, "too many samples")
    val dataLen = left.length * 4
    val pcm = new Array[Byte](dataLen)
    var i = 0
    while (i < left.length) {
      pcm(i * 4) = (left(i) & 0xff).toByte
      pcm(i * 4 + 1) = ((left(i) >> 8) & 0xff).toByte
      pcm(i * 4 + 2) = (right(i) & 0xff).toByte
      pcm(i * 4 + 3) = ((right(i) >> 8) & 0xff).toByte
      i += 1
    }
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataLen) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1) ++ le16(2) ++ le32(sampleRate) ++ le32(sampleRate * 4) ++
      le16(4) ++ le16(16) ++
      "data".getBytes("US-ASCII") ++ le32(dataLen) ++ pcm
  }

  /** G.711 µ-law expansion of one companded byte to its 16-bit PCM
    * sample — the REAL compressed-audio path (8 bits on the wire per
    * 16-bit sample; format tag 7 in WAV). Closed-form per byte:
    * complement, then magnitude ((mant·8 + 0x84) << exp) − 0x84,
    * signed by the top bit — max ±32124, and byte 0xFF decodes to
    * exactly 0. */
  def ulawDecode8(u: Byte): Short = {
    val b = ~u & 0xff
    val exp = (b >> 4) & 7
    val mant = b & 0x0f
    val mag = (((mant << 3) + 0x84) << exp) - 0x84
    (if ((b & 0x80) != 0) -mag else mag).toShort
  }

  /** G.711 µ-law compression of a 16-bit sample (the encoder half, so
    * tests and synthesized corpora can produce real companded WAVs):
    * bias, clip at 32635, locate the segment, keep 4 mantissa bits,
    * complement. */
  def ulawEncode16(s: Short): Byte = {
    var x = s.toInt
    val sign = if (x < 0) { x = -x; 0x80 } else 0
    if (x > 32635) x = 32635
    x += 0x84
    var exp = 7
    var mask = 0x4000
    while (exp > 0 && (x & mask) == 0) { exp -= 1; mask >>= 1 }
    val mant = (x >> (exp + 3)) & 0x0f
    (~(sign | (exp << 4) | mant)).toByte
  }

  /** Encode µ-law bytes as a canonical WAV file (format tag 7, 8 bits
    * per sample, mono). */
  def encodeUlaw(sampleRate: Int, ulaw: Array[Byte]): Array[Byte] = {
    require(ulaw.length <= MaxSamples, "too many samples")
    "RIFF".getBytes("US-ASCII") ++ le32(36 + ulaw.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(7) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate) ++
      le16(1) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(ulaw.length) ++ ulaw
  }

  /** G.711 A-law expansion of one companded byte to its 16-bit PCM
    * sample (format tag 6 in WAV — the telephony codec Europe ships
    * where North America ships µ-law). Closed form per ITU-T G.711
    * table 1: XOR 0x55, then segment 0 decodes to mant·16 + 8 and
    * segment e ≥ 1 to (mant·16 + 0x108) << (e − 1); the top bit of the
    * XORed byte SET means positive (the A-law sign convention is the
    * inverse of µ-law's). Max ±32256, and no byte decodes to 0 (the
    * quantizer has no zero codeword — mid-rise, unlike µ-law's
    * mid-tread). */
  def alawDecode8(a: Byte): Short = {
    val x = (a ^ 0x55) & 0xff
    val e = (x >> 4) & 7
    val m = x & 0x0f
    val mag = if (e == 0) (m << 4) + 8 else ((m << 4) + 0x108) << (e - 1)
    (if ((x & 0x80) != 0) mag else -mag).toShort
  }

  /** G.711 A-law compression of a 16-bit sample (the encoder half):
    * drop to the 13-bit domain, segment search over the published
    * segment ends, 4 mantissa bits, XOR 0x55 toggle pattern. Every
    * codeword is a fixed point of decode→encode (property-checked). */
  private val AlawSegEnd = Array(0x1f, 0x3f, 0x7f, 0xff, 0x1ff, 0x3ff, 0x7ff, 0xfff)
  def alawEncode16(s: Short): Byte = {
    var x = s.toInt >> 3 // 16-bit PCM → the 13-bit A-law domain
    var mask = 0xd5 // sign bit set (positive) ^ 0x55
    if (x < 0) { mask = 0x55; x = -x - 1 }
    var seg = 0
    while (seg < 8 && x > AlawSegEnd(seg)) seg += 1
    if (seg >= 8) (0x7f ^ mask).toByte
    else {
      val mant = (if (seg < 2) x >> 1 else x >> seg) & 0x0f
      (((seg << 4) | mant) ^ mask).toByte
    }
  }

  /** Encode A-law bytes as a canonical WAV file (format tag 6, 8 bits
    * per sample, mono). */
  def encodeAlaw(sampleRate: Int, alaw: Array[Byte]): Array[Byte] = {
    require(alaw.length <= MaxSamples, "too many samples")
    "RIFF".getBytes("US-ASCII") ++ le32(36 + alaw.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(6) ++ le16(1) ++ le32(sampleRate) ++ le32(sampleRate) ++
      le16(1) ++ le16(8) ++
      "data".getBytes("US-ASCII") ++ le32(alaw.length) ++ alaw
  }

  /** IMA/DVI ADPCM step-size table (89 entries) from the IMA Digital
    * Audio Focus Group's 1992 recommended practice — the 4-bit
    * differential codec WAV carries as format tag 0x11. */
  val AdpcmStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)

  /** IMA ADPCM step-index adjustment per 3-bit magnitude. */
  val AdpcmIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA ADPCM state update shared verbatim by the encoder and the
    * decoder (the codec is a mirrored state machine — the encoder runs
    * the DECODER's reconstruction so both sides track identically).
    * Returns (newPred, newIndex) for a 4-bit code. */
  @inline private def adpcmReconstruct(code: Int, pred: Int, index: Int): (Int, Int) = {
    val step = AdpcmStepTable(index)
    var diff = step >> 3
    if ((code & 1) != 0) diff += step >> 2
    if ((code & 2) != 0) diff += step >> 1
    if ((code & 4) != 0) diff += step
    var p = pred + (if ((code & 8) != 0) -diff else diff)
    if (p > 32767) p = 32767 else if (p < -32768) p = -32768
    var ix = index + AdpcmIndexTable(code & 7)
    if (ix < 0) ix = 0 else if (ix > 88) ix = 88
    (p, ix)
  }

  /** Encode 16-bit mono PCM as an IMA ADPCM WAV (format tag 0x11) —
    * 4 bits on the wire per 16-bit sample. Block layout per the spec:
    * each `blockAlign`-byte block opens with a 4-byte header (initial
    * predictor as a verbatim int16, step index, reserved 0) followed
    * by packed nibbles LOW-FIRST; a block carries
    * `(blockAlign-4)*2 + 1` samples (the header predictor IS sample
    * one). The final block pads by holding the predictor (code 0
    * nibbles); the `fact` chunk records the true sample count so
    * decoders trim the pad. The step index carries ACROSS blocks (the
    * header re-seeds the predictor exactly but keeps the adapted
    * step), as real encoders do. */
  def encodeAdpcm(sampleRate: Int, samples: Array[Short],
                  blockAlign: Int = 256): Array[Byte] = {
    require(samples.nonEmpty && samples.length <= MaxSamples,
      "sample count out of range")
    require(blockAlign >= 8 && blockAlign % 4 == 0,
      s"blockAlign must be a multiple of 4, >= 8; got $blockAlign")
    val spb = (blockAlign - 4) * 2 + 1
    val nBlocks = (samples.length + spb - 1) / spb
    val data = new Array[Byte](nBlocks * blockAlign)
    var index = 0
    var o = 0
    var b = 0
    while (b < nBlocks) {
      val base = b * blockAlign
      var pred = samples(o).toInt
      data(base) = (pred & 0xff).toByte
      data(base + 1) = ((pred >> 8) & 0xff).toByte
      data(base + 2) = index.toByte
      data(base + 3) = 0
      o += 1
      var i = 0
      val nNib = (blockAlign - 4) * 2
      while (i < nNib) {
        val s = if (o < samples.length) { val v = samples(o).toInt; o += 1; v }
                else pred // pad nibbles hold the predictor (code 0)
        val step = AdpcmStepTable(index)
        var delta = s - pred
        var code = 0
        if (delta < 0) { code = 8; delta = -delta }
        if (delta >= step) { code |= 4; delta -= step }
        if (delta >= (step >> 1)) { code |= 2; delta -= step >> 1 }
        if (delta >= (step >> 2)) code |= 1
        val (p2, ix2) = adpcmReconstruct(code, pred, index)
        pred = p2; index = ix2
        val pos = base + 4 + (i >> 1)
        if ((i & 1) == 0) data(pos) = (code & 0xf).toByte
        else data(pos) = (data(pos) | (code << 4)).toByte
        i += 1
      }
      b += 1
    }
    val byteRate = (sampleRate.toLong * blockAlign / spb).toInt
    "RIFF".getBytes("US-ASCII") ++ le32(4 + 28 + 12 + 8 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(20) ++
      le16(0x11) ++ le16(1) ++ le32(sampleRate) ++ le32(byteRate) ++
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(spb) ++
      "fact".getBytes("US-ASCII") ++ le32(4) ++ le32(samples.length) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  /** Decode a WAV payload; None on anything malformed or unsupported
    * (null-not-fail, the engine's KSQL-style semantics). Walks the
    * chunk list properly — extra chunks (LIST/INFO/cue) are skipped,
    * `fmt ` must declare mono or stereo 16-bit PCM (tag 1 — stereo
    * downmixes to mono as (l + r) >> 1 per frame, the floor-mean
    * normalization every mono-input pipeline applies), 8-bit G.711
    * A-law (tag 6, expanded through [[alawDecode8]]), 8-bit G.711
    * µ-law (tag 7, expanded through [[ulawDecode8]]) or 4-bit IMA ADPCM
    * (tag 0x11, the mirrored state machine of [[encodeAdpcm]], with
    * the `fact` chunk trimming final-block padding) before `data` is
    * accepted. */
  def decode(payload: Array[Byte]): Option[Audio] = {
    if (payload == null || payload.length < 44) return None
    def ascii(off: Int, s: String): Boolean =
      s.indices.forall(i => payload(off + i) == s.charAt(i).toByte)
    def u16(off: Int): Int =
      (payload(off) & 0xff) | ((payload(off + 1) & 0xff) << 8)
    def u32(off: Int): Long =
      (payload(off) & 0xffL) | ((payload(off + 1) & 0xffL) << 8) |
        ((payload(off + 2) & 0xffL) << 16) | ((payload(off + 3) & 0xffL) << 24)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var pos = 12
    var rate = -1
    var fmtTag = -1
    var channels = 1
    var blockAlign = -1
    var samplesPerBlock = -1
    var factSamples = -1L
    while (pos + 8 <= payload.length) {
      val size = u32(pos + 4)
      if (size > payload.length - pos - 8) return None
      val body = pos + 8
      if (ascii(pos, "fmt ")) {
        if (size < 16) return None
        // mono or stereo PCM16 (tag 1; stereo downmixes), mono A-law
        // 8-bit (tag 6), mono µ-law 8-bit (tag 7) or mono IMA ADPCM
        // 4-bit (tag 0x11) — anything else is unsupported, not data
        val tag = u16(body)
        val ch = u16(body + 2)
        val bits = u16(body + 14)
        if (!((tag == 1 && bits == 16 && (ch == 1 || ch == 2)) ||
          (ch == 1 && ((tag == 6 && bits == 8) ||
            (tag == 7 && bits == 8) || (tag == 0x11 && bits == 4))))) return None
        channels = ch
        if (tag == 0x11) {
          // the ADPCM fmt extension (cbSize >= 2) must declare the
          // per-block sample count consistent with blockAlign
          if (size < 20 || u16(body + 16) < 2) return None
          blockAlign = u16(body + 12)
          samplesPerBlock = u16(body + 18)
          if (blockAlign < 8 ||
            samplesPerBlock != (blockAlign - 4) * 2 + 1) return None
        }
        val r = u32(body + 4)
        if (r <= 0 || r > Int.MaxValue) return None
        rate = r.toInt
        fmtTag = tag
      } else if (ascii(pos, "fact")) {
        if (size >= 4) factSamples = u32(body)
      } else if (ascii(pos, "data")) {
        if (fmtTag == 0x11) { // IMA ADPCM: block-structured nibbles
          if (size % blockAlign != 0) return None
          val nBlocks = (size / blockAlign).toInt
          val cap = nBlocks.toLong * samplesPerBlock
          if (cap > MaxSamples) return None
          val total = if (factSamples >= 0) factSamples else cap
          if (total > cap) return None
          val out = new Array[Short](total.toInt)
          var o = 0
          var b = 0
          while (b < nBlocks && o < total) {
            val base = body + b * blockAlign
            var pred = ((payload(base) & 0xff) |
              (payload(base + 1) << 8)).toShort.toInt
            var index = payload(base + 2) & 0xff
            if (index > 88) return None
            out(o) = pred.toShort
            o += 1
            var i = 0
            val nNib = (blockAlign - 4) * 2
            while (i < nNib && o < total) {
              val byt = payload(base + 4 + (i >> 1)) & 0xff
              val code = if ((i & 1) == 0) byt & 0xf else byt >> 4
              val (p2, ix2) = adpcmReconstruct(code, pred, index)
              pred = p2; index = ix2
              out(o) = pred.toShort
              o += 1
              i += 1
            }
            b += 1
          }
          if (o < total) return None // fact promised more than data holds
          return Some(Audio(rate, out))
        }
        if (fmtTag == 6 || fmtTag == 7) { // G.711: one byte per sample
          if (size > MaxSamples) return None
          val n = size.toInt
          val out = new Array[Short](n)
          var i = 0
          if (fmtTag == 6)
            while (i < n) { out(i) = alawDecode8(payload(body + i)); i += 1 }
          else
            while (i < n) { out(i) = ulawDecode8(payload(body + i)); i += 1 }
          return Some(Audio(rate, out))
        }
        if (fmtTag != 1) return None
        if (channels == 2) { // stereo PCM16: downmix (l + r) >> 1 per frame
          if (size % 4 != 0 || size / 4 > MaxSamples) return None
          val n = (size / 4).toInt
          val out = new Array[Short](n)
          var i = 0
          while (i < n) {
            val l = ((payload(body + i * 4) & 0xff) |
              (payload(body + i * 4 + 1) << 8)).toShort.toInt
            val r = ((payload(body + i * 4 + 2) & 0xff) |
              (payload(body + i * 4 + 3) << 8)).toShort.toInt
            out(i) = ((l + r) >> 1).toShort
            i += 1
          }
          return Some(Audio(rate, out))
        }
        if (size % 2 != 0 || size / 2 > MaxSamples) return None
        val n = (size / 2).toInt
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          out(i) = ((payload(body + i * 2) & 0xff) |
            (payload(body + i * 2 + 1) << 8)).toShort
          i += 1
        }
        return Some(Audio(rate, out))
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      pos = body + size.toInt + (size.toInt & 1)
    }
    None
  }
}

/** WARC-style crawl-container codec — pure JVM, written against the
  * ISO 28500 framing (the WARC/1.0 shape CommonCrawl ships): each
  * record is a version line, header lines, a blank line, EXACTLY
  * `Content-Length` body bytes, then the `\r\n\r\n` record separator.
  * The whole point of the format — and of this parser — is that the
  * body length comes from the HEADER, never from scanning for a
  * delimiter: crawl bodies routinely contain `\r\n\r\n` (and even
  * `WARC/1.0`), so any split-based reader mis-frames real data. */
object WarcCodec {

  /** Caps: bounded record count and per-body length so a crafted
    * header cannot balloon allocation past the payload it ships. */
  val MaxRecords = 4096
  val MaxBody = 1 << 24

  final case class Record(uri: String, contentLength: Int, body: String)

  /** Encode records as a WARC-style container (encoder half, so tests
    * and synthesized corpora can produce real framed payloads). */
  def encode(records: Seq[(String, String)]): Array[Byte] = {
    val sb = new StringBuilder
    records.foreach { case (uri, body) =>
      sb.append("WARC/1.0\r\n")
        .append("WARC-Target-URI: ").append(uri).append("\r\n")
        .append("Content-Length: ").append(body.length).append("\r\n")
        .append("\r\n")
        .append(body)
        .append("\r\n\r\n")
    }
    sb.toString.getBytes("ISO-8859-1")
  }

  /** Parse a container into its records; None on anything malformed
    * (truncated body, missing headers, bad version line, over-cap) —
    * null-not-fail, the engine's decode convention. Header names are
    * case-insensitive per the spec; unknown headers are skipped. */
  def parse(payload: Array[Byte]): Option[Seq[Record]] = {
    if (payload == null) return None
    val n = payload.length
    def lineEnd(from: Int): Int = { // index of '\r' of the next CRLF
      var i = from
      while (i + 1 < n && !(payload(i) == '\r' && payload(i + 1) == '\n')) i += 1
      if (i + 1 < n) i else -1
    }
    def str(from: Int, until: Int): String =
      new String(payload, from, until - from, "ISO-8859-1")
    val out = scala.collection.mutable.ArrayBuffer.empty[Record]
    var pos = 0
    while (pos < n) {
      if (out.length >= MaxRecords) return None
      val ve = lineEnd(pos)
      if (ve < 0 || str(pos, ve) != "WARC/1.0") return None
      pos = ve + 2
      var uri: String = null
      var len = -1
      var done = false
      while (!done) {
        val he = lineEnd(pos)
        if (he < 0) return None
        if (he == pos) { done = true; pos += 2 } // blank line: headers end
        else {
          val line = str(pos, he)
          val c = line.indexOf(':')
          if (c > 0) {
            val k = line.substring(0, c).trim.toLowerCase
            val v = line.substring(c + 1).trim
            if (k == "warc-target-uri") uri = v
            else if (k == "content-length")
              len = try v.toInt catch { case _: NumberFormatException => return None }
          }
          pos = he + 2
        }
      }
      if (uri == null || len < 0 || len > MaxBody) return None
      if (pos + len + 4 > n) return None // body + record separator
      val body = str(pos, pos + len)
      pos += len
      if (!(payload(pos) == '\r' && payload(pos + 1) == '\n' &&
        payload(pos + 2) == '\r' && payload(pos + 3) == '\n')) return None
      pos += 4
      out += Record(uri, len, body)
    }
    Some(out.toSeq)
  }
}

/** YUV4MPEG2 (Y4M) video codec — pure JVM, no external libraries. Y4M
  * is a real, widely-used uncompressed video container (the reference
  * format ffmpeg/x264 pipe to each other): an ASCII stream header
  * `YUV4MPEG2 W<w> H<h> F<n>:<d> [C<cs>] …\n` followed by frames, each
  * `FRAME[params]\n` + raw planar YUV. Supported colorspaces: `mono`
  * (Y only), `420*` (4:2:0), `422`, `444`; anything else is rejected,
  * not guessed. Compressed video (H.264/VP9) would need an external
  * codec — that seam stays in [[Multimodal.extractFeatures]]'s
  * documented stub.
  */
object Y4mCodec {

  /** Per-axis dimension cap (same rationale as [[PpmCodec.MaxDim]]). */
  val MaxDim = 32767
  /** Frame-count cap: bounds decode allocations on corrupt headers. */
  val MaxFrames = 1 << 20

  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
                         colorspace: String, frames: Array[Array[Byte]]) {
    /** The luma plane is the FIRST w·h bytes of every supported planar
      * layout, so per-frame luma stats read a prefix slice. */
    def luma(i: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(frames(i), 0, width * height)
  }

  /** Bytes per frame for a supported colorspace; -1 if unsupported.
    * Chroma planes use ceil(w/2)/ceil(h/2) so odd dims stay exact. */
  def frameSize(w: Int, h: Int, cs: String): Long = {
    val cw = (w + 1) / 2
    val ch = (h + 1) / 2
    if (cs == "mono") w.toLong * h
    // only the 8-bit 4:2:0 variants — C420p10/p12 are 2 bytes/sample
    // and misreading them as 8-bit would decode garbage planes
    else if (cs == "420" || cs == "420jpeg" || cs == "420mpeg2" ||
      cs == "420paldv") w.toLong * h + 2L * cw * ch
    else if (cs == "422") w.toLong * h + 2L * cw * h
    else if (cs == "444") 3L * w * h
    else -1L
  }

  /** Encode frames (each already `frameSize` bytes of planar data). */
  def encode(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
             colorspace: String, frames: Array[Array[Byte]]): Array[Byte] = {
    val fs = frameSize(width, height, colorspace)
    require(fs > 0, s"unsupported colorspace $colorspace")
    require(frames.forall(_.length == fs), s"every frame must be $fs bytes")
    val out = new java.io.ByteArrayOutputStream()
    out.write(s"YUV4MPEG2 W$width H$height F$fpsNum:$fpsDen C$colorspace\n"
      .getBytes("US-ASCII"))
    frames.foreach { f => out.write("FRAME\n".getBytes("US-ASCII")); out.write(f) }
    out.toByteArray
  }

  /** Decode a Y4M payload; None on malformed/unsupported input
    * (null-not-fail, the engine's KSQL-style semantics). Unknown
    * header parameters (I/A/X…) are skipped per spec; a truncated
    * final frame rejects the whole payload rather than inventing one. */
  def decode(payload: Array[Byte]): Option[Video] = {
    if (payload == null || payload.length < 10) return None
    val magic = "YUV4MPEG2"
    if (!magic.indices.forall(i => payload(i) == magic.charAt(i).toByte)) return None
    var pos = magic.length
    var w = -1; var h = -1; var fn = 25; var fd = 1; var cs = "420"
    // header params up to the first '\n'
    while (pos < payload.length && payload(pos) != '\n') {
      if (payload(pos) == ' ') pos += 1
      else {
        val tag = payload(pos).toChar
        val start = pos + 1
        while (pos < payload.length && payload(pos) != ' ' && payload(pos) != '\n') pos += 1
        val v = new String(payload, start, pos - start, "US-ASCII")
        tag match {
          case 'W' => w = v.toIntOption.getOrElse(-1)
          case 'H' => h = v.toIntOption.getOrElse(-1)
          case 'F' => v.split(':') match {
            case Array(a, b) =>
              fn = a.toIntOption.getOrElse(-1); fd = b.toIntOption.getOrElse(-1)
            case _ => fn = -1
          }
          case 'C' => cs = v
          case _ => () // I (interlacing), A (aspect), X (extensions): skipped
        }
      }
    }
    if (pos >= payload.length) return None
    pos += 1 // the header '\n'
    if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim || fn <= 0 || fd <= 0) return None
    val fs = frameSize(w, h, cs)
    if (fs <= 0) return None
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    while (pos < payload.length) {
      // FRAME marker with optional params up to '\n'
      val fm = "FRAME"
      if (pos + fm.length > payload.length ||
        !fm.indices.forall(i => payload(pos + i) == fm.charAt(i).toByte)) return None
      pos += fm.length
      while (pos < payload.length && payload(pos) != '\n') pos += 1
      if (pos >= payload.length) return None
      pos += 1
      if (fs > payload.length - pos || frames.length >= MaxFrames) return None
      frames += java.util.Arrays.copyOfRange(payload, pos, pos + fs.toInt)
      pos += fs.toInt
    }
    Some(Video(w, h, fn, fd, cs, frames.toArray))
  }
}

/** GIF87a image codec — pure JVM, no external libraries, written from
  * scratch against the published GIF87a specification (CompuServe,
  * 1987). GIF is a REAL compressed format — variable-width LZW over
  * palette indices with code-table growth, clear codes and sub-block
  * framing — so this is the engine's first compressed-codec path, not
  * a container walk. The decoder emits [[PpmCodec.Image]] (palette
  * applied), so everything downstream of the PPM path — channel
  * stats, box resize, dHash near-dup — composes unchanged. JPEG/PNG
  * (DCT/deflate) remain the documented stub seam.
  *
  * LZW width discipline (the part implementations get wrong): the
  * decoder sits one table entry BEHIND the encoder (it adds an entry
  * per code only from the second code on), so the encoder checks
  * `nextCode == 1<<width` BEFORE adding where the decoder checks it
  * AFTER — both switch width for the same emitted code. The table-full
  * clear at 4096 resets both sides; slot 4095 is never referenced.
  */
object GifCodec {

  /** Fields are u16 in the format; capped lower to bound allocations
    * on corrupt headers (same rationale as [[PpmCodec.MaxDim]]). */
  val MaxDim = 4095

  private val ClearCode = 256
  private val EoiCode = 257

  /** Encode one full-frame image: `indices` are w·h palette indices,
    * `palette` exactly 256 packed 0xRRGGBB ints (a 256-entry global
    * color table). */
  def encode(width: Int, height: Int, indices: Array[Byte],
             palette: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"dims out of range: ${width}x$height")
    require(indices.length == width * height, "indices must be w*h bytes")
    require(palette.length == 256, "palette must have 256 entries")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF87a".getBytes("US-ASCII"))
    u16(width); u16(height)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background color index
    out.write(0)    // pixel aspect ratio: unspecified
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    out.write(0x2c) // image descriptor
    u16(0); u16(0); u16(width); u16(height)
    out.write(0)    // no local color table, not interlaced
    out.write(8)    // LZW minimum code size
    val lzw = lzwEncode(indices)
    var i = 0
    while (i < lzw.length) { // 255-byte sub-block framing
      val n = math.min(255, lzw.length - i)
      out.write(n)
      out.write(lzw, i, n)
      i += n
    }
    out.write(0)    // block terminator
    out.write(0x3b) // trailer
    out.toByteArray
  }

  private def lzwEncode(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var acc = 0; var accBits = 0; var width = 9
    def emit(code: Int): Unit = {
      acc |= code << accBits
      accBits += width
      while (accBits >= 8) { out.write(acc & 0xff); acc >>>= 8; accBits -= 8 }
    }
    val dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = EoiCode + 1
    emit(ClearCode)
    if (data.isEmpty) { emit(EoiCode); if (accBits > 0) out.write(acc & 0xff); return out.toByteArray }
    var prev = data(0) & 0xff
    var i = 1
    while (i < data.length) {
      val k = data(i) & 0xff
      val key = Integer.valueOf((prev << 8) | k)
      val hit = dict.get(key)
      if (hit != null) prev = hit.intValue()
      else {
        emit(prev)
        // width check BEFORE adding — see the class doc's discipline
        if (nextCode == (1 << width) && width < 12) width += 1
        dict.put(key, Integer.valueOf(nextCode))
        nextCode += 1
        if (nextCode == 4096) { // table full: clear and restart
          emit(ClearCode); dict.clear(); nextCode = EoiCode + 1; width = 9
        }
        prev = k
      }
      i += 1
    }
    emit(prev)
    emit(EoiCode)
    if (accBits > 0) out.write(acc & 0xff)
    out.toByteArray
  }

  /** Decode a GIF payload to an RGB [[PpmCodec.Image]]; None on
    * malformed, truncated or paletteless input (null-not-fail, the
    * codec-family rule). GIF89a extensions (graphic control, comments,
    * application blocks) are skipped per spec, interlaced images are
    * de-interlaced (the spec's 4-pass row order — what ImageIO's
    * writer emits, interop-tested); only the FIRST image of an
    * animation decodes. */
  /** Encode an ANIMATED GIF89a: frames composite onto a logical
    * screen at (left, top) with a Graphic Control Extension per frame
    * carrying the disposal method and optional transparent index
    * (-1 = none). One global palette; frames reuse [[lzwEncode]]. */
  def encodeAnimated(screenW: Int, screenH: Int, palette: Array[Int],
                     frames: Seq[AnimFrame]): Array[Byte] = {
    require(palette.length == 256, "animated encoder uses a 256-entry global table")
    require(frames.nonEmpty, "at least one frame")
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    u16(screenW); u16(screenH)
    out.write(0x80 | 7) // global table, 256 entries
    out.write(0); out.write(0)
    palette.foreach { c =>
      out.write((c >> 16) & 0xff); out.write((c >> 8) & 0xff); out.write(c & 0xff)
    }
    frames.foreach { f =>
      require(f.left >= 0 && f.top >= 0 && f.left + f.w <= screenW &&
        f.top + f.h <= screenH, "frame rect outside the screen")
      require(f.indices.length == f.w * f.h, "indices must be w*h")
      out.write(0x21); out.write(0xf9); out.write(4) // GCE
      out.write(((f.disposal & 7) << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      u16(0) // delay
      out.write(if (f.transparentIdx >= 0) f.transparentIdx else 0)
      out.write(0) // GCE terminator
      out.write(0x2c)
      u16(f.left); u16(f.top); u16(f.w); u16(f.h)
      out.write(0) // no local table, not interlaced
      out.write(8) // min code size
      val lzw = lzwEncode(f.indices)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n); out.write(lzw, off, n)
        off += n
      }
      out.write(0)
    }
    out.write(0x3b)
    out.toByteArray
  }

  /** One animated-GIF frame for [[encodeAnimated]]. */
  final case class AnimFrame(left: Int, top: Int, w: Int, h: Int,
                             indices: Array[Byte], disposal: Int = 0,
                             transparentIdx: Int = -1)

  /** Decode ALL frames of a (possibly animated) GIF, COMPOSED onto
    * the logical screen per GIF89a: (left, top) placement, GCE
    * transparency (matching indices leave the canvas untouched), and
    * the three disposal methods — none/keep (0/1), restore-background
    * (2, the frame rect clears to black — the deterministic stand-in
    * for the spec's appliance-defined background), restore-previous
    * (3). Every returned frame is a screen-sized snapshot AFTER its
    * draw, which is what frame-dedup / scene-change consumers want.
    * None on anything malformed (the codec-family rule). */
  /** Total decoded-output budget for [[decodeFrames]]: every returned
    * frame is a full sw·sh·3 screen snapshot, so without a cap on the
    * frames × screen-area PRODUCT a few-KB crafted GIF (huge logical
    * screen, many 1×1 frames) could allocate tens of GB before the
    * per-count maxFrames check fired. 256 MB bounds the decoder the
    * way MaxSamples bounds the audio family. */
  val MaxAnimBytes: Long = 1L << 28

  def decodeFrames(payload: Array[Byte],
                   maxFrames: Int = 1024): Option[Seq[PpmCodec.Image]] = {
    if (payload == null || payload.length < 13) return None
    val magic = new String(payload, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    var pos = 6
    def u16(): Int = {
      val v = (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8)
      pos += 2; v
    }
    val sw = u16(); val sh = u16()
    if (sw <= 0 || sh <= 0 || sw > MaxDim || sh > MaxDim) return None
    // a screen too large for even ONE budgeted snapshot can never
    // yield output — reject before allocating the int canvas
    if (sw.toLong * sh * 3 > MaxAnimBytes) return None
    val packed = payload(pos) & 0xff
    pos += 3
    var global: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > payload.length) return None
      global = Array.tabulate(n) { i =>
        ((payload(pos + 3 * i) & 0xff) << 16) |
          ((payload(pos + 3 * i + 1) & 0xff) << 8) |
          (payload(pos + 3 * i + 2) & 0xff)
      }
      pos += 3 * n
    }
    val canvas = new Array[Int](sw * sh) // black until drawn
    val frames = scala.collection.mutable.ArrayBuffer.empty[PpmCodec.Image]
    var transparentIdx = -1
    var disposal = 0
    while (pos < payload.length) {
      val block = payload(pos) & 0xff
      pos += 1
      if (block == 0x3b) {
        return if (frames.nonEmpty) Some(frames.toSeq) else None
      } else if (block == 0x21) {
        if (pos >= payload.length) return None
        val label = payload(pos) & 0xff
        pos += 1
        if (label == 0xf9) { // Graphic Control Extension
          if (pos + 6 > payload.length || (payload(pos) & 0xff) != 4) return None
          val p = payload(pos + 1) & 0xff
          disposal = (p >> 2) & 7
          transparentIdx = if ((p & 1) != 0) payload(pos + 4) & 0xff else -1
          pos += 5
          if ((payload(pos) & 0xff) != 0) return None
          pos += 1
        } else {
          var n = -1
          while (n != 0) {
            if (pos >= payload.length) return None
            n = payload(pos) & 0xff
            pos += 1 + n
          }
        }
      } else if (block == 0x2c) {
        if (pos + 9 > payload.length) return None
        val left = u16(); val top = u16()
        val w = u16(); val h = u16()
        val ip = payload(pos) & 0xff
        pos += 1
        if (w <= 0 || h <= 0 || left + w > sw || top + h > sh) return None
        // total-output budget BEFORE any decode/compose work for this
        // frame: frames.length snapshots exist, this would be one more
        if ((frames.length + 1).toLong * (sw.toLong * sh * 3) > MaxAnimBytes)
          return None
        var pal = global
        if ((ip & 0x80) != 0) {
          val n = 2 << (ip & 7)
          if (pos + 3 * n > payload.length) return None
          pal = Array.tabulate(n) { i =>
            ((payload(pos + 3 * i) & 0xff) << 16) |
              ((payload(pos + 3 * i + 1) & 0xff) << 8) |
              (payload(pos + 3 * i + 2) & 0xff)
          }
          pos += 3 * n
        }
        if (pal == null || pos >= payload.length) return None
        val minCode = payload(pos) & 0xff
        pos += 1
        if (minCode < 2 || minCode > 8) return None
        val data = new java.io.ByteArrayOutputStream()
        var n = -1
        while (n != 0) {
          if (pos >= payload.length) return None
          n = payload(pos) & 0xff
          pos += 1
          if (n > 0) {
            if (pos + n > payload.length) return None
            data.write(payload, pos, n)
            pos += n
          }
        }
        val raw = lzwDecode(data.toByteArray, minCode, w * h) match {
          case Some(r) => r
          case None    => return None
        }
        val idx =
          if ((ip & 0x40) == 0) raw
          else { // de-interlace (same 4-pass permutation as decode)
            val o = new Array[Byte](raw.length)
            val starts = Array(0, 4, 2, 1)
            val steps = Array(8, 8, 4, 2)
            var src = 0
            var p = 0
            while (p < 4) {
              var row = starts(p)
              while (row < h) {
                System.arraycopy(raw, src * w, o, row * w, w)
                src += 1
                row += steps(p)
              }
              p += 1
            }
            o
          }
        val prev = if (disposal == 3) canvas.clone() else null
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val ci = idx(y * w + x) & 0xff
            if (ci != transparentIdx) {
              if (ci >= pal.length) return None
              canvas((top + y) * sw + (left + x)) = pal(ci)
            }
            x += 1
          }
          y += 1
        }
        val rgb = new Array[Byte](sw * sh * 3)
        var i = 0
        while (i < sw * sh) {
          val c = canvas(i)
          rgb(i * 3) = ((c >> 16) & 0xff).toByte
          rgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
          rgb(i * 3 + 2) = (c & 0xff).toByte
          i += 1
        }
        frames += PpmCodec.Image(sw, sh, rgb)
        if (frames.length > maxFrames) return None
        if (disposal == 2) { // clear the frame RECT to background
          var yy = 0
          while (yy < h) {
            var xx = 0
            while (xx < w) {
              canvas((top + yy) * sw + (left + xx)) = 0
              xx += 1
            }
            yy += 1
          }
        } else if (disposal == 3) {
          System.arraycopy(prev, 0, canvas, 0, canvas.length)
        }
        transparentIdx = -1
        disposal = 0
      } else return None
    }
    None // ran off the end without a trailer
  }

  def decode(payload: Array[Byte]): Option[PpmCodec.Image] = {
    if (payload == null || payload.length < 13) return None
    val magic = new String(payload, 0, 6, "US-ASCII")
    if (magic != "GIF87a" && magic != "GIF89a") return None
    var pos = 6
    def u16(): Int = {
      val v = (payload(pos) & 0xff) | ((payload(pos + 1) & 0xff) << 8)
      pos += 2; v
    }
    u16(); u16() // logical screen dims (per-image dims are what matter)
    val packed = payload(pos) & 0xff
    pos += 3 // packed + background index + aspect
    var palette: Array[Int] = null
    if ((packed & 0x80) != 0) {
      val n = 2 << (packed & 7)
      if (pos + 3 * n > payload.length) return None
      palette = Array.tabulate(n) { i =>
        ((payload(pos + 3 * i) & 0xff) << 16) |
          ((payload(pos + 3 * i + 1) & 0xff) << 8) |
          (payload(pos + 3 * i + 2) & 0xff)
      }
      pos += 3 * n
    }
    while (pos < payload.length) {
      val block = payload(pos) & 0xff
      pos += 1
      if (block == 0x3b) return None // trailer before any image
      else if (block == 0x21) {      // extension: label + sub-blocks
        pos += 1
        var n = -1
        while (n != 0) {
          if (pos >= payload.length) return None
          n = payload(pos) & 0xff
          pos += 1 + n
        }
      } else if (block == 0x2c) {    // image descriptor
        if (pos + 9 > payload.length) return None
        u16(); u16() // left, top
        val w = u16(); val h = u16()
        val ip = payload(pos) & 0xff
        pos += 1
        val interlaced = (ip & 0x40) != 0
        if ((ip & 0x80) != 0) {           // local color table wins
          val n = 2 << (ip & 7)
          if (pos + 3 * n > payload.length) return None
          palette = Array.tabulate(n) { i =>
            ((payload(pos + 3 * i) & 0xff) << 16) |
              ((payload(pos + 3 * i + 1) & 0xff) << 8) |
              (payload(pos + 3 * i + 2) & 0xff)
          }
          pos += 3 * n
        }
        if (palette == null || w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
          pos >= payload.length) return None
        val minCode = payload(pos) & 0xff
        pos += 1
        if (minCode < 2 || minCode > 8) return None
        val data = new java.io.ByteArrayOutputStream()
        var n = -1
        while (n != 0) { // un-frame the sub-blocks
          if (pos >= payload.length) return None
          n = payload(pos) & 0xff
          pos += 1
          if (n > 0) {
            if (pos + n > payload.length) return None
            data.write(payload, pos, n)
            pos += n
          }
        }
        return lzwDecode(data.toByteArray, minCode, w * h).flatMap { raw =>
          // interlaced images store rows in the spec's 4-pass order
          // (starts 0,4,2,1 / steps 8,8,4,2) — permute back to display
          // order before resolving the palette
          val idx =
            if (!interlaced) raw
            else {
              val out = new Array[Byte](raw.length)
              val starts = Array(0, 4, 2, 1)
              val steps = Array(8, 8, 4, 2)
              var src = 0
              var p = 0
              while (p < 4) {
                var row = starts(p)
                while (row < h) {
                  System.arraycopy(raw, src * w, out, row * w, w)
                  src += 1
                  row += steps(p)
                }
                p += 1
              }
              out
            }
          val rgb = new Array[Byte](w * h * 3)
          var ok = true
          var i = 0
          while (ok && i < idx.length) {
            val ci = idx(i) & 0xff
            if (ci >= palette.length) ok = false // index past the table
            else {
              val c = palette(ci)
              rgb(i * 3) = ((c >> 16) & 0xff).toByte
              rgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
              rgb(i * 3 + 2) = (c & 0xff).toByte
            }
            i += 1
          }
          if (ok) Some(PpmCodec.Image(w, h, rgb)) else None
        }
      } else return None
    }
    None
  }

  private def lzwDecode(data: Array[Byte], minCode: Int,
                        expected: Int): Option[Array[Byte]] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    var next = eoi + 1
    val table = new Array[Array[Byte]](4096)
    var i = 0
    while (i < clear) { table(i) = Array(i.toByte); i += 1 }
    val out = new java.io.ByteArrayOutputStream(expected)
    var bitPos = 0
    val totalBits = data.length * 8
    def read(): Int = {
      if (bitPos + width > totalBits) return -1
      var v = 0
      var b = 0
      while (b < width) {
        val bp = bitPos + b
        if (((data(bp >> 3) >> (bp & 7)) & 1) != 0) v |= 1 << b
        b += 1
      }
      bitPos += width
      v
    }
    var prev: Array[Byte] = null
    var done = false
    while (!done && out.size < expected) {
      val code = read()
      if (code < 0) return None
      if (code == clear) {
        java.util.Arrays.fill(table.asInstanceOf[Array[AnyRef]], clear, 4096, null)
        next = eoi + 1; width = minCode + 1; prev = null
      } else if (code == eoi) done = true
      else {
        val entry: Array[Byte] =
          if (code < next && table(code) != null) table(code)
          else if (code == next && prev != null) prev :+ prev(0) // KwKwK
          else return None
        out.write(entry, 0, entry.length)
        if (prev != null && next < 4096) {
          table(next) = prev :+ entry(0)
          next += 1
          // width check AFTER adding — see the class doc's discipline
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = entry
      }
    }
    if (out.size != expected) None else Some(out.toByteArray)
  }
}

/** PNG image codec — pure JVM. The DEFLATE stream rides the JVM's
  * built-in zlib (`java.util.zip.Inflater`/`Deflater` — part of the
  * platform, not an external library); everything PNG-specific is
  * written from scratch against the published PNG specification
  * (RFC 2083): chunk framing with CRC-32 verification, IHDR/PLTE/IDAT
  * walk, scanline de-filtering (None/Sub/Up/Average/Paeth), and 8-bit
  * gray / palette / RGB / RGBA color types. The decoder emits
  * [[PpmCodec.Image]] (RGB; alpha dropped, gray replicated, palette
  * resolved) so stats/resize/dHash compose unchanged. The encoder
  * CYCLES the five filter types across rows, so a roundtrip exercises
  * every de-filter path. JPEG (DCT) remains the documented stub seam.
  */
object PngCodec {

  /** Same rationale as [[PpmCodec.MaxDim]]. */
  val MaxDim = 32767

  private val Signature =
    Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  private def crc32(type4: Array[Byte], data: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(type4)
    c.update(data)
    c.getValue.toInt
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Encode raw interleaved RGB as an 8-bit truecolor PNG. Rows are
    * filtered with type (row % 5) — None/Sub/Up/Average/Paeth in
    * rotation — which costs nothing and makes every decoder filter
    * path exercised by any ≥5-row roundtrip. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= MaxDim && height <= MaxDim,
      s"dims out of range: ${width}x$height")
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val stride = width * 3
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * (stride + 1)) = f.toByte
      var x = 0
      while (x < stride) {
        val cur = rgb(y * stride + x) & 0xff
        val left = if (x >= 3) rgb(y * stride + x - 3) & 0xff else 0
        val up = if (y > 0) rgb((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= 3 && y > 0) rgb((y - 1) * stride + x - 3) & 0xff else 0
        val enc = f match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case _ => cur - paeth(left, up, ul)
        }
        raw(y * (stride + 1) + 1 + x) = (enc & 0xff).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw)
    deflater.finish()
    val zout = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) zout.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Signature, 0, Signature.length)
    def be32(v: Int): Array[Byte] = Array((v >>> 24).toByte, (v >>> 16).toByte,
      (v >>> 8).toByte, v.toByte)
    def chunk(name: String, data: Array[Byte]): Unit = {
      val t = name.getBytes("US-ASCII")
      out.write(be32(data.length), 0, 4)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      out.write(be32(crc32(t, data)), 0, 4)
    }
    chunk("IHDR", be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0)) // 8-bit, truecolor, deflate, adaptive, no interlace
    chunk("IDAT", zout.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Decode a PNG payload to RGB; None on malformed input, CRC
    * mismatch, or an unsupported shape (only 8-bit depth, color types
    * gray/palette/RGB/RGBA, no interlacing — unsupported is rejected,
    * never misdecoded). Alpha is dropped, gray replicated, palette
    * resolved through PLTE. */
  def decode(payload: Array[Byte]): Option[PpmCodec.Image] = {
    if (payload == null || payload.length < 8 + 12 ||
      !Signature.indices.forall(i => payload(i) == Signature(i))) return None
    var pos = 8
    def u32(): Long = {
      val v = ((payload(pos) & 0xffL) << 24) | ((payload(pos + 1) & 0xffL) << 16) |
        ((payload(pos + 2) & 0xffL) << 8) | (payload(pos + 3) & 0xffL)
      pos += 4; v
    }
    var w = -1; var h = -1; var colorType = -1
    var palette: Array[Int] = null
    val idat = new java.io.ByteArrayOutputStream()
    var ended = false
    while (!ended) {
      if (pos + 12 > payload.length) return None
      val len = u32()
      if (len > payload.length - pos - 8) return None
      val n = len.toInt
      val name = new String(payload, pos, 4, "US-ASCII")
      val typ = java.util.Arrays.copyOfRange(payload, pos, pos + 4)
      pos += 4
      val data = java.util.Arrays.copyOfRange(payload, pos, pos + n)
      pos += n
      val crc = u32()
      if (crc.toInt != crc32(typ, data)) return None
      name match {
        case "IHDR" =>
          if (n != 13) return None
          w = ((data(0) & 0xff) << 24) | ((data(1) & 0xff) << 16) |
            ((data(2) & 0xff) << 8) | (data(3) & 0xff)
          h = ((data(4) & 0xff) << 24) | ((data(5) & 0xff) << 16) |
            ((data(6) & 0xff) << 8) | (data(7) & 0xff)
          colorType = data(9) & 0xff
          // 8-bit only; deflate(0)/adaptive(0)/no-interlace(0)
          if ((data(8) & 0xff) != 8 || data(10) != 0 || data(11) != 0 ||
            data(12) != 0) return None
          if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim) return None
          if (colorType != 0 && colorType != 2 && colorType != 3 &&
            colorType != 6) return None
        case "PLTE" =>
          if (n % 3 != 0 || n > 768) return None
          palette = Array.tabulate(n / 3)(i =>
            ((data(3 * i) & 0xff) << 16) | ((data(3 * i + 1) & 0xff) << 8) |
              (data(3 * i + 2) & 0xff))
        case "IDAT" => idat.write(data, 0, n)
        case "IEND" => ended = true
        case _ => () // ancillary chunks (tEXt, gAMA, …) skipped per spec
      }
    }
    if (w <= 0 || colorType < 0) return None
    val bpp = colorType match {
      case 0 => 1 case 2 => 3 case 3 => 1 case _ => 4
    }
    if (colorType == 3 && palette == null) return None
    val stride = w * bpp
    val expected = (stride + 1) * h
    val raw = new Array[Byte](expected)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    val got = try {
      var off = 0
      var read = -1
      while (off < expected && read != 0) {
        read = inf.inflate(raw, off, expected - off)
        off += read
      }
      off
    } catch { case _: java.util.zip.DataFormatException => -1 }
    finally inf.end()
    if (got != expected) return None
    // de-filter in place into the unfiltered pixel buffer
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val f = raw(y * (stride + 1)) & 0xff
      if (f > 4) return None
      var x = 0
      while (x < stride) {
        val v = raw(y * (stride + 1) + 1 + x) & 0xff
        val left = if (x >= bpp) px(y * stride + x - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + x) & 0xff else 0
        val ul = if (x >= bpp && y > 0) px((y - 1) * stride + x - bpp) & 0xff else 0
        val dec = f match {
          case 0 => v
          case 1 => v + left
          case 2 => v + up
          case 3 => v + (left + up) / 2
          case _ => v + paeth(left, up, ul)
        }
        px(y * stride + x) = (dec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    // normalize to RGB
    val rgb = new Array[Byte](w * h * 3)
    var i = 0
    var ok = true
    while (ok && i < w * h) {
      colorType match {
        case 0 =>
          val g = px(i); rgb(i * 3) = g; rgb(i * 3 + 1) = g; rgb(i * 3 + 2) = g
        case 2 =>
          rgb(i * 3) = px(i * 3); rgb(i * 3 + 1) = px(i * 3 + 1)
          rgb(i * 3 + 2) = px(i * 3 + 2)
        case 3 =>
          val ci = px(i) & 0xff
          if (ci >= palette.length) ok = false
          else {
            val c = palette(ci)
            rgb(i * 3) = ((c >> 16) & 0xff).toByte
            rgb(i * 3 + 1) = ((c >> 8) & 0xff).toByte
            rgb(i * 3 + 2) = (c & 0xff).toByte
          }
        case _ =>
          rgb(i * 3) = px(i * 4); rgb(i * 3 + 1) = px(i * 4 + 1)
          rgb(i * 3 + 2) = px(i * 4 + 2)
      }
      i += 1
    }
    if (ok) Some(PpmCodec.Image(w, h, rgb)) else None
  }
}

/** Windows BMP codec — pure JVM, written against the published
  * BITMAPFILEHEADER + BITMAPINFOHEADER (V3) layout, the uncompressed
  * DIB form real crawls carry. The encoder emits the canonical 24-bit
  * bottom-up BI_RGB layout with 4-byte row padding; the decoder
  * additionally accepts 32-bit BGRX, 8-bit palettized and top-down
  * (negative height) images, and REJECTS compressed (BI_RLE and
  * BI_BITFIELDS) or 1/4/16-bit payloads rather than misdecoding them
  * (the codec-family rule). Interop-proven in MultimodalSpec against
  * the JDK's independent ImageIO BMP plugin in BOTH directions.
  */
object BmpCodec {

  /** Encode raw interleaved RGB as a 24-bit bottom-up BI_RGB BMP. */
  def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val stride = (width * 3 + 3) & ~3
    val dataSize = stride * height
    val out = new Array[Byte](54 + dataSize)
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = { p16(o, v & 0xffff); p16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    p32(2, 54 + dataSize); p32(10, 54)
    p32(14, 40); p32(18, width); p32(22, height)
    p16(26, 1); p16(28, 24); p32(30, 0); p32(34, dataSize)
    p32(38, 2835); p32(42, 2835) // 72 dpi, by convention
    var y = 0
    while (y < height) {
      val srcRow = height - 1 - y // bottom-up row order
      var x = 0
      while (x < width) {
        val s = (srcRow * width + x) * 3
        val d = 54 + y * stride + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Encode palette indices as an 8-bit BI_RLE8 BMP (compression 1,
    * bottom-up — the only row order RLE BMPs allow). The encoder emits
    * encoded-mode runs only (count, index — runs clamp at 255), an EOL
    * escape after every row and the EOF escape at the end; the decoder
    * additionally accepts absolute mode and delta escapes, which real
    * writers (ImageIO included) interleave. `indices` is top-down
    * raster order, like [[encode]]'s rgb. */
  def encodeRle8(width: Int, height: Int, indices: Array[Byte],
                 palette: Array[Int]): Array[Byte] = {
    require(indices.length == width * height, "indices must be w*h bytes")
    require(palette.nonEmpty && palette.length <= 256, "palette must be 1..256 entries")
    val data = new java.io.ByteArrayOutputStream()
    var y = height - 1 // bottom-up: last raster row is written first
    while (y >= 0) {
      var x = 0
      while (x < width) {
        val v = indices(y * width + x)
        var run = 1
        while (x + run < width && run < 255 && indices(y * width + x + run) == v) run += 1
        data.write(run); data.write(v & 0xff)
        x += run
      }
      data.write(0); data.write(if (y == 0) 1 else 0) // EOL / final EOF
      y -= 1
    }
    val rle = data.toByteArray
    val palN = palette.length
    val dataOff = 54 + 4 * palN
    val out = new Array[Byte](dataOff + rle.length)
    def p16(o: Int, v: Int): Unit = {
      out(o) = (v & 0xff).toByte; out(o + 1) = ((v >> 8) & 0xff).toByte
    }
    def p32(o: Int, v: Int): Unit = { p16(o, v & 0xffff); p16(o + 2, v >>> 16) }
    out(0) = 'B'; out(1) = 'M'
    p32(2, out.length); p32(10, dataOff)
    p32(14, 40); p32(18, width); p32(22, height)
    p16(26, 1); p16(28, 8); p32(30, 1) // BI_RLE8
    p32(34, rle.length)
    p32(38, 2835); p32(42, 2835)
    p32(46, palN); p32(50, 0)
    var c = 0
    while (c < palN) {
      val o = 54 + c * 4
      out(o) = (palette(c) & 0xff).toByte // blue
      out(o + 1) = ((palette(c) >> 8) & 0xff).toByte
      out(o + 2) = ((palette(c) >> 16) & 0xff).toByte
      out(o + 3) = 0
      c += 1
    }
    System.arraycopy(rle, 0, out, dataOff, rle.length)
    out
  }

  /** Decode a BMP payload to an RGB [[PpmCodec.Image]]; None on
    * malformed, truncated, compressed or unsupported-depth input
    * (null-not-fail, the codec-family rule). */
  def decode(payload: Array[Byte]): Option[PpmCodec.Image] = {
    if (payload == null || payload.length < 54) return None
    if (payload(0) != 'B' || payload(1) != 'M') return None
    def u16(o: Int): Int = (payload(o) & 0xff) | ((payload(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = u16(o).toLong | (u16(o + 2).toLong << 16)
    val dataOff = u32(10)
    val hdrSize = u32(14)
    if (hdrSize < 40 || 14 + hdrSize > payload.length) return None // V3+ only
    val width = u32(18).toInt
    val rawH = u32(22).toInt
    val topDown = rawH < 0
    val height = math.abs(rawH)
    if (width <= 0 || width > PpmCodec.MaxDim ||
      height <= 0 || height > PpmCodec.MaxDim) return None
    if (u16(26) != 1) return None // planes
    val bpp = u16(28)
    val compression = u32(30)
    // BI_RGB (0) or BI_RLE8 (1, 8-bit only) — bitfields/RLE4/JPEG/PNG
    // embeddings are rejected, never misdecoded
    if (compression != 0 && !(compression == 1 && bpp == 8)) return None
    if (bpp != 24 && bpp != 32 && bpp != 8) return None
    val palOff = 14 + hdrSize.toInt
    val clrUsed = u32(46).toInt
    val palN = if (bpp == 8) (if (clrUsed > 0) clrUsed else 256) else 0
    if (palN > 256 || palOff + 4L * palN > payload.length) return None
    if (compression == 1) {
      // RLE8 is bottom-up only (the spec gives delta escapes positive
      // dy, meaningless top-down)
      if (topDown) return None
      if (dataOff < palOff + 4L * palN || dataOff >= payload.length) return None
      val idx = new Array[Byte](width * height) // uncovered pixels -> index 0
      var x = 0
      var y = 0 // 0 = BOTTOM row, per RLE coordinate space
      var p = dataOff.toInt
      var done = false
      while (!done) {
        if (p + 2 > payload.length) return None // torn stream: no EOF seen
        val n = payload(p) & 0xff
        val v = payload(p + 1) & 0xff
        p += 2
        if (n > 0) { // encoded run
          if (y >= height || x + n > width || v >= palN) return None
          java.util.Arrays.fill(idx, y * width + x, y * width + x + n, v.toByte)
          x += n
        } else v match {
          case 0 => x = 0; y += 1; if (y > height) return None // EOL
          case 1 => done = true // EOF
          case 2 => // delta: unsigned (dx, dy) move
            if (p + 2 > payload.length) return None
            x += payload(p) & 0xff; y += payload(p + 1) & 0xff
            p += 2
            if (x > width || y > height) return None
          case n2 => // absolute mode: n2 literal indices, word-aligned
            val pad = n2 & 1
            if (p + n2 + pad > payload.length) return None
            if (y >= height || x + n2 > width) return None
            var i = 0
            while (i < n2) {
              val iv = payload(p + i) & 0xff
              if (iv >= palN) return None
              idx(y * width + x + i) = iv.toByte
              i += 1
            }
            x += n2; p += n2 + pad
        }
      }
      val rgb = new Array[Byte](width * height * 3)
      var yy = 0
      while (yy < height) {
        val dstRow = height - 1 - yy // RLE row 0 is the bottom raster row
        var xx = 0
        while (xx < width) {
          val s = palOff + (idx(yy * width + xx) & 0xff) * 4
          val d = (dstRow * width + xx) * 3
          rgb(d) = payload(s + 2); rgb(d + 1) = payload(s + 1); rgb(d + 2) = payload(s)
          xx += 1
        }
        yy += 1
      }
      return Some(PpmCodec.Image(width, height, rgb))
    }
    val stride = ((width * bpp / 8) + 3) & ~3
    if (dataOff < 14 + hdrSize || dataOff.toInt < 0 ||
      dataOff + stride.toLong * height > payload.length) return None
    val rgb = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val dstRow = if (topDown) y else height - 1 - y
      val ro = dataOff.toInt + y * stride
      var x = 0
      while (x < width) {
        val d = (dstRow * width + x) * 3
        bpp match {
          case 24 =>
            val s = ro + x * 3
            rgb(d) = payload(s + 2); rgb(d + 1) = payload(s + 1); rgb(d + 2) = payload(s)
          case 32 =>
            val s = ro + x * 4
            rgb(d) = payload(s + 2); rgb(d + 1) = payload(s + 1); rgb(d + 2) = payload(s)
          case 8 =>
            val idx = payload(ro + x) & 0xff
            if (idx >= palN) return None
            val s = palOff + idx * 4
            rgb(d) = payload(s + 2); rgb(d + 1) = payload(s + 1); rgb(d + 2) = payload(s)
        }
        x += 1
      }
      y += 1
    }
    Some(PpmCodec.Image(width, height, rgb))
  }
}

/** Multimodal-column plumbing (SURVEY §2c `m1_binary_meta`,
  * `m2_image_decode`, `m3_audio_decode`).
  *
  * Contract: media rides as an opaque `binary` column plus typed
  * metadata; decode/feature-extraction runs per-partition so a real
  * decoder amortizes model/codec setup across a batch (the same batch
  * shape a vectorized/Arrow UDF would see). The PPM path
  * ([[decodeImages]], [[resizeImages]]) is a REAL decode of a real
  * format (pure JVM). Compressed codecs aren't in this container, so
  * the generic `decodeFrame` remains a DETERMINISTIC STUB — swap its
  * body for an actual codec to productionize; the schema, partitioning
  * and batch shape are identical.
  */
object Multimodal {

  /** Typed features of a decoded image; None fields = malformed payload
    * (decode nulls the row's features, never fails the pipeline). */
  final case class ImageFeatures(
      id: Long, byte_len: Int, width: Option[Int], height: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double], mean_b: Option[Double])

  /** REAL per-partition image decode over (id, ppmPayload) rows:
    * dimensions + per-channel means from actual pixels. mapPartitions
    * is the batch shape — one decoder context per task at 100 TB. */
  def decodeImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] =
    decodeImagesWith(media, PpmCodec.decode)

  /** [[decodeImages]] for GIF payloads: the REAL compressed path —
    * LZW-decompressed palette indices resolve to pixels, then the
    * identical feature extraction. One decoder swap, same plumbing. */
  def decodeGifImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] =
    decodeImagesWith(media, GifCodec.decode)

  /** [[decodeImages]] for PNG payloads: DEFLATE via the JVM's zlib,
    * chunk/CRC/filter layer from scratch ([[PngCodec]]). */
  def decodePngImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] =
    decodeImagesWith(media, PngCodec.decode)

  /** [[decodeImages]] for BMP payloads: the uncompressed Windows DIB
    * form ([[BmpCodec]] — 24/32-bit and palettized, padding and both
    * row orders; interop-proven against the JDK's ImageIO plugin). */
  def decodeBmpImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] =
    decodeImagesWith(media, BmpCodec.decode)

  /** [[decodeImages]] for baseline JPEG payloads ([[JpegCodec]] — the
    * from-scratch Huffman/IDCT decoder; interop-proven, not oracled,
    * since JPEG decode is standard-bounded rather than bit-fixed). */
  def decodeJpegImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] =
    decodeImagesWith(media, JpegCodec.decode)

  /** Magic-byte prefixes for [[sniffMime]]: the published file
    * signatures (PNG: RFC 2083 §12.11; JPEG: JFIF/T.81 SOI+marker;
    * GIF87a/89a share "GIF8"; BMP: "BM"; RIFF: the container four-cc;
    * Y4M: the YUV4MPEG2 stream header [[Y4mCodec]] parses; PPM: the
    * "P6" rawbits magic [[PpmCodec]] parses; ID3: the MP3 metadata
    * prelude). Byte arrays, not strings — sniffing is over raw
    * payload bytes, independent of any charset. */
  private[graft] val MagicPng: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private[graft] val MagicJpeg: Array[Byte] = Array(0xff, 0xd8, 0xff).map(_.toByte)
  private[graft] val MagicGif: Array[Byte] = "GIF8".getBytes("US-ASCII")
  private[graft] val MagicBmp: Array[Byte] = "BM".getBytes("US-ASCII")
  private[graft] val MagicRiff: Array[Byte] = "RIFF".getBytes("US-ASCII")
  private[graft] val MagicWave: Array[Byte] = "WAVE".getBytes("US-ASCII")
  private[graft] val MagicY4m: Array[Byte] = "YUV4MPEG2".getBytes("US-ASCII")
  private[graft] val MagicPpm: Array[Byte] = "P6\n".getBytes("US-ASCII")
  private[graft] val MagicId3: Array[Byte] = "ID3".getBytes("US-ASCII")

  /** Content-type sniff from payload MAGIC BYTES (the libmagic / HTTP
    * mime-sniffing shape): a crawl corpus's stated content types lie,
    * so routing into the right decoder family keys on the bytes
    * themselves. Pure in-row column expression — prefix compares on
    * the binary column, zero shuffle, codegen-friendly — so the sniff
    * runs AT THE SCAN on 100 TB without moving a payload anywhere.
    * Precedence is longest-prefix-first; RIFF containers check the
    * four-cc at offset 8 ("WAVE" → wav, else an unrouted container);
    * anything unmatched falls through to text/plain (the corpus raw
    * default). Ambiguous TEXT that happens to start with a magic
    * ("BM...") sniffs as that type — honest content sniffing, same
    * verdict in any engine reading the same bytes. */
  def sniffMime(payload: Column): Column = {
    def pfx(at: Int, magic: Array[Byte]): Column =
      substring(payload, at, magic.length) === lit(magic)
    when(pfx(1, MagicPng), "image/png")
      .when(pfx(1, MagicY4m), "video/x-yuv4mpeg")
      .when(pfx(1, MagicGif), "image/gif")
      .when(pfx(1, MagicJpeg), "image/jpeg")
      .when(pfx(1, MagicId3), "audio/mpeg")
      .when(pfx(1, MagicRiff) && pfx(9, MagicWave), "audio/x-wav")
      .when(pfx(1, MagicRiff), "application/octet-stream")
      .when(pfx(1, MagicPpm), "image/x-portable-pixmap")
      .when(pfx(1, MagicBmp), "image/bmp")
      .otherwise("text/plain")
  }

  /** Decoder-family routing over a sniffed mime: which per-partition
    * decode stage ([[decodeImages]]/[[WavCodec]]/[[Y4mCodec]]/text)
    * the payload belongs to. */
  def mimeRoute(mime: Column): Column =
    when(mime.startsWith("image/"), "image")
      .when(mime.startsWith("audio/"), "audio")
      .when(mime.startsWith("video/"), "video")
      .when(mime === "text/plain", "text")
      .otherwise("binary")

  private def decodeImagesWith(media: Dataset[(Long, Array[Byte])],
      decode: Array[Byte] => Option[PpmCodec.Image]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        val len = if (payload == null) 0 else payload.length
        decode(payload) match {
          case Some(img) =>
            val n = img.width * img.height
            val sums = new Array[Long](3)
            var i = 0
            while (i < n) {
              var c = 0
              while (c < 3) { sums(c) += img.rgb(i * 3 + c) & 0xff; c += 1 }
              i += 1
            }
            ImageFeatures(id, len, Some(img.width), Some(img.height),
              Some(sums(0).toDouble / n), Some(sums(1).toDouble / n),
              Some(sums(2).toDouble / n))
          case None =>
            ImageFeatures(id, len, None, None, None, None, None)
        }
      }
    }
  }

  /** A decoded image's 64-bit perceptual fingerprint; None = malformed
    * payload or an image smaller than the 9×8 hash window. */
  final case class ImageHash(id: Long, width: Option[Int],
                             height: Option[Int], dhash: Option[Long])

  /** The pure dHash kernel: bit (row·8+col) is set iff
    * gray(row,col) < gray(row,col+1) over the top-left 9×8 window
    * (gray = (r+g+b)/3, integer); None if the image is smaller than
    * the window. Separated from the Dataset plumbing so its
    * invariants (brightness invariance, totality, per-bit semantics)
    * are property-testable. */
  private[graft] def dhash64(img: PpmCodec.Image): Option[Long] =
    if (img.width < 9 || img.height < 8) None
    else {
      def gray(r: Int, c: Int): Int = {
        val p = (r * img.width + c) * 3
        ((img.rgb(p) & 0xff) + (img.rgb(p + 1) & 0xff) +
          (img.rgb(p + 2) & 0xff)) / 3
      }
      var h = 0L
      var b = 0
      while (b < 64) {
        if (gray(b / 8, b % 8) < gray(b / 8, b % 8 + 1)) h |= 1L << b
        b += 1
      }
      Some(h)
    }

  /** The [[dhash64]] kernel over a raw luma plane (video frames are
    * already single-channel — no gray conversion): bit (row·8+col) is
    * set iff y(row,col) < y(row,col+1) over the top-left 9×8 window;
    * None if the frame is smaller than the window. */
  private[graft] def dhash64Luma(width: Int, height: Int,
                                 y: Array[Byte]): Option[Long] =
    if (width < 9 || height < 8) None
    else {
      def lum(r: Int, c: Int): Int = y(r * width + c) & 0xff
      var h = 0L
      var b = 0
      while (b < 64) {
        if (lum(b / 8, b % 8) < lum(b / 8, b % 8 + 1)) h |= 1L << b
        b += 1
      }
      Some(h)
    }

  /** A sampled video frame's 64-bit perceptual fingerprint
    * ([[dhash64Luma]] over the decoded plane); None frame fields =
    * malformed payload, None dhash = frame smaller than the 9×8
    * window (null-not-fail, the codec-family rule). */
  final case class FrameHash(id: Long, frame_idx: Option[Int],
                             dhash: Option[Long])

  /** REAL per-partition perceptual hashing of decoded VIDEO frames:
    * every `stride`-th frame's luma plane → dHash. Brightness-
    * invariant like the image path, so a re-encoded AND re-brightened
    * frame still collides where a content hash misses. Feeds
    * `Dedup.hammingNearDups` for cross-video frame dedup: only
    * (frame id, 8-byte hash) rows ever leave the decode task — the
    * planes themselves never shuffle. */
  def hashVideoFrames(media: Dataset[(Long, Array[Byte])],
                      stride: Int): Dataset[FrameHash] = {
    require(stride > 0, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        Y4mCodec.decode(payload) match {
          case Some(v) if v.frames.nonEmpty =>
            (0 until v.frames.length by stride).map { f =>
              FrameHash(id, Some(f), dhash64Luma(v.width, v.height, v.luma(f)))
            }
          case _ => Seq(FrameHash(id, None, None))
        }
      }
    }
  }

  /** REAL per-partition perceptual hashing (dHash, [[dhash64]]) of
    * decoded images. Brightness-invariant by construction — a uniform
    * offset shifts every gray equally and no comparison flips — which
    * is what makes it a near-dup key where a content hash is not.
    * Compose with [[resizeImages]](9, 8) first for scale-invariance
    * (the classic dHash recipe); the hash then feeds
    * `Dedup.hammingNearDups` for banded image dedup. */
  def hashImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageHash] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        PpmCodec.decode(payload) match {
          case Some(img) =>
            ImageHash(id, Some(img.width), Some(img.height), dhash64(img))
          case None => ImageHash(id, None, None, None)
        }
      }
    }
  }

  /** REAL per-partition box resize of PPM payloads; malformed payloads
    * pass through untouched (null-not-fail would drop pixels a later
    * stage may still want to inspect). */
  def resizeImages(media: Dataset[(Long, Array[Byte])], tw: Int, th: Int): Dataset[(Long, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        PpmCodec.decode(payload) match {
          case Some(img) =>
            val r = PpmCodec.resizeBox(img, tw, th)
            (id, PpmCodec.encode(r.width, r.height, r.rgb))
          case None => (id, payload)
        }
      }
    }
  }

  /** Typed features of a decoded audio clip; None fields = malformed
    * payload (decode nulls the row's features, never fails the
    * pipeline). `mean_abs` is the mean absolute amplitude, `peak_abs`
    * the peak — the standard loudness/clipping screens a training-data
    * audio pipeline runs first. */
  final case class AudioFeatures(
      id: Long, byte_len: Int, sample_rate: Option[Int],
      n_samples: Option[Int], duration_ms: Option[Double],
      mean_abs: Option[Double], peak_abs: Option[Int])

  final case class ResampledAudio(
      id: Long, src_rate: Option[Int], dst_rate: Option[Int],
      n_out: Option[Int], mean_abs: Option[Double], peak_abs: Option[Double])

  final case class VideoRgbFeatures(
      id: Long, frame_idx: Option[Int], width: Option[Int],
      height: Option[Int], mean_r: Option[Double], mean_g: Option[Double],
      mean_b: Option[Double])

  /** Per-partition BT.601 color conversion of 4:2:0 Y4M frames to
    * per-channel RGB means — the limited-range integer math every
    * video pipeline runs before pixels feed an image model (ITU-R
    * BT.601, the published fixed-point form: R = (298·(Y−16) +
    * 409·(V−128) + 128) >> 8 etc., clipped to [0,255]). The shift is
    * expressed convention-free: a negative pre-shift total clips to 0
    * BEFORE any shift, so `t >> 8` only ever runs on t ≥ 0 and the
    * oracle's integer division is exact in any engine. Non-4:2:0
    * colorspaces yield the null row (null-not-fail); luma-only
    * consumers keep using [[extractVideoFrames]]. */
  def decodeVideoRgb(media: Dataset[(Long, Array[Byte])]): Dataset[VideoRgbFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        Y4mCodec.decode(payload) match {
          case Some(v) if v.colorspace.startsWith("420") =>
            val w = v.width; val h = v.height
            val cw = (w + 1) / 2; val ch = (h + 1) / 2
            v.frames.indices.iterator.map { f =>
              val fr = v.frames(f)
              var sr = 0L; var sg = 0L; var sb = 0L
              var p = 0
              val n = w * h
              while (p < n) {
                val x = p % w; val y = p / w
                val luY = fr(p) & 0xff
                val cu = fr(n + (y / 2) * cw + x / 2) & 0xff
                val cv = fr(n + cw * ch + (y / 2) * cw + x / 2) & 0xff
                val c = luY - 16; val dd = cu - 128; val e = cv - 128
                @inline def cl(t: Int): Int =
                  if (t < 0) 0 else math.min(t >> 8, 255)
                sr += cl(298 * c + 409 * e + 128)
                sg += cl(298 * c - 100 * dd - 208 * e + 128)
                sb += cl(298 * c + 516 * dd + 128)
                p += 1
              }
              VideoRgbFeatures(id, Some(f), Some(w), Some(h),
                Some(sr.toDouble / n), Some(sg.toDouble / n),
                Some(sb.toDouble / n))
            }
          case _ =>
            Iterator.single(VideoRgbFeatures(id, None, None, None, None, None, None))
        }
      }
    }
  }

  final case class LetterboxFeatures(
      id: Long, out_w: Option[Int], out_h: Option[Int],
      pad_left: Option[Int], pad_top: Option[Int],
      mean_r: Option[Double], mean_g: Option[Double], mean_b: Option[Double])

  /** Per-partition aspect-preserving LETTERBOX to a t×t canvas — the
    * "everything to one square input size without distortion" step
    * image-model pipelines run where a bare resize would stretch:
    * integer box-average downscale to (w·t/max(w,h), h·t/max(w,h)),
    * centered on a black canvas ((t−w')/2, (t−h')/2 pads, floor).
    * Canvas means divide by t² (pad pixels contribute 0), so the
    * whole geometry is closed-form oracle-able; null-not-fail on
    * malformed payloads. */
  def letterboxImages(media: Dataset[(Long, Array[Byte])], t: Int): Dataset[LetterboxFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        PpmCodec.decode(payload) match {
          case Some(img) =>
            val mx = math.max(img.width, img.height)
            val tw = math.max(1, img.width * t / mx)
            val th = math.max(1, img.height * t / mx)
            val r = PpmCodec.resizeBox(img, tw, th)
            val sums = new Array[Long](3)
            var i = 0
            val n = tw * th
            while (i < n) {
              var c = 0
              while (c < 3) { sums(c) += r.rgb(i * 3 + c) & 0xff; c += 1 }
              i += 1
            }
            val area = t.toDouble * t
            LetterboxFeatures(id, Some(t), Some(t),
              Some((t - tw) / 2), Some((t - th) / 2),
              Some(sums(0).toDouble / area), Some(sums(1).toDouble / area),
              Some(sums(2).toDouble / area))
          case None =>
            LetterboxFeatures(id, None, None, None, None, None, None, None)
        }
      }
    }
  }

  /** One parsed WARC record; a malformed container yields a single
    * row with null record fields (null-not-fail). */
  final case class WarcRecordRow(
      id: Long, rec_idx: Option[Int], uri: Option[String],
      content_length: Option[Int], body: Option[String])

  /** Per-partition WARC-container parse: every payload expands to its
    * framed records (Content-Length-honored bodies — see
    * [[WarcCodec]]) — the crawl-ingestion record split that runs
    * BEFORE any text operator sees a document. Same batch shape as
    * the codecs: one parser context per task, payloads never
    * shuffle. */
  def decodeWarcRecords(media: Dataset[(Long, Array[Byte])]): Dataset[WarcRecordRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        WarcCodec.parse(payload) match {
          case Some(recs) =>
            recs.iterator.zipWithIndex.map { case (r, i) =>
              WarcRecordRow(id, Some(i), Some(r.uri),
                Some(r.contentLength), Some(r.body))
            }
          case None =>
            Iterator.single(WarcRecordRow(id, None, None, None, None))
        }
      }
    }
  }

  /** 2× linear-interpolation upsample stats — the sample-rate
    * normalization every audio-training pipeline runs before feature
    * extraction (all corpus audio to one rate), kept at the stats
    * level so the result is oracle-able: out[2i] = s[i], out[2i+1] =
    * (s[i]+s[i+1])/2. Midpoints are exact half-integers and their
    * running sum stays far below 2^52, so the double fold is EXACT —
    * bit-deterministic across engines and partitionings without the
    * usual fixed-point tricks. Per-partition decode (one codec
    * context per task), payloads never shuffle; null-not-fail on
    * malformed payloads, and a decodable-but-empty stream reports
    * n_out 0 with null stats. */
  def resampleAudio2x(media: Dataset[(Long, Array[Byte])]): Dataset[ResampledAudio] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        WavCodec.decode(payload) match {
          case Some(a) if a.samples.nonEmpty =>
            val n = a.samples.length
            val nOut = 2 * n - 1
            var sum = 0.0
            var peak = 0.0
            var j = 0
            while (j < nOut) {
              val v =
                if (j % 2 == 0) a.samples(j / 2).toDouble
                else (a.samples(j / 2).toDouble +
                  a.samples(j / 2 + 1).toDouble) / 2.0
              val av = math.abs(v)
              sum += av
              if (av > peak) peak = av
              j += 1
            }
            ResampledAudio(id, Some(a.sampleRate), Some(a.sampleRate * 2),
              Some(nOut), Some(sum / nOut), Some(peak))
          case Some(a) =>
            ResampledAudio(id, Some(a.sampleRate), Some(a.sampleRate * 2),
              Some(0), None, None)
          case None =>
            ResampledAudio(id, None, None, None, None, None)
        }
      }
    }
  }

  /** REAL per-partition WAV decode over (id, wavPayload) rows: sample
    * rate, duration and amplitude stats from actual PCM samples.
    * mapPartitions is the batch shape — one decoder context per task
    * at 100 TB. Amplitude sums accumulate in Long (exact — n · 32768
    * fits far inside Long at [[WavCodec.MaxSamples]]), so the mean is
    * one exact integer sum divided once: deterministic under any
    * partitioning and mirrored exactly by the SQL oracle. */
  def decodeAudio(media: Dataset[(Long, Array[Byte])]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        val len = if (payload == null) 0 else payload.length
        WavCodec.decode(payload) match {
          case Some(a) if a.samples.nonEmpty =>
            var sum = 0L
            var peak = 0
            var i = 0
            while (i < a.samples.length) {
              val v = math.abs(a.samples(i).toInt)
              sum += v
              if (v > peak) peak = v
              i += 1
            }
            AudioFeatures(id, len, Some(a.sampleRate), Some(a.samples.length),
              Some(a.samples.length * 1000.0 / a.sampleRate),
              Some(sum.toDouble / a.samples.length), Some(peak))
          case Some(a) =>
            AudioFeatures(id, len, Some(a.sampleRate), Some(0), Some(0.0),
              None, None)
          case None =>
            AudioFeatures(id, len, None, None, None, None, None)
        }
      }
    }
  }

  /** One COMPOSED animated-GIF frame's features; a malformed payload
    * yields a single row with null frame fields (null-not-fail). */
  final case class GifFrameFeatures(
      id: Long, frame_idx: Option[Int], width: Option[Int],
      height: Option[Int], mean_r: Option[Double], mean_g: Option[Double],
      mean_b: Option[Double])

  /** Per-partition ANIMATED GIF decode: every payload expands to its
    * composed screen-frames (placement/transparency/disposal applied
    * by [[GifCodec.decodeFrames]]) with exact-integer channel means —
    * the decode step that feeds m6-style frame dedup and m14-style
    * scene detection for the animated half of a crawl's GIFs. */
  def decodeAnimatedGifs(media: Dataset[(Long, Array[Byte])]): Dataset[GifFrameFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        GifCodec.decodeFrames(payload) match {
          case Some(frames) =>
            frames.iterator.zipWithIndex.map { case (img, f) =>
              val n = img.width * img.height
              val sums = new Array[Long](3)
              var i = 0
              while (i < n) {
                var c = 0
                while (c < 3) { sums(c) += img.rgb(i * 3 + c) & 0xff; c += 1 }
                i += 1
              }
              GifFrameFeatures(id, Some(f), Some(img.width), Some(img.height),
                Some(sums(0).toDouble / n), Some(sums(1).toDouble / n),
                Some(sums(2).toDouble / n))
            }
          case None =>
            Iterator.single(GifFrameFeatures(id, None, None, None, None, None, None))
        }
      }
    }
  }

  /** One frame-boundary row of the scene-change report: the mean
    * absolute luma difference against the previous frame and the cut
    * verdict. Malformed payloads yield one row with null fields. */
  final case class SceneBoundary(
      id: Long, frame_idx: Option[Int], mad: Option[Double],
      is_cut: Option[Boolean])

  /** Scene-change detection over Y4M payloads — the shot-boundary
    * pass a video training-data pipeline runs before sampling frames
    * (one frame per SHOT beats one frame per N: m4's stride sampler
    * oversamples static shots and misses short ones). Per consecutive
    * frame pair: mean absolute luma difference, folded in exact
    * integer sums (≤ 255·pixels per frame, far inside Long) with ONE
    * division at the end — bit-deterministic and oracle-checkable. A
    * boundary is a cut when mad >= threshold. mapPartitions batch
    * shape; a 1-frame video yields no boundary rows. */
  def sceneChanges(media: Dataset[(Long, Array[Byte])],
                   threshold: Double): Dataset[SceneBoundary] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        Y4mCodec.decode(payload) match {
          case Some(v) if v.frames.length >= 1 =>
            val n = v.width * v.height
            (1 until v.frames.length).iterator.map { f =>
              val a = v.luma(f - 1)
              val b = v.luma(f)
              var sum = 0L
              var i = 0
              while (i < n) {
                sum += math.abs((a(i) & 0xff) - (b(i) & 0xff))
                i += 1
              }
              val mad = sum.toDouble / n
              SceneBoundary(id, Some(f), Some(mad), Some(mad >= threshold))
            }
          case _ => Iterator.single(SceneBoundary(id, None, None, None))
        }
      }
    }
  }

  /** Typed analysis stats of a decoded audio payload (beyond the
    * decode-level features): zero-crossing count (the cheap
    * pitch/voicing proxy), RMS energy, and the near-silence ratio —
    * the screens an audio training-data pipeline runs to drop dead
    * air and tone-like degenerate clips. All three accumulate in
    * exact integer state (squares fit a Long far under 2^53·, counts
    * are ints), so every value is bit-deterministic and
    * oracle-checkable: the only floating steps are one division and
    * one IEEE sqrt at the very end. */
  final case class AudioStats(
      id: Long, byte_len: Int, n_samples: Option[Int],
      zero_crossings: Option[Long], rms: Option[Double],
      silence_ratio: Option[Double])

  /** Near-silence threshold: 1% of full scale. */
  private val SilenceAbs = 328

  /** Per-partition audio ANALYSIS over (id, wavPayload) rows — decode
    * (any [[WavCodec]] format: PCM16, µ-law, IMA ADPCM) then one pass
    * of integer folds. A crossing is a strict sign flip
    * (s(i-1)·s(i) < 0 — zero samples never count, the deterministic
    * convention the oracle mirrors). */
  def audioStats(media: Dataset[(Long, Array[Byte])]): Dataset[AudioStats] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        val len = if (payload == null) 0 else payload.length
        WavCodec.decode(payload) match {
          case Some(a) if a.samples.nonEmpty =>
            val n = a.samples.length
            var sq = 0L
            var zc = 0L
            var quiet = 0L
            var i = 0
            while (i < n) {
              val v = a.samples(i).toLong
              sq += v * v
              if (math.abs(v) < SilenceAbs) quiet += 1
              if (i > 0 && a.samples(i - 1).toLong * v < 0) zc += 1
              i += 1
            }
            AudioStats(id, len, Some(n), Some(zc),
              Some(math.sqrt(sq.toDouble / n)), Some(quiet.toDouble / n))
          case Some(_) =>
            AudioStats(id, len, Some(0), None, None, None)
          case None =>
            AudioStats(id, len, None, None, None, None)
        }
      }
    }
  }

  /** VAD report of one clip; a malformed payload yields null fields
    * (null-not-fail), a decodable clip shorter than one frame reports
    * n_frames 0 with null activity fields. */
  final case class VadStats(
      id: Long, n_frames: Option[Int], n_voiced: Option[Int],
      n_segments: Option[Int], voiced_ratio: Option[Double])

  /** Energy-threshold voice-activity detection over (id, wavPayload)
    * rows — the segmentation pass an audio-training pipeline runs to
    * drop silence and count speech segments before feature extraction.
    * The clip splits into fixed `frameLen`-sample frames (trailing
    * partial frame dropped); a frame is VOICED iff its |sample| sum
    * exceeds HALF the mean frame sum of the clip — as an exact integer
    * comparison (2·frameSum·nFrames > totalSum), so the verdict is
    * bit-deterministic cross-engine with no double thresholds. A
    * segment is a maximal voiced run (counted at its start frame).
    * Same per-partition decode shape as [[audioStats]]: one codec
    * context per task, payloads never shuffle. */
  def vadStats(media: Dataset[(Long, Array[Byte])],
               frameLen: Int = 100): Dataset[VadStats] = {
    require(frameLen > 0, "frameLen must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        WavCodec.decode(payload) match {
          case Some(a) if a.samples.length >= frameLen =>
            val nf = a.samples.length / frameLen
            val fs = new Array[Long](nf)
            var tot = 0L
            var f = 0
            while (f < nf) {
              var s = 0L
              var i = f * frameLen
              val end = i + frameLen
              while (i < end) { s += math.abs(a.samples(i).toLong); i += 1 }
              fs(f) = s; tot += s; f += 1
            }
            var voiced = 0
            var segs = 0
            var prev = false
            f = 0
            while (f < nf) {
              val v = 2L * fs(f) * nf > tot
              if (v) { voiced += 1; if (!prev) segs += 1 }
              prev = v; f += 1
            }
            VadStats(id, Some(nf), Some(voiced), Some(segs),
              Some(voiced.toDouble / nf))
          case Some(_) => VadStats(id, Some(0), None, None, None)
          case None    => VadStats(id, None, None, None, None)
        }
      }
    }
  }

  /** Typed features of one SAMPLED video frame; a malformed payload
    * yields a single row with null frame fields (null-not-fail). */
  final case class VideoFrameFeatures(
      id: Long, byte_len: Int, frame_idx: Option[Int],
      width: Option[Int], height: Option[Int], n_frames: Option[Int],
      mean_y: Option[Double], peak_y: Option[Int])

  /** REAL per-partition Y4M decode + frame sampling over (id, payload)
    * rows: every `stride`-th frame becomes a row with luma statistics
    * from actual plane bytes — the decode/frame-sample step of a video
    * training-data pipeline. Luma sums accumulate in Long (exact), so
    * the mean is one integer sum divided once — deterministic under
    * any partitioning and mirrored exactly by the SQL oracle.
    * mapPartitions is the batch shape: one decoder context per task. */
  def sampleVideoFrames(media: Dataset[(Long, Array[Byte])],
                        stride: Int): Dataset[VideoFrameFeatures] = {
    require(stride > 0, s"stride must be positive, got $stride")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { case (id, payload) =>
        val len = if (payload == null) 0 else payload.length
        Y4mCodec.decode(payload) match {
          case Some(v) if v.frames.nonEmpty =>
            (0 until v.frames.length by stride).map { f =>
              val y = v.luma(f)
              var sum = 0L
              var peak = 0
              var i = 0
              while (i < y.length) {
                val b = y(i) & 0xff
                sum += b
                if (b > peak) peak = b
                i += 1
              }
              VideoFrameFeatures(id, len, Some(f), Some(v.width), Some(v.height),
                Some(v.frames.length), Some(sum.toDouble / y.length), Some(peak))
            }
          case _ =>
            Seq(VideoFrameFeatures(id, len, None, None, None, None, None, None))
        }
      }
    }
  }

  /** Typed per-payload features. `width`/`height`/`channels` are what a
    * real decoder would emit; the stub derives them from the bytes. */
  case class MediaFeatures(
      id: Long, byteLen: Int, width: Int, height: Int,
      channels: Int, meanByte: Double)

  /** STUB decoder — stands in for e.g. an image codec. Deterministic in
    * the payload bytes so tests and oracles are stable. */
  private def decodeFrame(id: Long, payload: Array[Byte]): MediaFeatures = {
    val n = payload.length
    var s = 0L
    var i = 0
    while (i < n) { s += payload(i) & 0xff; i += 1 }
    MediaFeatures(id, n, width = n % 1024, height = (n / 1024) + 1,
      channels = 3, meanByte = if (n == 0) 0.0 else s.toDouble / n)
  }

  /** Per-partition feature extraction over (id, payload) rows. A real
    * decoder would initialize once per partition here (hence
    * mapPartitions, not map) — that is the batch shape that matters at
    * 100 TB: one codec setup per task, not per row. */
  def extractFeatures(media: Dataset[(Long, Array[Byte])]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: val codec = Codec.open() — once per partition
      it.map { case (id, payload) => decodeFrame(id, payload) }
    }
  }

  /** STUB resize: deterministic byte-domain downsample standing in for
    * an image resize — keeps every (len/target)-th byte so output size
    * and content are pure functions of the input. Swap the body for a
    * real scaler; the per-partition batching contract is the point. */
  def resize(media: Dataset[(Long, Array[Byte])], targetBytes: Int): Dataset[(Long, Array[Byte])] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real impl: scaler initialized once per partition
      it.map { case (id, payload) =>
        if (payload.length <= targetBytes) (id, payload)
        else {
          val step = payload.length.toDouble / targetBytes
          (id, Array.tabulate(targetBytes)(i => payload((i * step).toInt)))
        }
      }
    }
  }

  /** Frame sampling for a chunked payload: every `stride`-th fixed-size
    * block becomes a "frame" row (stub for video frame extraction).
    * Narrow generate — no shuffle. */
  def sampleFrames(media: DataFrame, idCol: String, payloadCol: String,
                   blockSize: Int = 1024, stride: Int = 4): DataFrame = {
    val nBlocks = ceil(octet_length(col(payloadCol)).cast("double") / blockSize)
      .cast("int")
    media.select(col(idCol), col(payloadCol),
        posexplode(sequence(lit(0), greatest(nBlocks - 1, lit(0)))).as(Seq("i", "blk")))
      .filter(col("blk") % stride === 0)
      .select(col(idCol), col("blk").as("frame_idx"),
        col(payloadCol).substr(col("blk") * blockSize + 1, lit(blockSize)).as("frame"))
  }
}
