package graft.operators

/** Baseline JPEG (ITU-T T.81) DECODER — pure JVM, no external
  * libraries, written from scratch against the published standard:
  * marker walk, DQT/DHT/SOF0/SOS parse, canonical Huffman entropy
  * decode with byte stuffing and restart markers, DC prediction,
  * zigzag + dequantization, a separable floating-point IDCT, per-
  * component nearest-neighbor chroma upsampling and Y'CbCr→RGB. This
  * makes the last image-codec stub seam a REAL decoder.
  *
  * Scope, honestly stated: baseline/extended sequential DCT only
  * (SOF0/SOF1), 8-bit precision, 1 or 3 components — what cameras and
  * encoders emit by default. Progressive (SOF2), arithmetic coding and
  * hierarchical modes are rejected, never misdecoded. There is no
  * encoder here: JPEG is lossy and decoder outputs are only
  * standard-bounded, not bit-fixed, so the codec is proven by interop
  * specs against the JVM's independent ImageIO implementation (exact
  * dimensions; tight per-pixel tolerance on the shared decode of the
  * same compressed stream) rather than by a DuckDB formula oracle —
  * the same correctness surface the streaming operators use.
  */
object JpegCodec {

  /** Same rationale as [[PpmCodec.MaxDim]]. */
  val MaxDim = 32767

  private val Zigzag = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // idctCos(u)(x) = C(u) · cos((2x+1)uπ/16) / 2 with C(0) = 1/√2
  private val idctCos: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c * math.cos((2 * x + 1) * u * math.Pi / 16.0) / 2.0
  }

  /** Canonical Huffman table (T.81 annex C construction). */
  private final class Huff(counts: Array[Int], symbols: Array[Int]) {
    private val minCode = new Array[Int](17)
    private val maxCode = new Array[Int](17)
    private val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        valPtr(l) = k
        minCode(l) = code
        code += counts(l - 1)
        k += counts(l - 1)
        maxCode(l) = if (counts(l - 1) == 0) -1 else code - 1
        code <<= 1
        l += 1
      }
    }
    /** One symbol off the bit reader; -1 on corruption/marker. */
    def decode(br: BitReader): Int = {
      var code = 0
      var l = 1
      while (l <= 16) {
        val b = br.bit()
        if (b < 0) return -1
        code = (code << 1) | b
        if (maxCode(l) >= 0 && code <= maxCode(l)) {
          val idx = valPtr(l) + code - minCode(l)
          return if (idx < symbols.length) symbols(idx) else -1
        }
        l += 1
      }
      -1
    }
  }

  /** Entropy-segment bit reader: un-stuffs 0xFF00, records (and stops
    * at) any real marker, supports byte realignment at restarts. */
  private final class BitReader(data: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var markerHit: Int = -1
    def bit(): Int = {
      if (markerHit >= 0) return -1
      if (nbits == 0) {
        if (pos >= data.length) return -1
        val b = data(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          if (pos >= data.length) return -1
          val b2 = data(pos) & 0xff
          pos += 1
          if (b2 != 0x00) { markerHit = b2; return -1 }
        }
        acc = b
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    /** Byte-align and expect the next marker to be `want`; consumes it.
      * Handles both orders: marker already tripped over during padding
      * bits, or still ahead in the byte stream. */
    def expectMarker(want: Int): Boolean = {
      nbits = 0
      if (markerHit >= 0) {
        val ok = markerHit == want
        markerHit = -1
        ok
      } else if (pos + 2 <= data.length && (data(pos) & 0xff) == 0xff &&
        (data(pos + 1) & 0xff) == want) {
        pos += 2
        true
      } else false
    }
  }

  /** T.81 F.2.2.1 sign extension of an s-bit magnitude. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private final class Component(val id: Int, val h: Int, val v: Int, val tq: Int) {
    var dcTab = 0; var acTab = 0; var pred = 0
    var w = 0; var hgt = 0
    var plane: Array[Byte] = null
  }

  /** Decode a baseline JPEG payload to RGB; None on malformed input or
    * an unsupported coding process (null-not-fail, the codec-family
    * rule). */
  def decode(payload: Array[Byte]): Option[PpmCodec.Image] = {
    if (payload == null || payload.length < 4 ||
      (payload(0) & 0xff) != 0xff || (payload(1) & 0xff) != 0xd8) return None
    var pos = 2
    val qt = Array.ofDim[Int](4, 64)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var comps: Array[Component] = null
    var w = -1; var h = -1
    var restartInterval = 0
    while (pos + 2 <= payload.length) {
      if ((payload(pos) & 0xff) != 0xff) return None
      val marker = payload(pos + 1) & 0xff
      pos += 2
      if (marker == 0xff) pos -= 1 // fill byte, resync
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) ()
      else if (marker == 0xd9) return None // EOI before a full scan
      else {
        if (pos + 2 > payload.length) return None
        val len = ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff)
        if (len < 2 || pos + len > payload.length) return None
        val end = pos + len
        pos += 2
        marker match {
          case 0xdb => // DQT: one or more tables, 8- or 16-bit entries
            while (pos < end) {
              val pqtq = payload(pos) & 0xff
              pos += 1
              val pq = pqtq >> 4
              val tq = pqtq & 0x0f
              if (pq > 1 || tq > 3 || pos + (if (pq == 0) 64 else 128) > end)
                return None
              var k = 0
              while (k < 64) {
                if (pq == 0) { qt(tq)(k) = payload(pos) & 0xff; pos += 1 }
                else {
                  qt(tq)(k) = ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff)
                  pos += 2
                }
                k += 1
              }
            }
            if (pos != end) return None
          case 0xc4 => // DHT: one or more tables
            while (pos < end) {
              val tcth = payload(pos) & 0xff
              pos += 1
              val tc = tcth >> 4
              val th = tcth & 0x0f
              if (tc > 1 || th > 3 || pos + 16 > end) return None
              val counts = Array.tabulate(16)(i => payload(pos + i) & 0xff)
              pos += 16
              val total = counts.sum
              if (total > 256 || pos + total > end) return None
              val syms = Array.tabulate(total)(i => payload(pos + i) & 0xff)
              pos += total
              if (tc == 0) dcTabs(th) = new Huff(counts, syms)
              else acTabs(th) = new Huff(counts, syms)
            }
            if (pos != end) return None
          case 0xc0 | 0xc1 => // SOF0/1: (extended) sequential baseline
            if (pos + 6 > end || payload(pos) != 8) return None
            h = ((payload(pos + 1) & 0xff) << 8) | (payload(pos + 2) & 0xff)
            w = ((payload(pos + 3) & 0xff) << 8) | (payload(pos + 4) & 0xff)
            val n = payload(pos + 5) & 0xff
            pos += 6
            if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
              (n != 1 && n != 3) || pos + 3 * n > end) return None
            comps = Array.tabulate(n) { i =>
              val hv = payload(pos + 3 * i + 1) & 0xff
              new Component(payload(pos + 3 * i) & 0xff, hv >> 4, hv & 0x0f,
                payload(pos + 3 * i + 2) & 0x0f)
            }
            if (comps.exists(c => c.h < 1 || c.h > 4 || c.v < 1 || c.v > 4 ||
              c.tq > 3)) return None
            // T.81 §A.2: a single-component scan is non-interleaved (one data
            // unit per MCU) regardless of declared sampling factors; the
            // interleaved decode below would misorder blocks, so reject
            // h/v > 1 here rather than silently misdecode.
            if (n == 1 && (comps(0).h != 1 || comps(0).v != 1)) return None
            pos = end
          case 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // progressive/arithmetic/lossless: unsupported
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff)
            pos = end
          case 0xda => // SOS: scan header, then the entropy stream
            if (comps == null || pos >= end) return None
            val ns = payload(pos) & 0xff
            pos += 1
            if (ns != comps.length || pos + 2 * ns + 3 > end) return None
            var i = 0
            while (i < ns) {
              val cid = payload(pos) & 0xff
              val tt = payload(pos + 1) & 0xff
              pos += 2
              comps.find(_.id == cid) match {
                case Some(c) =>
                  c.dcTab = tt >> 4
                  c.acTab = tt & 0x0f
                  if (c.dcTab > 3 || c.acTab > 3) return None
                case None => return None
              }
              i += 1
            }
            pos += 3 // Ss/Se/AhAl are fixed in baseline
            return decodeScan(payload, pos, w, h, comps, qt, dcTabs, acTabs,
              restartInterval)
          case _ => pos = end // APPn, COM, DNL, ...
        }
        pos = end
      }
    }
    None
  }

  private def decodeScan(payload: Array[Byte], start: Int, w: Int, h: Int,
      comps: Array[Component], qt: Array[Array[Int]],
      dcTabs: Array[Huff], acTabs: Array[Huff],
      restartInterval: Int): Option[PpmCodec.Image] = {
    val maxH = comps.map(_.h).max
    val maxV = comps.map(_.v).max
    val mcusX = (w + 8 * maxH - 1) / (8 * maxH)
    val mcusY = (h + 8 * maxV - 1) / (8 * maxV)
    comps.foreach { c =>
      c.w = mcusX * 8 * c.h
      c.hgt = mcusY * 8 * c.v
      c.plane = new Array[Byte](c.w * c.hgt)
      c.pred = 0
    }
    val br = new BitReader(payload, start)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    var mcu = 0
    val totalMcus = mcusX * mcusY
    var rst = 0
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        if (!br.expectMarker(0xd0 + rst)) return None
        rst = (rst + 1) & 7
        comps.foreach(_.pred = 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dcTab = dcTabs(c.dcTab)
        val acTab = acTabs(c.acTab)
        if (dcTab == null || acTab == null) return None
        val q = qt(c.tq)
        var by = 0
        while (by < c.v) {
          var bx = 0
          while (bx < c.h) {
            java.util.Arrays.fill(coef, 0)
            val t = dcTab.decode(br)
            if (t < 0 || t > 15) return None
            val diffBits = if (t == 0) 0 else br.bits(t)
            if (diffBits < 0) return None
            c.pred += extend(diffBits, t)
            coef(0) = c.pred * q(0)
            var k = 1
            var eob = false
            while (!eob && k < 64) {
              val rs = acTab.decode(br)
              if (rs < 0) return None
              val r = rs >> 4
              val s = rs & 0x0f
              if (s == 0) {
                if (r == 15) k += 16 // ZRL: sixteen zeros
                else eob = true
              } else {
                k += r
                if (k > 63) return None
                val vb = br.bits(s)
                if (vb < 0) return None
                coef(Zigzag(k)) = extend(vb, s) * q(k)
                k += 1
              }
            }
            idct8x8(coef, block)
            val ox = (mx * c.h + bx) * 8
            val oy = (my * c.v + by) * 8
            var yy = 0
            while (yy < 8) {
              var xx = 0
              while (xx < 8) {
                val v = math.round(block(yy * 8 + xx) + 128.0).toInt
                c.plane((oy + yy) * c.w + ox + xx) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
                xx += 1
              }
              yy += 1
            }
            bx += 1
          }
          by += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // nearest-neighbor upsample + color convert into interleaved RGB
    val rgb = new Array[Byte](w * h * 3)
    if (comps.length == 1) {
      val c = comps(0)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = c.plane(y * c.w + x)
          val p = (y * w + x) * 3
          rgb(p) = g; rgb(p + 1) = g; rgb(p + 2) = g
          x += 1
        }
        y += 1
      }
    } else {
      val yc = comps(0); val cb = comps(1); val cr = comps(2)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val lum = yc.plane((y * yc.v / maxV) * yc.w + x * yc.h / maxH) & 0xff
          val db = (cb.plane((y * cb.v / maxV) * cb.w + x * cb.h / maxH) & 0xff) - 128
          val dr = (cr.plane((y * cr.v / maxV) * cr.w + x * cr.h / maxH) & 0xff) - 128
          val r = math.round(lum + 1.402 * dr).toInt
          val g = math.round(lum - 0.344136 * db - 0.714136 * dr).toInt
          val b = math.round(lum + 1.772 * db).toInt
          val p = (y * w + x) * 3
          rgb(p) = (if (r < 0) 0 else if (r > 255) 255 else r).toByte
          rgb(p + 1) = (if (g < 0) 0 else if (g > 255) 255 else g).toByte
          rgb(p + 2) = (if (b < 0) 0 else if (b > 255) 255 else b).toByte
          x += 1
        }
        y += 1
      }
    }
    Some(PpmCodec.Image(w, h, rgb))
  }

  /** Separable 2-D inverse DCT: rows then columns through the
    * precomputed cosine table — the straightforward O(8³) form (this
    * is a correctness codec; throughput lives in the query plans). */
  private def idct8x8(coef: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += idctCos(u)(x) * coef(y * 8 + u); u += 1 }
        tmp(y * 8 + x) = s
        x += 1
      }
      y += 1
    }
    var x = 0
    while (x < 8) {
      var yy = 0
      while (yy < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) { s += idctCos(v)(yy) * tmp(v * 8 + x); v += 1 }
        out(yy * 8 + x) = s
        yy += 1
      }
      x += 1
    }
  }
}
