package graft.operators

/** JPEG (ITU-T T.81) DECODER — pure JVM, no external libraries,
  * written from scratch against the published standard: marker walk,
  * DQT/DHT/SOF/SOS parse, canonical Huffman entropy decode with byte
  * stuffing and restart markers, DC prediction, zigzag +
  * dequantization, a separable floating-point IDCT, per-component
  * nearest-neighbor chroma upsampling and Y'CbCr→RGB. This makes the
  * last image-codec stub seam a REAL decoder.
  *
  * Scope, honestly stated: baseline/extended sequential DCT
  * (SOF0/SOF1) AND progressive DCT (SOF2 — spectral selection and
  * successive approximation per T.81 annex G, the shape most real
  * crawl JPEGs use), 8-bit precision, 1 or 3 components. Arithmetic
  * coding, lossless and hierarchical modes are rejected, never
  * misdecoded. There is no encoder here: JPEG is lossy and decoder
  * outputs are only standard-bounded, not bit-fixed, so the codec is
  * proven by interop specs against the JVM's independent ImageIO
  * implementation (exact dimensions; tight per-pixel tolerance on the
  * shared decode of the same compressed stream) rather than by a
  * DuckDB formula oracle — the same correctness surface the streaming
  * operators use.
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
    // progressive state: the full-image coefficient buffer (natural
    // order within each 64-coef block, 12-bit values fit a Short) and
    // the quant table snapshot taken at the first scan
    var blocksW = 0; var blocksH = 0
    var coefs: Array[Short] = null
    var qSnap: Array[Int] = null
  }

  /** Decode a sequential or progressive JPEG payload to RGB; None on
    * malformed input or an unsupported coding process (null-not-fail,
    * the codec-family rule). */
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
    var progressive = false
    var sawScan = false
    var maxH = 0; var maxV = 0; var mcusX = 0; var mcusY = 0
    var entropyNext = -1 // progressive: marker walk resumes here after a scan
    while (pos + 2 <= payload.length) {
      if ((payload(pos) & 0xff) != 0xff) return None
      val marker = payload(pos + 1) & 0xff
      pos += 2
      if (marker == 0xff) pos -= 1 // fill byte, resync
      else if (marker == 0x01 || (marker >= 0xd0 && marker <= 0xd7)) ()
      else if (marker == 0xd9) {
        // EOI: a progressive image renders from its accumulated
        // coefficients here; for sequential it means no full scan ran
        return if (progressive && sawScan)
          Some(renderProgressive(w, h, comps, maxH, maxV))
        else None
      }
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
          case 0xc0 | 0xc1 | 0xc2 => // SOF0/1 sequential, SOF2 progressive
            if (comps != null) return None // one frame per stream
            progressive = marker == 0xc2
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
            // sequential interleaved decode below would misorder blocks, so
            // reject h/v > 1 there rather than silently misdecode (the
            // progressive path decodes single-component scans with their
            // own non-interleaved geometry, so it keeps them).
            if (!progressive && n == 1 && (comps(0).h != 1 || comps(0).v != 1))
              return None
            maxH = comps.map(_.h).max
            maxV = comps.map(_.v).max
            mcusX = (w + 8 * maxH - 1) / (8 * maxH)
            mcusY = (h + 8 * maxV - 1) / (8 * maxV)
            pos = end
          case 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
               0xcd | 0xce | 0xcf =>
            return None // arithmetic/lossless/hierarchical: unsupported
          case 0xdd => // DRI
            if (len != 4) return None
            restartInterval = ((payload(pos) & 0xff) << 8) | (payload(pos + 1) & 0xff)
            pos = end
          case 0xda => // SOS: scan header, then the entropy stream
            if (comps == null || pos >= end) return None
            val ns = payload(pos) & 0xff
            pos += 1
            // a sequential scan must cover every component; progressive
            // scans are a full-component DC band or one-component bands
            if (ns < 1 || ns > comps.length || pos + 2 * ns + 3 > end)
              return None
            if (!progressive && ns != comps.length) return None
            if (progressive && ns != 1 && ns != comps.length) return None
            val scanComps = new Array[Component](ns)
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
                  scanComps(i) = c
                case None => return None
              }
              i += 1
            }
            if (!progressive) {
              pos += 3 // Ss/Se/AhAl are fixed in baseline
              return decodeScan(payload, pos, w, h, comps, qt, dcTabs, acTabs,
                restartInterval)
            }
            val ss = payload(pos) & 0xff
            val se = payload(pos + 1) & 0xff
            val ahal = payload(pos + 2) & 0xff
            val ah = ahal >> 4
            val al = ahal & 0x0f
            // T.81 B.2.3 progressive scan-header constraints: the DC
            // band is exactly [0,0]; AC bands are single-component and
            // never include coefficient 0; a refinement pass moves the
            // approximation down one bit
            if (ss == 0 && se != 0) return None
            if (ss > 0 && (ns != 1 || se < ss || se > 63)) return None
            if (al > 13 || (ah != 0 && ah != al + 1)) return None
            if (!sawScan) comps.foreach { c =>
              c.blocksW = mcusX * c.h
              c.blocksH = mcusY * c.v
              c.coefs = new Array[Short](c.blocksW * c.blocksH * 64)
              c.qSnap = qt(c.tq).clone()
            }
            val nxt = decodeProgScan(payload, end, scanComps, ss, se, ah, al,
              dcTabs, acTabs, restartInterval, mcusX, mcusY, w, h, maxH, maxV)
            if (nxt < 0) return None
            sawScan = true
            entropyNext = nxt
          case _ => pos = end // APPn, COM, DNL, ...
        }
        pos = end
        if (entropyNext >= 0) { pos = entropyNext; entropyNext = -1 }
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
    Some(toRgb(w, h, comps, maxH, maxV))
  }

  /** Nearest-neighbor upsample + color convert the decoded component
    * planes into interleaved RGB (shared by the sequential and
    * progressive paths). */
  private def toRgb(w: Int, h: Int, comps: Array[Component],
      maxH: Int, maxV: Int): PpmCodec.Image = {
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
    PpmCodec.Image(w, h, rgb)
  }

  /** Decode one progressive scan (T.81 annex G): the spectral band
    * [ss, se] of every block covered by `scanComps`, at successive-
    * approximation bit position `al` (`ah` = the previous pass's bit,
    * 0 on the band's first pass). Coefficients accumulate UNquantized-
    * but-unscaled in each component's full-image buffer; rendering
    * happens once, at EOI. Returns the payload position of the next
    * marker, or -1 on malformed data.
    *
    * The refinement control flow (EOB runs that still carry correction
    * bits, zero-history runs interleaved with nonzero-coefficient
    * corrections) follows the standard's G.1.2.2/G.1.2.3 decode
    * procedures exactly. */
  private def decodeProgScan(payload: Array[Byte], start: Int,
      scanComps: Array[Component], ss: Int, se: Int, ah: Int, al: Int,
      dcTabs: Array[Huff], acTabs: Array[Huff], restartInterval: Int,
      mcusX: Int, mcusY: Int, w: Int, h: Int, maxH: Int, maxV: Int): Int = {
    val br = new BitReader(payload, start)
    var eobrun = 0
    val p1 = 1 << al
    val m1 = -1 << al
    scanComps.foreach(_.pred = 0)

    // append this pass's correction bit to an already-nonzero
    // coefficient (G.1.2.3); false on exhausted input
    def refine(coefs: Array[Short], idx: Int): Boolean = {
      val bit = br.bit()
      if (bit < 0) return false
      if (bit == 1 && (coefs(idx) & p1) == 0)
        coefs(idx) = (coefs(idx) + (if (coefs(idx) >= 0) p1 else m1)).toShort
      true
    }

    def decodeBlock(c: Component, bx: Int, by: Int): Boolean = {
      val off = (by * c.blocksW + bx) * 64
      val coefs = c.coefs
      if (ss == 0) {
        if (ah == 0) { // DC first pass: Huffman diff, stored shifted
          val dcTab = dcTabs(c.dcTab)
          if (dcTab == null) return false
          val t = dcTab.decode(br)
          if (t < 0 || t > 15) return false
          if (t > 0) {
            val vb = br.bits(t)
            if (vb < 0) return false
            c.pred += extend(vb, t)
          }
          coefs(off) = (c.pred << al).toShort
          true
        } else { // DC refinement: one raw bit per block
          val bit = br.bit()
          if (bit < 0) return false
          if (bit == 1) coefs(off) = (coefs(off) | p1).toShort
          true
        }
      } else if (ah == 0) { // AC first pass with EOB runs (G.1.2.2)
        val acTab = acTabs(c.acTab)
        if (acTab == null) return false
        if (eobrun > 0) { eobrun -= 1; true }
        else {
          var k = ss
          var done = false
          while (!done && k <= se) {
            val rs = acTab.decode(br)
            if (rs < 0) return false
            val r = rs >> 4
            val s = rs & 0x0f
            if (s == 0) {
              if (r == 15) k += 16 // ZRL
              else {
                eobrun = (1 << r) - 1
                if (r > 0) {
                  val eb = br.bits(r)
                  if (eb < 0) return false
                  eobrun += eb
                }
                done = true
              }
            } else {
              k += r
              if (k > se) return false
              val vb = br.bits(s)
              if (vb < 0) return false
              coefs(off + Zigzag(k)) = (extend(vb, s) << al).toShort
              k += 1
            }
          }
          true
        }
      } else { // AC refinement (G.1.2.3)
        val acTab = acTabs(c.acTab)
        if (acTab == null) return false
        var k = ss
        if (eobrun == 0) {
          var done = false
          while (!done && k <= se) {
            val rs = acTab.decode(br)
            if (rs < 0) return false
            var r = rs >> 4
            val s = rs & 0x0f
            var newval = 0
            if (s == 0) {
              if (r != 15) { // EOB run: this block included
                eobrun = 1 << r
                if (r > 0) {
                  val eb = br.bits(r)
                  if (eb < 0) return false
                  eobrun += eb
                }
                done = true
              }
              // r == 15 (ZRL): run over 16 zero-history positions below
            } else {
              if (s != 1) return false // refinement magnitudes are 1 bit
              val bit = br.bit()
              if (bit < 0) return false
              newval = if (bit == 1) p1 else m1
            }
            if (!done) {
              // advance over r zero-HISTORY positions, appending
              // correction bits to nonzero coefficients passed over
              var placed = false
              while (!placed && k <= se) {
                val z = off + Zigzag(k)
                if (coefs(z) != 0) {
                  if (!refine(coefs, z)) return false
                } else if (r == 0) {
                  if (newval != 0) coefs(z) = newval.toShort
                  placed = true
                } else r -= 1
                k += 1
              }
              if (!placed && newval != 0) return false // run past the band
            }
          }
        }
        if (eobrun > 0) {
          // EOB blocks still carry correction bits for their nonzero
          // coefficients in the band
          while (k <= se) {
            val z = off + Zigzag(k)
            if (coefs(z) != 0 && !refine(coefs, z)) return false
            k += 1
          }
          eobrun -= 1
        }
        true
      }
    }

    var rst = 0
    def restartOk(idx: Int): Boolean = {
      if (restartInterval > 0 && idx > 0 && idx % restartInterval == 0) {
        if (!br.expectMarker(0xd0 + rst)) return false
        rst = (rst + 1) & 7
        scanComps.foreach(_.pred = 0)
        eobrun = 0
      }
      true
    }

    if (scanComps.length > 1) {
      // interleaved (DC band only, enforced by the caller): the frame
      // MCU walk, every component's h×v blocks per MCU
      var mcu = 0
      val total = mcusX * mcusY
      while (mcu < total) {
        if (!restartOk(mcu)) return -1
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var ci = 0
        while (ci < scanComps.length) {
          val c = scanComps(ci)
          var by = 0
          while (by < c.v) {
            var bx = 0
            while (bx < c.h) {
              if (!decodeBlock(c, mx * c.h + bx, my * c.v + by)) return -1
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
    } else {
      // single-component scan: non-interleaved raster over the
      // component's own ceiling dimensions (T.81 §A.2)
      val c = scanComps(0)
      val bw = (((w * c.h + maxH - 1) / maxH) + 7) / 8
      val bh = (((h * c.v + maxV - 1) / maxV) + 7) / 8
      var i = 0
      val total = bw * bh
      while (i < total) {
        if (!restartOk(i)) return -1
        if (!decodeBlock(c, i % bw, i / bw)) return -1
        i += 1
      }
    }
    // next-marker position: either the reader tripped over it while
    // draining pad bits (both marker bytes consumed — rewind), or it
    // is still ahead of the byte cursor
    if (br.markerHit >= 0) br.pos - 2
    else {
      var p = br.pos
      while (p + 1 < payload.length &&
        !((payload(p) & 0xff) == 0xff && (payload(p + 1) & 0xff) != 0x00 &&
          (payload(p + 1) & 0xff) != 0xff)) p += 1
      p
    }
  }

  /** Dequantize + IDCT every accumulated block and render (EOI step of
    * the progressive path). */
  private def renderProgressive(w: Int, h: Int, comps: Array[Component],
      maxH: Int, maxV: Int): PpmCodec.Image = {
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    comps.foreach { c =>
      c.w = c.blocksW * 8
      c.hgt = c.blocksH * 8
      c.plane = new Array[Byte](c.w * c.hgt)
      val q = c.qSnap
      val nBlocks = c.blocksW * c.blocksH
      var b = 0
      while (b < nBlocks) {
        val off = b * 64
        var k = 0
        while (k < 64) { // q is in zigzag (DQT) order, coefs in natural
          coef(Zigzag(k)) = c.coefs(off + Zigzag(k)) * q(k)
          k += 1
        }
        idct8x8(coef, block)
        val ox = (b % c.blocksW) * 8
        val oy = (b / c.blocksW) * 8
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
        b += 1
      }
    }
    toRgb(w, h, comps, maxH, maxV)
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
