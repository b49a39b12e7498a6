package graft

import org.scalacheck.Prop.forAll
import org.scalacheck.{Gen, Properties}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.{IntersectCount, MvOps, SimHash64, WordShingles}

/** ScalaCheck properties over the pure compute kernels of the native
  * expressions (no Spark session — these run per-row on executors, so
  * the kernels themselves must be total and deterministic).
  */
object NativePropertySpec extends Properties("NativeKernels") {

  private val token = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val tokens = Gen.listOf(token)

  private def arr(ts: Seq[String]): GenericArrayData =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  property("shingle count = max(n-k+1, 1)") = forAll(tokens, Gen.choose(1, 5)) {
    (ts, k) =>
      WordShingles.compute(arr(ts), k).numElements() ==
        math.max(ts.length - k + 1, 1)
  }

  property("every shingle of k tokens joins k consecutive tokens") =
    forAll(tokens, Gen.choose(1, 4)) { (ts, k) =>
      val out = WordShingles.compute(arr(ts), k)
      (0 until out.numElements()).forall { i =>
        val expect =
          if (ts.length < k) ts.mkString(" ")
          else ts.slice(i, i + k).mkString(" ")
        out.getUTF8String(i).toString == expect
      }
    }

  property("simhash is deterministic") = forAll(tokens) { ts =>
    SimHash64.compute(arr(ts)) == SimHash64.compute(arr(ts))
  }

  property("simhash is order-insensitive (bag semantics)") = forAll(tokens) { ts =>
    SimHash64.compute(arr(ts)) == SimHash64.compute(arr(ts.reverse))
  }

  property("duplicating every token preserves simhash sign votes") =
    forAll(Gen.nonEmptyListOf(token)) { ts =>
      // doubling all vote weights cannot flip any bit's sign
      SimHash64.compute(arr(ts)) == SimHash64.compute(arr(ts ++ ts))
    }

  // ---- PQ kernels (plans/PqExprs) vs a naive reference ----
  private val M = 2; private val Ks = 4; private val SubDim = 3
  private val dbl = Gen.choose(-8.0, 8.0)
  private val vec = Gen.listOfN(M * SubDim, dbl).map(_.toArray)
  private val codebook = Gen.listOfN(M * Ks * SubDim, dbl).map(_.toArray)
  private def darr(v: Array[Double]): GenericArrayData =
    new GenericArrayData(v.map(java.lang.Double.valueOf).toArray[Any])

  private def refDist(v: Array[Double], cb: Array[Double], s: Int, j: Int): Double =
    (0 until SubDim).map { d =>
      val diff = v(s * SubDim + d) - cb((s * Ks + j) * SubDim + d)
      diff * diff
    }.sum

  property("pq encode picks the argmin codeword (first on ties) per subspace") =
    forAll(vec, codebook) { (v, cb) =>
      val codes = graft.plans.PqCompute.encode(darr(v), false, cb, M, Ks, SubDim)
      (0 until M).forall { s =>
        val dists = (0 until Ks).map(j => refDist(v, cb, s, j))
        codes.getInt(s) == dists.indexOf(dists.min)
      }
    }

  property("adc of a vector's own codes equals the sum of its best subdistances") =
    forAll(vec, codebook) { (v, cb) =>
      val codes = graft.plans.PqCompute.encode(darr(v), false, cb, M, Ks, SubDim)
      val lut = graft.plans.PqCompute.lut(darr(v), false, cb, M, Ks, SubDim)
      val adc = graft.plans.PqCompute.adc(lut, codes, Ks)
      val best = (0 until M).map(s => (0 until Ks).map(j => refDist(v, cb, s, j)).min).sum
      adc == best
    }

  property("lut cell (s,j) is the exact subvector distance") =
    forAll(vec, codebook) { (v, cb) =>
      val lut = graft.plans.PqCompute.lut(darr(v), false, cb, M, Ks, SubDim)
      (0 until M).forall(s => (0 until Ks).forall { j =>
        lut.getDouble(s * Ks + j) == refDist(v, cb, s, j)
      })
    }

  // ---- pure-JVM media codecs: total on arbitrary bytes, lossless on
  // well-formed payloads (they run per-row on executors — a crash is a
  // task failure, so totality is a correctness property here)

  private val dims = Gen.choose(1, 6)
  private val rawBytes = Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))

  property("PPM roundtrip is lossless for any pixel bytes") =
    forAll(dims, dims, rawBytes) { (w, h, seed) =>
      val rgb = Array.tabulate[Byte](w * h * 3)(i =>
        if (seed.isEmpty) 0 else seed(i % seed.length))
      val img = graft.operators.PpmCodec.decode(
        graft.operators.PpmCodec.encode(w, h, rgb))
      img.exists(d => d.width == w && d.height == h && d.rgb.sameElements(rgb))
    }

  property("PPM decode never throws on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      graft.operators.PpmCodec.decode(bs.toArray)
      true
    }

  private val hashDims = for {
    w <- Gen.choose(9, 20); h <- Gen.choose(8, 14)
  } yield (w, h)

  property("dhash is brightness-invariant while no channel saturates") =
    forAll(hashDims, rawBytes, Gen.choose(1, 55)) { case ((w, h), seed, delta) =>
      // channels capped at 200 so +delta (<=55) can never wrap a byte
      def px(i: Int): Int =
        if (seed.isEmpty) 7 else (seed(i % seed.length) & 0xff) % 200
      def img(d: Int) = graft.operators.PpmCodec.Image(w, h,
        Array.tabulate[Byte](w * h * 3)(i => (px(i) + d).toByte))
      graft.operators.Multimodal.dhash64(img(delta)) ==
        graft.operators.Multimodal.dhash64(img(0))
    }

  property("dhash bit b compares the gray neighbors at (b/8, b%8) exactly") =
    forAll(hashDims, rawBytes) { case ((w, h), seed) =>
      def px(i: Int): Int = if (seed.isEmpty) 7 else seed(i % seed.length) & 0xff
      val img = graft.operators.PpmCodec.Image(w, h,
        Array.tabulate[Byte](w * h * 3)(i => px(i).toByte))
      def gray(r: Int, c: Int): Int =
        (px((r * w + c) * 3) + px((r * w + c) * 3 + 1) + px((r * w + c) * 3 + 2)) / 3
      val expected = (0 until 64).foldLeft(0L) { (acc, b) =>
        if (gray(b / 8, b % 8) < gray(b / 8, b % 8 + 1)) acc | (1L << b) else acc
      }
      graft.operators.Multimodal.dhash64(img).contains(expected)
    }

  property("dhash is None exactly when the image is under the 9x8 window") =
    forAll(Gen.choose(1, 12), Gen.choose(1, 12)) { (w, h) =>
      val img = graft.operators.PpmCodec.Image(w, h,
        Array.fill[Byte](w * h * 3)(1))
      graft.operators.Multimodal.dhash64(img).isDefined == (w >= 9 && h >= 8)
    }

  property("ulaw WAV container expands every byte exactly") =
    forAll(rawBytes) { bs =>
      val wav = graft.operators.WavCodec.encodeUlaw(8000, bs.toArray)
      graft.operators.WavCodec.decode(wav).exists { a =>
        a.sampleRate == 8000 &&
          a.samples.sameElements(bs.map(graft.operators.WavCodec.ulawDecode8))
      }
    }

  property("ulaw codewords are a fixed point and quantization is bounded") = {
    // exhaustive over all 65536 samples: re-encoding a decoded value
    // returns the same codeword — except G.711's NEGATIVE ZERO (0x7F,
    // hit by s in -3..-1), which decodes to 0 and legitimately
    // re-encodes as positive zero 0xFF (the two codes differ only in
    // the sign bit) — and the error stays within the segment's
    // half-step (~|s|/32 + slack)
    (-32768 to 32767).forall { s =>
      val c = graft.operators.WavCodec.ulawEncode16(s.toShort)
      val d = graft.operators.WavCodec.ulawDecode8(c).toInt
      val c2 = graft.operators.WavCodec.ulawEncode16(d.toShort)
      val clamp = math.max(-32635, math.min(32635, s))
      (c2 == c || (d == 0 && ((c2 ^ c) & 0xff) == 0x80)) &&
        math.abs(d - clamp) <= ((math.abs(clamp) + 132) >> 5) + 8
    }
  }

  property("alaw WAV container expands every byte exactly") =
    forAll(rawBytes) { bs =>
      val wav = graft.operators.WavCodec.encodeAlaw(8000, bs.toArray)
      graft.operators.WavCodec.decode(wav).exists { a =>
        a.sampleRate == 8000 &&
          a.samples.sameElements(bs.map(graft.operators.WavCodec.alawDecode8))
      }
    }

  property("alaw codewords are a fixed point and quantization is bounded") = {
    // exhaustive over all 65536 samples: every one of the 256 A-law
    // codewords re-encodes to ITSELF after a decode (A-law is mid-rise
    // — no zero codeword, so no µ-law-style ±0 exception), and the
    // quantization error stays within the segment's half-step
    (-32768 to 32767).forall { s =>
      val c = graft.operators.WavCodec.alawEncode16(s.toShort)
      val d = graft.operators.WavCodec.alawDecode8(c).toInt
      val c2 = graft.operators.WavCodec.alawEncode16(d.toShort)
      c2 == c && math.abs(d - s) <= (math.abs(s) >> 5) + 16
    }
  }

  property("WARC roundtrip survives bodies containing separators and version lines") =
    forAll(Gen.listOfN(3, Gen.alphaNumStr.map(_.take(20)))) { frags =>
      // adversarial bodies: embedded record separators, header-shaped
      // lines, even a full WARC version line — Content-Length framing
      // must carry the parse straight through all of them
      val bodies = frags.zipWithIndex.map { case (f, i) =>
        s"$f\r\n\r\nWARC/1.0\r\nContent-Length: 7\r\n\r\n$f$i"
      }
      val recs = bodies.zipWithIndex.map { case (b, i) => (s"http://u/$i", b) }
      graft.operators.WarcCodec.parse(graft.operators.WarcCodec.encode(recs))
        .exists { got =>
          got.length == recs.length && got.zip(recs).forall {
            case (g, (u, b)) =>
              g.uri == u && g.body == b && g.contentLength == b.length
          }
        }
    }

  property("WARC parse is total on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      // never throws; arbitrary noise is Not A Container (None), and
      // a valid prefix with trailing garbage is also rejected
      graft.operators.WarcCodec.parse(bs.toArray) match {
        case Some(_) | None => true
      }
    }

  property("stereo WAV downmixes every frame to (l + r) >> 1 exactly") =
    forAll(rawBytes) { bs =>
      // arbitrary signed shorts on both channels (odd sums included —
      // the >> 1 floor is the pinned convention)
      val l = bs.map(b => ((b * 257) ^ 0x1234).toShort).toArray
      val r = bs.map(b => ((b * 131) ^ 0x7e01).toShort).toArray
      val wav = graft.operators.WavCodec.encodeStereo(22050, l, r)
      graft.operators.WavCodec.decode(wav).exists { a =>
        a.sampleRate == 22050 && a.samples.length == l.length &&
          a.samples.indices.forall(i =>
            a.samples(i) == ((l(i) + r(i)) >> 1).toShort)
      }
    }

  property("alaw and ulaw sign conventions are inverse") =
    // the SAME linear value encodes with OPPOSITE top bits in the two
    // laws (after the A-law XOR unmasking): G.711's published tables
    forAll(Gen.choose(-32768, 32767)) { s =>
      val a = (graft.operators.WavCodec.alawEncode16(s.toShort) ^ 0x55) & 0x80
      val u = (~graft.operators.WavCodec.ulawEncode16(s.toShort)) & 0x80
      (s >= 0) == (a != 0) && (s >= 0) == (u == 0)
    }

  property("PNG roundtrip is lossless through all five row filters") =
    forAll(Gen.choose(1, 30), Gen.choose(5, 20), rawBytes) { (w, h, seed) =>
      // h >= 5 so the encoder's cycling filter hits None/Sub/Up/
      // Average/Paeth in every run
      def px(i: Int): Byte = if (seed.isEmpty) 7 else seed(i % seed.length)
      val rgb = Array.tabulate[Byte](w * h * 3)(px)
      val png = graft.operators.PngCodec.encode(w, h, rgb)
      graft.operators.PngCodec.decode(png).exists { img =>
        img.width == w && img.height == h && img.rgb.sameElements(rgb)
      }
    }

  property("JPEG decode never throws on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      graft.operators.JpegCodec.decode(bs.toArray)
      true
    }

  property("JPEG decode never throws on corrupted real streams") =
    forAll(Gen.choose(0, 10000), Gen.choose(0, 255)) { (at, v) =>
      // corrupt one byte of a genuine ImageIO JPEG at an arbitrary
      // offset: decode must return (Some or None), never throw
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) { img.setRGB(x, y, (x * 8) << 16 | (y * 8) << 8); x += 1 }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      val bytes = bos.toByteArray
      bytes(at % bytes.length) = v.toByte
      graft.operators.JpegCodec.decode(bytes)
      true
    }

  property("JPEG decode never throws on corrupted progressive streams") =
    forAll(Gen.choose(0, 10000), Gen.choose(0, 255)) { (at, v) =>
      // same contract through the annex-G multi-scan path: EOB-run
      // and refinement state machines must fail closed on bit rot
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < 32) {
        var x = 0
        while (x < 32) { img.setRGB(x, y, (x * 8) << 16 | (y * 8) << 8); x += 1 }
        y += 1
      }
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose()
      val bytes = bos.toByteArray
      bytes(at % bytes.length) = v.toByte
      graft.operators.JpegCodec.decode(bytes)
      true
    }

  property("PNG decode never throws on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      graft.operators.PngCodec.decode(bs.toArray)
      true
    }

  property("PNG decode rejects a corrupted byte (CRC catches bit rot)") = {
    val rgb = Array.tabulate[Byte](10 * 10 * 3)(i => (i * 7).toByte)
    val png = graft.operators.PngCodec.encode(10, 10, rgb)
    // flip one bit inside the IDAT payload region
    val corrupt = png.clone()
    corrupt(png.length / 2) = (corrupt(png.length / 2) ^ 0x10).toByte
    graft.operators.PngCodec.decode(corrupt).isEmpty
  }

  private val gifPalette = Array.tabulate(256)(c =>
    (((c * 3 + 5) % 256) << 16) | (((c * 7 + 1) % 256) << 8) | ((c * 11 + 9) % 256))

  property("GIF LZW roundtrip is lossless for arbitrary small images") =
    forAll(Gen.choose(1, 40), Gen.choose(1, 40), rawBytes) { (w, h, seed) =>
      def px(i: Int): Byte = if (seed.isEmpty) 7 else seed(i % seed.length)
      val idx = Array.tabulate[Byte](w * h)(px)
      val gif = graft.operators.GifCodec.encode(w, h, idx, gifPalette)
      graft.operators.GifCodec.decode(gif).exists { img =>
        img.width == w && img.height == h &&
          (0 until w * h).forall { i =>
            val c = gifPalette(idx(i) & 0xff)
            (img.rgb(i * 3) & 0xff) == ((c >> 16) & 0xff) &&
              (img.rgb(i * 3 + 1) & 0xff) == ((c >> 8) & 0xff) &&
              (img.rgb(i * 3 + 2) & 0xff) == (c & 0xff)
          }
      }
    }

  property("GIF LZW roundtrip survives width growth AND the 4096 table clear") = {
    // a non-repeating pseudo-random 300x300 forces the code table
    // through every width (9..12) and past 4096 entries (clear+reset);
    // a constant image checks the maximal-run path. Identity palette
    // (0xRRGGBB with R=G=B=index) lets us compare indices directly.
    val idPal = Array.tabulate(256)(c => (c << 16) | (c << 8) | c)
    def roundtrip(idx: Array[Byte], w: Int, h: Int): Boolean = {
      val gif = graft.operators.GifCodec.encode(w, h, idx, idPal)
      graft.operators.GifCodec.decode(gif).exists { img =>
        (0 until w * h).forall(i => (img.rgb(i * 3) & 0xff) == (idx(i) & 0xff))
      }
    }
    val noisy = Array.tabulate[Byte](300 * 300)(i => ((i * i + i / 7) % 251).toByte)
    val flat = Array.fill[Byte](300 * 300)(42)
    roundtrip(noisy, 300, 300) && roundtrip(flat, 300, 300)
  }

  property("GIF LZW actually compresses runs") = {
    val flat = Array.fill[Byte](100 * 100)(9)
    val gif = graft.operators.GifCodec.encode(100, 100, flat, gifPalette)
    // 10000 indices + 768B palette + headers; LZW on a constant image
    // must land far under the raw index count
    gif.length < 100 * 100 / 2
  }

  property("GIF decode never throws on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      graft.operators.GifCodec.decode(bs.toArray)
      true
    }

  property("luma dhash is brightness-invariant while no sample saturates") =
    forAll(hashDims, rawBytes, Gen.choose(1, 55)) { case ((w, h), seed, delta) =>
      def px(i: Int): Int =
        if (seed.isEmpty) 7 else (seed(i % seed.length) & 0xff) % 200
      def plane(d: Int) = Array.tabulate[Byte](w * h)(i => (px(i) + d).toByte)
      graft.operators.Multimodal.dhash64Luma(w, h, plane(delta)) ==
        graft.operators.Multimodal.dhash64Luma(w, h, plane(0))
    }

  property("luma dhash equals rgb dhash on a gray image of the same plane") =
    forAll(hashDims, rawBytes) { case ((w, h), seed) =>
      // a single-channel plane and its 3-channel gray replication must
      // hash identically — the video path IS the m5 kernel on luma
      def px(i: Int): Int = if (seed.isEmpty) 7 else seed(i % seed.length) & 0xff
      val plane = Array.tabulate[Byte](w * h)(i => px(i).toByte)
      val rgb = graft.operators.PpmCodec.Image(w, h,
        Array.tabulate[Byte](w * h * 3)(i => px(i / 3).toByte))
      graft.operators.Multimodal.dhash64Luma(w, h, plane) ==
        graft.operators.Multimodal.dhash64(rgb)
    }

  property("WAV roundtrip is lossless for any samples") =
    forAll(Gen.choose(1, 48000), Gen.listOf(Gen.choose(Short.MinValue, Short.MaxValue))) {
      (rate, samples) =>
        val a = graft.operators.WavCodec.decode(
          graft.operators.WavCodec.encode(rate, samples.toArray))
        a.exists(d => d.sampleRate == rate && d.samples.sameElements(samples))
    }

  property("WAV decode never throws on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      graft.operators.WavCodec.decode(bs.toArray)
      true
    }

  private val colorspace = Gen.oneOf("mono", "420", "420jpeg", "422", "444")

  property("Y4M roundtrip is lossless for any frames/colorspace") =
    forAll(dims, dims, Gen.choose(0, 4), colorspace, rawBytes) {
      (w, h, nf, cs, seed) =>
        val fs = graft.operators.Y4mCodec.frameSize(w, h, cs).toInt
        val frames = Array.tabulate(nf)(f => Array.tabulate[Byte](fs)(i =>
          if (seed.isEmpty) f.toByte else seed((f + i) % seed.length)))
        val v = graft.operators.Y4mCodec.decode(
          graft.operators.Y4mCodec.encode(w, h, 25, 1, cs, frames))
        v.exists(d => d.width == w && d.height == h &&
          d.frames.length == nf &&
          d.frames.zip(frames).forall { case (a, b) => a.sameElements(b) })
    }

  property("Y4M decode never throws on arbitrary bytes") =
    forAll(rawBytes) { bs =>
      graft.operators.Y4mCodec.decode(bs.toArray)
      true
    }

  property("Y4M decode never throws on arbitrary header text") =
    forAll(Gen.asciiPrintableStr) { s =>
      graft.operators.Y4mCodec.decode(
        ("YUV4MPEG2 " + s).getBytes("US-ASCII"))
      true
    }

  // ---- MvOps one-pass split kernels vs the composed regex chains ----
  // (plans/MvExprs.scala replaces per-row Pattern.compile; these pin
  // exact equivalence with the java.util.regex formulations)

  private def gad2list(a: org.apache.spark.sql.catalyst.util.ArrayData): List[String] =
    (0 until a.numElements()).map(a.getUTF8String(_).toString).toList

  // content skewed toward the marker alphabet so split edges get hit
  private val mvChar = Gen.frequency(
    6 -> Gen.alphaNumChar, 3 -> Gen.oneOf('#', ':', 's', '0', '1', '9'),
    1 -> Gen.oneOf('þ', 'ý', 'ü', '_', 'é', '中'))
  private val mvStr = Gen.listOf(mvChar).map(_.mkString)

  property("splitBytes == split(quote(sep), -1) for marker seps") =
    forAll(mvStr, Gen.oneOf("þ", "ý", "ü", "_", "#|")) { (s, sep) =>
      val exp = s.split(java.util.regex.Pattern.quote(sep), -1).toList
      gad2list(MvOps.splitBytes(UTF8String.fromString(s),
        sep.getBytes(java.nio.charset.StandardCharsets.UTF_8))) == exp
    }

  property("markerSplit == filter(regex split, non-empty)") =
    forAll(mvStr) { s =>
      val exp = s.split("(^s?[0-9]+:|#(s?[0-9]+:)?)", -1).filter(_.nonEmpty).toList
      gad2list(MvOps.markerSplit(UTF8String.fromString(s))) == exp
    }

  // reference FEFD chain: unhex (Spark odd-length semantics) →
  // ISO-8859-1 decode → split þ → split ý
  private def feFdRef(hex: String): Option[List[List[String]]] = {
    val hb = hex.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    try {
      val odd = (hb.length & 1) != 0
      val out = new Array[Byte](hb.length / 2 + (if (odd) 1 else 0))
      var h = 0
      for (i <- out.indices) {
        if (i == 0 && odd) { out(0) = java.util.HexFormat.fromHexDigit(hb(0)).toByte; h = 1 }
        else {
          out(i) = ((java.util.HexFormat.fromHexDigit(hb(h)) << 4) |
            java.util.HexFormat.fromHexDigit(hb(h + 1))).toByte
          h += 2
        }
      }
      val s = new String(out, java.nio.charset.StandardCharsets.ISO_8859_1)
      Some(s.split(java.util.regex.Pattern.quote("þ"), -1).toList
        .map(_.split(java.util.regex.Pattern.quote("ý"), -1).toList))
    } catch { case _: IllegalArgumentException => None }
  }

  private val hexish = Gen.listOf(Gen.frequency(
    8 -> Gen.oneOf("0123456789abcdefABCDEF".toSeq),
    1 -> Gen.oneOf('g', 'z', ' '))).map(_.mkString)
  private val realBlob = Gen.listOf(Gen.frequency(
    6 -> Gen.asciiPrintableChar, 2 -> Gen.oneOf('þ', 'ý'),
    1 -> Gen.oneOf('é', 'Ø'))).map(_.mkString)

  property("feFdDecode == composed unhex∘latin1∘split chain (fuzz hex)") =
    forAll(hexish) { hex =>
      val got = Option(MvOps.feFdDecode(UTF8String.fromString(hex)))
        .map(f => (0 until f.numElements()).toList.map(i =>
          gad2list(f.getArray(i))))
      got == feFdRef(hex)
    }

  property("feFdDecode round-trips a real latin-1 blob") =
    forAll(realBlob) { s =>
      val hex = s.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
        .map(b => f"${b & 0xff}%02X").mkString
      val got = Option(MvOps.feFdDecode(UTF8String.fromString(hex)))
        .map(f => (0 until f.numElements()).toList.map(i =>
          gad2list(f.getArray(i))))
      got == feFdRef(hex)
    }

  // ---- codec totality/losslessness properties ----------------------

  private val rle8Case = for {
    w <- Gen.choose(1, 23)
    h <- Gen.choose(1, 11)
    palN <- Gen.choose(1, 256)
    idx <- Gen.listOfN(w * h, Gen.choose(0, palN - 1))
    pal <- Gen.listOfN(palN, Gen.choose(0, 0xffffff))
  } yield (w, h, idx.map(_.toByte).toArray, pal.toArray)

  property("BMP RLE8 is LOSSLESS for any indices and palette") =
    forAll(rle8Case) { case (w, h, idx, pal) =>
      val img = graft.operators.BmpCodec
        .decode(graft.operators.BmpCodec.encodeRle8(w, h, idx, pal))
      img.exists { d =>
        d.width == w && d.height == h &&
          (0 until w * h).forall { p =>
            val c = pal(idx(p) & 0xff)
            (d.rgb(p * 3) & 0xff) == ((c >> 16) & 0xff) &&
              (d.rgb(p * 3 + 1) & 0xff) == ((c >> 8) & 0xff) &&
              (d.rgb(p * 3 + 2) & 0xff) == (c & 0xff)
          }
      }
    }

  private val adpcmConst = for {
    a <- Gen.choose(-32768, 32767)
    n <- Gen.choose(1, 400)
    ba <- Gen.oneOf(8, 16, 32, 256)
  } yield (a, n, ba)

  property("IMA ADPCM reconstructs ANY constant signal bit-exactly") =
    forAll(adpcmConst) { case (a, n, ba) =>
      val pcm = Array.fill[Short](n)(a.toShort)
      graft.operators.WavCodec
        .decode(graft.operators.WavCodec.encodeAdpcm(8000, pcm, ba))
        .exists(_.samples.toSeq == pcm.toSeq)
    }

  private val adpcmAny = for {
    n <- Gen.choose(1, 300)
    seed <- Gen.choose(0L, Long.MaxValue)
  } yield (n, seed)

  property("IMA ADPCM decode is total and length-exact on any encoded signal") =
    forAll(adpcmAny) { case (n, seed) =>
      val rnd = new scala.util.Random(seed)
      val pcm = Array.fill[Short](n)(rnd.nextInt(65536).toShort)
      graft.operators.WavCodec
        .decode(graft.operators.WavCodec.encodeAdpcm(16000, pcm))
        .exists(_.samples.length == n)
    }

  // narrow value range forces collisions, duplicates, AND null elements
  private val longsWithNulls: Gen[List[Option[Long]]] =
    Gen.listOf(Gen.frequency(
      9 -> Gen.choose(-5L, 5L).map(Option(_)),
      1 -> Gen.const(None: Option[Long])))

  private def larr(xs: Seq[Option[Long]]): GenericArrayData =
    new GenericArrayData(xs.map(_.map(Long.box).orNull).toArray[Any])

  property("intersect_count = |distinct common| (+1 when null is in both)") =
    forAll(longsWithNulls, longsWithNulls) { (a, b) =>
      val expect = (a.flatten.toSet intersect b.flatten.toSet).size +
        (if (a.contains(None) && b.contains(None)) 1 else 0)
      IntersectCount.compute(larr(a), larr(b)) == expect
    }

  // arbitrary unicode incl. surrogate-pair and control characters —
  // exactly the strings where UTF-16 (Java compareTo) and UTF-8-byte
  // (Spark binary) orders can disagree, so the property must compare
  // in the byte order the probe actually uses
  private val anyStr: Gen[String] = Gen.frequency(
    6 -> Gen.listOf(Gen.alphaNumChar).map(_.mkString),
    3 -> Gen.listOf(Gen.choose(0, 0xFFFF).map(_.toChar)).map(_.mkString),
    1 -> Gen.oneOf("", "\t", "a\tb", "x\ny", "%", "REC0001"))

  private def byteLE(a: String, b: String): Boolean = {
    val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length <= y.length
  }

  property("u56 string-prefix bin is monotone in UTF-8 byte order") =
    forAll(anyStr, anyStr) { (a, b) =>
      import graft.sources.MergeTable
      if (byteLE(a, b)) MergeTable.u56(a) <= MergeTable.u56(b)
      else MergeTable.u56(b) <= MergeTable.u56(a)
    }

  property("u56 is non-negative (a valid bin-space coordinate)") =
    forAll(anyStr) { s => graft.sources.MergeTable.u56(s) >= 0L }
}
