package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{BmpCodec, GifCodec, JpegCodec, Multimodal, PngCodec, PpmCodec, WavCodec}

class MultimodalSpec extends AnyFunSuite {
  import SparkTest._

  test("PNG interop: decodes what the JVM's independent ImageIO encoder writes") {
    // ImageIO's PNG writer is a wholly separate implementation — if our
    // from-scratch chunk/CRC/filter layer decodes its output pixel-
    // exactly, the codec speaks real PNG, not a private dialect
    val (w, h) = (23, 11)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 37 + y * 91) % 256) << 16 |
        ((x * 13 + y * 7) % 256) << 8 | ((x * 5 + y * 3) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val got = PngCodec.decode(bos.toByteArray)
    assert(got.isDefined, "must decode ImageIO's PNG output")
    val d = got.get
    assert(d.width == w && d.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val rgb = img.getRGB(x, y)
      assert((d.rgb(p) & 0xff) == ((rgb >> 16) & 0xff) &&
        (d.rgb(p + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (d.rgb(p + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y) differs")
    }
  }

  test("GIF interop: decodes what the JVM's independent ImageIO encoder writes") {
    // same cross-implementation check for the LZW layer: ImageIO's GIF
    // writer quantizes to its own palette, so compare against what
    // ImageIO itself reads back, pixel-exactly
    val (w, h) = (19, 13)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = (x * 41 + y * 17) % 256
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val payload = bos.toByteArray
    val reference = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val got = GifCodec.decode(payload)
    assert(got.isDefined, "must decode ImageIO's GIF output")
    val d = got.get
    assert(d.width == w && d.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val rgb = reference.getRGB(x, y)
      assert((d.rgb(p) & 0xff) == ((rgb >> 16) & 0xff) &&
        (d.rgb(p + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (d.rgb(p + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y) differs")
    }
  }

  test("JPEG interop: grayscale decode matches the JVM's reader within IDCT tolerance") {
    // both decoders consume the SAME compressed stream ImageIO wrote;
    // grayscale has no chroma upsampling, so any difference is IDCT
    // rounding — the standard bounds it to a couple of levels
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 128 + (96 * math.sin(x / 6.0) * math.cos(y / 5.0)).toInt
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val payload = bos.toByteArray
    val reference = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val got = JpegCodec.decode(payload)
    assert(got.isDefined, "must decode ImageIO's baseline JPEG")
    val d = got.get
    assert(d.width == w && d.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val ours = d.rgb((y * w + x) * 3) & 0xff
      // raster samples are the raw decoded Y values — getRGB would
      // apply Java's linear-gray→sRGB colorspace conversion on top
      val ref = reference.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(ours - ref))
    }
    assert(maxDiff <= 2, s"gray decode diverges by $maxDiff levels")
  }

  test("JPEG interop: color decode tracks the JVM's reader through chroma subsampling") {
    // a smooth color field keeps legitimate upsampling-filter
    // differences (nearest vs interpolating) small; large divergence
    // would mean broken Huffman/dequant/IDCT, not filter choice
    val (w, h) = (48, 32)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 128 + (80 * math.sin(x / 9.0)).toInt
      val g = 128 + (80 * math.cos(y / 7.0)).toInt
      val b = 128 + (80 * math.sin((x + y) / 11.0)).toInt
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val payload = bos.toByteArray
    val reference = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val got = JpegCodec.decode(payload)
    assert(got.isDefined, "must decode ImageIO's baseline color JPEG")
    val d = got.get
    assert(d.width == w && d.height == h)
    var sumDiff = 0L
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val ours = d.rgb((y * w + x) * 3 + c) & 0xff
      val ref = (reference.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      sumDiff += math.abs(ours - ref)
      maxDiff = math.max(maxDiff, math.abs(ours - ref))
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 3.0, s"mean channel divergence $meanDiff too high")
    assert(maxDiff <= 32, s"max channel divergence $maxDiff too high")
  }

  /** Encode through ImageIO's writer with progressive mode on (SOF2,
    * the JDK's default spectral-selection + successive-approximation
    * scan script). */
  private def writeProgressive(img: java.awt.image.BufferedImage): Array[Byte] = {
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    writer.dispose()
    bos.toByteArray
  }

  test("JPEG interop: progressive color decode matches the JVM's reader") {
    // the JDK writer's progressive scan script exercises the full
    // annex-G surface: interleaved DC first + refinement scans,
    // per-component AC spectral bands, AC successive-approximation
    // refinements with EOB runs
    val (w, h) = (48, 32)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = 128 + (80 * math.sin(x / 9.0)).toInt
      val g = 128 + (80 * math.cos(y / 7.0)).toInt
      val b = 128 + (80 * math.sin((x + y) / 11.0)).toInt
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val payload = writeProgressive(img)
    // really SOF2: a baseline stream here would test nothing
    assert(payload.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "writer emitted SOF2")
    val reference = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val got = JpegCodec.decode(payload)
    assert(got.isDefined, "must decode ImageIO's progressive color JPEG")
    val d = got.get
    assert(d.width == w && d.height == h)
    var sumDiff = 0L
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val ours = d.rgb((y * w + x) * 3 + c) & 0xff
      val ref = (reference.getRGB(x, y) >> ((2 - c) * 8)) & 0xff
      sumDiff += math.abs(ours - ref)
      maxDiff = math.max(maxDiff, math.abs(ours - ref))
    }
    val meanDiff = sumDiff.toDouble / (w * h * 3)
    assert(meanDiff <= 3.0, s"mean channel divergence $meanDiff too high")
    assert(maxDiff <= 32, s"max channel divergence $maxDiff too high")
  }

  test("JPEG interop: progressive grayscale decode matches within IDCT tolerance") {
    val (w, h) = (40, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val g = 128 + (96 * math.sin(x / 6.0) * math.cos(y / 5.0)).toInt
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val payload = writeProgressive(img)
    val reference = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(payload))
    val got = JpegCodec.decode(payload)
    assert(got.isDefined, "must decode ImageIO's progressive grayscale JPEG")
    val d = got.get
    assert(d.width == w && d.height == h)
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val ours = d.rgb((y * w + x) * 3) & 0xff
      val ref = reference.getRaster.getSample(x, y, 0)
      maxDiff = math.max(maxDiff, math.abs(ours - ref))
    }
    assert(maxDiff <= 2, s"progressive gray decode diverges by $maxDiff levels")
  }

  test("JPEG progressive and baseline decodes of the same image agree") {
    // same source pixels through both coding processes: the two
    // decodes share quant tables, so they must agree to within the
    // entropy-path differences (tiny — both reconstruct the same
    // dequantized coefficients when the writer uses full precision)
    val (w, h) = (32, 24)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 5) << 16) | ((y * 9) << 8) | ((x + y) * 3))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val base = JpegCodec.decode(bos.toByteArray)
    val prog = JpegCodec.decode(writeProgressive(img))
    assert(base.isDefined && prog.isDefined)
    var maxDiff = 0
    for (i <- 0 until w * h * 3)
      maxDiff = math.max(maxDiff,
        math.abs((base.get.rgb(i) & 0xff) - (prog.get.rgb(i) & 0xff)))
    assert(maxDiff <= 24,
      s"baseline and progressive reconstructions diverge by $maxDiff")
  }

  test("PPM codec round-trips pixels exactly") {
    val rgb = Array.tabulate[Byte](4 * 2 * 3)(i => (i * 11 % 256).toByte)
    val img = PpmCodec.decode(PpmCodec.encode(4, 2, rgb)).get
    assert(img.width == 4 && img.height == 2)
    assert(img.rgb.toSeq == rgb.toSeq)
  }

  test("PPM decode tolerates comments and rejects malformed input") {
    val rgb = Array.fill[Byte](3)(5)
    val withComment = "P6\n# a comment\n1 1\n255\n".getBytes("US-ASCII") ++ rgb
    assert(PpmCodec.decode(withComment).exists(i => i.width == 1 && i.height == 1))
    assert(PpmCodec.decode("P5\n1 1\n255\n ".getBytes ++ rgb).isEmpty, "wrong magic")
    assert(PpmCodec.decode("P6\n2 2\n255\n".getBytes ++ rgb).isEmpty, "truncated pixels")
    assert(PpmCodec.decode(Array[Byte](1, 2)).isEmpty)
    // corrupt headers whose w*h*3 overflows an Int must not defeat the
    // length guard (65536*65536*3 wraps to 0; 50000^2*3 goes negative)
    assert(PpmCodec.decode("P6\n65536 65536\n255\n".getBytes ++ rgb).isEmpty)
    assert(PpmCodec.decode("P6\n50000 50000\n255\n".getBytes ++ rgb).isEmpty)
    // ... nor a Long (Int.Max² * 3 wraps a Long; low 32 bits == 3)
    assert(PpmCodec.decode("P6\n2147483647 2147483647\n255\n".getBytes ++ rgb).isEmpty)
    // digit runs that wrap an Int (4294967297 -> 1) must not parse as 1x1
    assert(PpmCodec.decode("P6\n4294967297 4294967297\n255\n".getBytes ++ rgb).isEmpty)
    assert(PpmCodec.decode(null).isEmpty)
  }

  test("null payloads null the features, never the pipeline") {
    import spark.implicits._
    val media = Seq((1L, null.asInstanceOf[Array[Byte]])).toDS()
    val out = Multimodal.decodeImages(media).collect().head
    assert(out.byte_len == 0 && out.width.isEmpty && out.mean_r.isEmpty)
    val resized = Multimodal.resizeImages(media, 2, 2).collect().head
    assert(resized._2 == null, "malformed/null payloads pass through")
  }

  test("box resize averages source cells per channel") {
    // 2x2 all-channel values 10,20,30,40 -> 1x1 pixel = floor(mean) = 25
    val rgb = Array[Byte](10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40)
    val out = PpmCodec.resizeBox(PpmCodec.Image(2, 2, rgb), 1, 1)
    assert(out.rgb.toSeq == Seq[Byte](25, 25, 25))
  }

  test("decodeImages extracts real dimensions and channel means") {
    import spark.implicits._
    val rgb = Array.tabulate[Byte](2 * 1 * 3)(i => (i * 10).toByte) // pixels (0,10,20),(30,40,50)
    val media = Seq(
      (1L, PpmCodec.encode(2, 1, rgb)),
      (2L, Array[Byte](9, 9, 9))).toDS() // malformed
    val out = Multimodal.decodeImages(media).collect().sortBy(_.id)
    assert(out(0).width.contains(2) && out(0).height.contains(1))
    assert(out(0).mean_r.contains(15.0) && out(0).mean_g.contains(25.0) &&
      out(0).mean_b.contains(35.0))
    assert(out(1).width.isEmpty && out(1).mean_r.isEmpty,
      "malformed payload nulls features, never fails the pipeline")
  }

  test("hashImages: dHash from real pixels — brightness-invariant, edit-local, guarded") {
    import spark.implicits._
    val (w, h) = (16, 8)
    def enc(px: Int => Int) =
      PpmCodec.encode(w, h, Array.tabulate[Byte](w * h * 3)(i => px(i).toByte))
    val base: Int => Int = i => (i * 7 + 3) % 254
    val media = Seq(
      1L -> enc(base),
      2L -> enc(i => base(i) + 1), // uniform +1 brightness
      // local edit: bump one pixel (pixel 3 = row 0 col 3) far enough
      // to flip its two adjacent comparisons at most
      3L -> enc(i => if (i / 3 == 3) base(i) + 60 else base(i)),
      4L -> enc(_ => 9), // flat image: no comparison fires -> hash 0
      5L -> null.asInstanceOf[Array[Byte]],
      6L -> PpmCodec.encode(4, 4, Array.fill[Byte](4 * 4 * 3)(1))) // under 9x8
    val out = Multimodal.hashImages(media.toDS()).collect()
      .map(r => r.id -> r.dhash).toMap
    assert(out(1L).isDefined)
    assert(out(2L) == out(1L), "uniform brightness must not change the hash")
    val d = java.lang.Long.bitCount(out(3L).get ^ out(1L).get)
    assert(d >= 1 && d <= 2, s"a one-pixel edit flips at most its two comparisons, got $d")
    assert(out(4L).contains(0L), "flat image hashes to 0")
    assert(out(5L).isEmpty, "malformed payload nulls the hash")
    assert(out(6L).isEmpty, "images smaller than the 9x8 window null the hash")
  }

  test("hammingNearDups over image hashes finds exactly the banded pairs") {
    import spark.implicits._
    // hamming(1,2)=0, hamming(1,3)<=2 -> pairs (1,2),(1,3),(2,3); the
    // flat image 4 is far from the gradient family
    val (w, h) = (16, 8)
    def enc(px: Int => Int) =
      PpmCodec.encode(w, h, Array.tabulate[Byte](w * h * 3)(i => px(i).toByte))
    val base: Int => Int = i => (i * 7 + 3) % 254
    val media = Seq(
      1L -> enc(base), 2L -> enc(i => base(i) + 1),
      3L -> enc(i => if (i / 3 == 3) base(i) + 60 else base(i)),
      4L -> enc(_ => 9)).toDS()
    val hashed = Multimodal.hashImages(media).toDF()
      .select(col("id"), col("dhash"))
    val pairs = graft.operators.Dedup.hammingNearDups(hashed, "id", "dhash")
      .orderBy("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(pairs == Seq((1L, 2L), (1L, 3L), (2L, 3L)), s"got $pairs")
  }

  test("resizeImages produces decodable resized payloads") {
    import spark.implicits._
    val rgb = Array.tabulate[Byte](8 * 4 * 3)(i => (i % 256).toByte)
    val media = Seq((1L, PpmCodec.encode(8, 4, rgb))).toDS()
    val out = Multimodal.resizeImages(media, 2, 2).collect().head
    val img = PpmCodec.decode(out._2).get
    assert(img.width == 2 && img.height == 2 && img.rgb.length == 12)
  }

  test("feature extraction is deterministic over binary payloads") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.fill[Byte](2048)(7)),
      (2L, Array[Byte](1, 2, 3)),
      (3L, Array.empty[Byte])).toDS()
    val out = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(out.map(_.byteLen).toSeq == Seq(2048, 3, 0))
    assert(out.head.width == 2048 % 1024 && out.head.height == 3)
    assert(out(1).meanByte == 2.0)
    assert(out(2).meanByte == 0.0)
    // determinism: rerun gives identical rows
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.id)
    assert(out.toSeq == again.toSeq)
  }

  test("frame sampling emits every stride-th block") {
    import spark.implicits._
    val payload = Array.tabulate[Byte](4096)(i => (i % 127).toByte)
    val media = Seq((1L, payload)).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(media, "id", "payload",
      blockSize = 1024, stride = 2).collect()
    assert(frames.map(_.getInt(1)).sorted.toSeq == Seq(0, 2))
    assert(frames.forall(_.getAs[Array[Byte]]("frame").length == 1024))
  }

  test("resize stub is deterministic and bounds output size") {
    import spark.implicits._
    val media = Seq(
      (1L, Array.tabulate[Byte](5000)(i => (i % 120).toByte)),
      (2L, Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.resize(media, 256).collect().sortBy(_._1).toMap
    assert(out(1L).length == 256)
    assert(out(2L).toSeq == Seq[Byte](1, 2, 3), "small payloads pass through")
    val again = Multimodal.resize(media, 256).collect().sortBy(_._1).toMap
    assert(out(1L).toSeq == again(1L).toSeq)
  }

  test("extraction runs on the documents table payloads") {
    import spark.implicits._
    val media = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
    val out = Multimodal.extractFeatures(media)
    assert(out.count() > 0)
    assert(out.filter(col("channels") =!= 3).count() == 0)
  }

  test("WAV codec round-trips 16-bit PCM exactly") {
    val samples = Array.tabulate[Short](777)(i => ((i * 131) % 65536 - 32768).toShort)
    val a = WavCodec.decode(WavCodec.encode(44100, samples)).get
    assert(a.sampleRate == 44100)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("WAV decode walks chunks and rejects malformed/unsupported input") {
    val wav = WavCodec.encode(8000, Array[Short](1, -2, 3))
    // an extra LIST chunk between fmt and data must be skipped
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
    val withList = wav.take(36) ++ listChunk ++ wav.drop(36)
    assert(WavCodec.decode(withList).exists(_.samples.toSeq == Seq[Short](1, -2, 3)))
    assert(WavCodec.decode("RIFX".getBytes ++ wav.drop(4)).isEmpty, "wrong magic")
    assert(WavCodec.decode(wav.take(40)).isEmpty, "truncated data")
    // stereo / 8-bit / non-PCM fmt chunks are unsupported, not data
    val stereo = wav.clone(); stereo(22) = 2
    assert(WavCodec.decode(stereo).isEmpty)
    val eightBit = wav.clone(); eightBit(34) = 8
    assert(WavCodec.decode(eightBit).isEmpty)
    // a data chunk BEFORE any fmt chunk must not decode
    val dataFirst = wav.take(12) ++ wav.drop(36) ++ wav.slice(12, 36)
    assert(WavCodec.decode(dataFirst).isEmpty)
    assert(WavCodec.decode(null).isEmpty)
    assert(WavCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("decodeAudio extracts real rate/duration/amplitude stats") {
    import spark.implicits._
    val media = Seq(
      (1L, WavCodec.encode(8000, Array[Short](1000, -1000, 500, -500))),
      (2L, Array[Byte](9, 9, 9))).toDS()
    val out = Multimodal.decodeAudio(media).collect().sortBy(_.id)
    val ok = out(0)
    assert(ok.sample_rate.contains(8000) && ok.n_samples.contains(4))
    assert(ok.duration_ms.contains(0.5))
    assert(ok.mean_abs.contains(750.0) && ok.peak_abs.contains(1000))
    val bad = out(1)
    assert(bad.byte_len == 3 && bad.sample_rate.isEmpty && bad.mean_abs.isEmpty)
  }

  test("resampleAudio2x interpolates midpoints and degrades cleanly") {
    import spark.implicits._
    val media = Seq(
      (1L, WavCodec.encode(8000, Array[Short](1000, -1000, 500, -500))),
      (2L, Array[Byte](9, 9, 9))).toDS()
    val out = Multimodal.resampleAudio2x(media).collect().sortBy(_.id)
    val ok = out(0)
    // out = [1000, 0, -1000, -250, 500, 0, -500]; |out| mean = 3250/7
    assert(ok.src_rate.contains(8000) && ok.dst_rate.contains(16000))
    assert(ok.n_out.contains(7))
    assert(ok.mean_abs.contains(3250.0 / 7) && ok.peak_abs.contains(1000.0))
    val bad = out(1)
    assert(bad.src_rate.isEmpty && bad.n_out.isEmpty && bad.mean_abs.isEmpty,
      "malformed payload nulls features, never fails the pipeline")
  }

  test("Y4M codec round-trips frames exactly across colorspaces") {
    import graft.operators.Y4mCodec
    for (cs <- Seq("mono", "420", "422", "444")) {
      val fs = Y4mCodec.frameSize(4, 2, cs).toInt
      val frames = Array.tabulate(3)(f =>
        Array.tabulate[Byte](fs)(i => ((f * 31 + i * 7) % 256).toByte))
      val v = Y4mCodec.decode(Y4mCodec.encode(4, 2, 30, 1, cs, frames)).get
      assert(v.width == 4 && v.height == 2 && v.fpsNum == 30 && v.fpsDen == 1)
      assert(v.colorspace == cs && v.frames.length == 3)
      v.frames.zip(frames).foreach { case (a, b) => assert(a.toSeq == b.toSeq) }
      // luma plane is the w*h prefix in every layout
      assert(v.luma(1).toSeq == frames(1).take(8).toSeq)
    }
  }

  test("Y4M decode skips unknown header params and rejects malformed input") {
    import graft.operators.Y4mCodec
    val y = Array.fill[Byte](4)(7)
    val withParams = ("YUV4MPEG2 W2 H2 F25:1 Ip A1:1 Cmono Xsome\nFRAME\n"
      .getBytes("US-ASCII")) ++ y
    val v = Y4mCodec.decode(withParams).get
    assert(v.width == 2 && v.height == 2 && v.frames.length == 1)
    assert(Y4mCodec.decode("JUNK".getBytes("US-ASCII")).isEmpty)
    assert(Y4mCodec.decode(null).isEmpty)
    // unsupported colorspace rejected, not guessed
    assert(Y4mCodec.decode(
      ("YUV4MPEG2 W2 H2 F25:1 C420p10\nFRAME\n".getBytes("US-ASCII") ++
        Array.fill[Byte](6)(0))).isEmpty)
    // truncated final frame rejects the payload
    assert(Y4mCodec.decode(
      ("YUV4MPEG2 W2 H2 F25:1 Cmono\nFRAME\n".getBytes("US-ASCII") ++
        Array.fill[Byte](3)(0))).isEmpty)
    // zero/absurd dimensions rejected
    assert(Y4mCodec.decode(
      "YUV4MPEG2 W0 H2 F25:1 Cmono\n".getBytes("US-ASCII")).isEmpty)
    assert(Y4mCodec.decode(
      "YUV4MPEG2 W99999999 H2 F25:1 Cmono\n".getBytes("US-ASCII")).isEmpty)
  }

  test("sampleVideoFrames emits every stride-th frame with real luma stats") {
    import spark.implicits._
    import graft.operators.Y4mCodec
    val frames = Array.tabulate(5)(f => Array.fill[Byte](4)((10 * f).toByte))
    val media = Seq(
      (1L, Y4mCodec.encode(2, 2, 25, 1, "mono", frames)),
      (2L, Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.sampleVideoFrames(media, stride = 2).collect()
    val ok = out.filter(_.id == 1L).sortBy(_.frame_idx)
    assert(ok.map(_.frame_idx.get).toSeq == Seq(0, 2, 4))
    assert(ok.forall(r => r.n_frames.contains(5) && r.width.contains(2)))
    assert(ok.map(_.mean_y.get).toSeq == Seq(0.0, 20.0, 40.0))
    assert(ok.map(_.peak_y.get).toSeq == Seq(0, 20, 40))
    val bad = out.filter(_.id == 2L)
    assert(bad.length == 1 && bad(0).frame_idx.isEmpty && bad(0).byte_len == 3)
  }

  test("BMP codec round-trips pixels exactly across padded widths and both parities") {
    // widths 1..8 sweep every row-padding residue (w*3 mod 4); heights
    // cover even/odd so the bottom-up flip is exercised asymmetrically
    for (w <- 1 to 8; h <- Seq(1, 2, 5)) {
      val rgb = Array.tabulate[Byte](w * h * 3)(i => ((i * 29 + w * 7 + h) % 256).toByte)
      val got = BmpCodec.decode(BmpCodec.encode(w, h, rgb))
      assert(got.isDefined, s"roundtrip failed at ${w}x$h")
      assert(got.get.width == w && got.get.height == h)
      assert(got.get.rgb.toSeq == rgb.toSeq, s"pixels differ at ${w}x$h")
    }
  }

  test("BMP interop: both directions against the JVM's independent ImageIO plugin") {
    val (w, h) = (21, 9)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31 + y * 5) % 256) << 16 |
        ((x * 3 + y * 53) % 256) << 8 | ((x * 11 + y * 23) % 256))
    // ImageIO writes, we decode — pixel-exact
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val d = BmpCodec.decode(bos.toByteArray).getOrElse(fail("must decode ImageIO BMP"))
    assert(d.width == w && d.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val rgb = img.getRGB(x, y)
      assert((d.rgb(p) & 0xff) == ((rgb >> 16) & 0xff) &&
        (d.rgb(p + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (d.rgb(p + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y) differs (their write)")
    }
    // we write, ImageIO decodes — pixel-exact the other way
    val rgbFlat = Array.tabulate[Byte](w * h * 3) { i =>
      val (pix, c) = (i / 3, i % 3)
      ((pix * 37 + c * 85 + 11) % 256).toByte
    }
    val ours = BmpCodec.encode(w, h, rgbFlat)
    val back = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(back != null && back.getWidth == w && back.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val p = (y * w + x) * 3
      val rgb = back.getRGB(x, y)
      assert((rgbFlat(p) & 0xff) == ((rgb >> 16) & 0xff) &&
        (rgbFlat(p + 1) & 0xff) == ((rgb >> 8) & 0xff) &&
        (rgbFlat(p + 2) & 0xff) == (rgb & 0xff), s"pixel ($x,$y) differs (our write)")
    }
  }

  test("BMP decode handles top-down, 32-bit and palettized forms; rejects never misdecodes") {
    val base = {
      val rgb = Array.tabulate[Byte](4 * 3 * 3)(i => ((i * 19 + 3) % 256).toByte)
      BmpCodec.encode(4, 3, rgb)
    }
    // top-down: negate the height field; rows arrive in natural order,
    // so the decoded image is the bottom-up one flipped vertically
    val td = base.clone()
    val negH = -3
    td(22) = (negH & 0xff).toByte; td(23) = ((negH >> 8) & 0xff).toByte
    td(24) = ((negH >> 16) & 0xff).toByte; td(25) = ((negH >> 24) & 0xff).toByte
    val up = BmpCodec.decode(base).get
    val down = BmpCodec.decode(td).get
    for (y <- 0 until 3; x <- 0 until 4; c <- 0 until 3)
      assert(down.rgb(((2 - y) * 4 + x) * 3 + c) == up.rgb((y * 4 + x) * 3 + c),
        "top-down must be the vertical flip of bottom-up")
    // rejects: compression flag, unsupported depth, truncation — and a
    // corruption sweep must never throw (decode is total)
    val rle = base.clone(); rle(30) = 1
    assert(BmpCodec.decode(rle).isEmpty, "BI_RLE8 must be rejected, not misdecoded")
    val b16 = base.clone(); b16(28) = 16
    assert(BmpCodec.decode(b16).isEmpty, "16bpp must be rejected")
    assert(BmpCodec.decode(base.take(53)).isEmpty)
    assert(BmpCodec.decode(Array[Byte](1, 2, 3)).isEmpty)
    for (i <- base.indices by 7) {
      val c = base.clone(); c(i) = (c(i) ^ 0x5a).toByte
      BmpCodec.decode(c) // must not throw; None or a decoded image both fine
    }
    // hand-built 8-bit palettized image: 2x2, palette[0]=red, [1]=green
    val pal8 = {
      val bos = new java.io.ByteArrayOutputStream()
      def p16(v: Int) = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def p32(v: Int) = { p16(v & 0xffff); p16(v >>> 16) }
      bos.write('B'); bos.write('M'); p32(54 + 8 + 8 + 8); p32(0)
      p32(54 + 8) // data offset: after header + 2-entry palette
      p32(40); p32(2); p32(2); p16(1); p16(8); p32(0); p32(8)
      p32(0); p32(0); p32(2); p32(0) // biClrUsed = 2
      bos.write(Array[Byte](0, 0, -1, 0)) // palette 0: BGRX = red
      bos.write(Array[Byte](0, -1, 0, 0)) // palette 1: green
      bos.write(Array[Byte](0, 1, 0, 0)) // bottom row: red, green (+pad)
      bos.write(Array[Byte](1, 0, 0, 0)) // top row: green, red (+pad)
      bos.toByteArray
    }
    val p8 = BmpCodec.decode(pal8).getOrElse(fail("palettized BMP must decode"))
    assert(p8.width == 2 && p8.height == 2)
    def px(img: PpmCodec.Image, x: Int, y: Int) =
      (0 until 3).map(c => img.rgb((y * img.width + x) * 3 + c) & 0xff)
    assert(px(p8, 0, 0) == Seq(0, 255, 0) && px(p8, 1, 0) == Seq(255, 0, 0))
    assert(px(p8, 0, 1) == Seq(255, 0, 0) && px(p8, 1, 1) == Seq(0, 255, 0))
    // hand-built 32-bit BGRX image: 2x1 (stride needs no pad at 32bpp)
    val b32 = {
      val bos = new java.io.ByteArrayOutputStream()
      def p16(v: Int) = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
      def p32(v: Int) = { p16(v & 0xffff); p16(v >>> 16) }
      bos.write('B'); bos.write('M'); p32(54 + 8); p32(0); p32(54)
      p32(40); p32(2); p32(1); p16(1); p16(32); p32(0); p32(8)
      p32(0); p32(0); p32(0); p32(0)
      bos.write(Array[Byte](10, 20, 30, 0)) // BGRX -> rgb (30,20,10)
      bos.write(Array[Byte](40, 50, 60, 0)) // BGRX -> rgb (60,50,40)
      bos.toByteArray
    }
    val d32 = BmpCodec.decode(b32).getOrElse(fail("32-bit BMP must decode"))
    assert(d32.width == 2 && d32.height == 1)
    assert(px(d32, 0, 0) == Seq(30, 20, 10) && px(d32, 1, 0) == Seq(60, 50, 40))
  }

  test("animated GIF: placement, transparency, and all three disposal methods compose") {
    import graft.operators.GifCodec.AnimFrame
    val pal = Array.tabulate(256)(c => c * 0x010101) // gray ramp
    val (sw, sh) = (4, 2)
    def px(img: PpmCodec.Image, x: Int, y: Int) = img.rgb((y * img.width + x) * 3) & 0xff
    val gif = GifCodec.encodeAnimated(sw, sh, pal, Seq(
      AnimFrame(0, 0, 4, 2, Array.fill[Byte](8)(10)),                   // full screen 10
      // 2x2 patch at (2,0): color 99 except one TRANSPARENT pixel,
      // restore-previous disposal
      AnimFrame(2, 0, 2, 2, Array[Byte](99, 7, 99.toByte, 99.toByte),
        disposal = 3, transparentIdx = 7),
      // full screen 30 with restore-background disposal
      AnimFrame(0, 0, 4, 2, Array.fill[Byte](8)(30), disposal = 2),
      // final 1x1 patch so the post-disposal canvas is observable
      AnimFrame(0, 0, 1, 1, Array[Byte](50))))
    val fs = GifCodec.decodeFrames(gif).getOrElse(fail("animated GIF must decode"))
    assert(fs.length == 4)
    assert(fs.forall(f => f.width == sw && f.height == sh), "frames are screen-sized")
    assert((0 until 4).forall(x => px(fs(0), x, 0) == 10))
    // frame 1: patch drew 99 at (2,0),(2,1),(3,1); (3,0) was transparent -> 10
    assert(px(fs(1), 2, 0) == 99 && px(fs(1), 3, 1) == 99)
    assert(px(fs(1), 3, 0) == 10, "transparent pixel leaves the canvas")
    assert(px(fs(1), 0, 0) == 10, "outside the rect untouched")
    // frame 2 drew over the RESTORED frame-0 canvas (disposal 3)
    assert(px(fs(2), 0, 0) == 30)
    // frame 3: disposal 2 cleared frame 2's rect to black, then 1x1 drew 50
    assert(px(fs(3), 0, 0) == 50)
    assert(px(fs(3), 1, 0) == 0 && px(fs(3), 3, 1) == 0, "restore-to-background")
  }

  test("animated GIF interop: ImageIO reads our frame count and first frame pixels") {
    import graft.operators.GifCodec.AnimFrame
    val pal = Array.tabulate(256)(c =>
      (((c * 7 + 3) % 256) << 16) | (((c * 11 + 5) % 256) << 8) | ((c * 13 + 1) % 256))
    val (sw, sh) = (6, 4)
    val f0 = Array.tabulate[Byte](sw * sh)(i => ((i * 31 + 7) % 256).toByte)
    val f1 = Array.tabulate[Byte](sw * sh)(i => ((i * 17 + 3) % 256).toByte)
    val gif = GifCodec.encodeAnimated(sw, sh, pal,
      Seq(AnimFrame(0, 0, sw, sh, f0), AnimFrame(0, 0, sw, sh, f1)))
    val rd = javax.imageio.ImageIO.getImageReadersBySuffix("gif").next()
    rd.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(gif)))
    assert(rd.getNumImages(true) == 2, "ImageIO must see both frames")
    val their0 = rd.read(0)
    for (y <- 0 until sh; x <- 0 until sw)
      assert((their0.getRGB(x, y) & 0xffffff) == pal(f0(y * sw + x) & 0xff),
        s"ImageIO frame-0 pixel ($x,$y)")
    rd.dispose()
    // our composed decode agrees on both full-rect frames
    val ours = GifCodec.decodeFrames(gif).get
    for (y <- 0 until sh; x <- 0 until sw) {
      val c1 = pal(f1(y * sw + x) & 0xff)
      val o = (ours(1).rgb((y * sw + x) * 3) & 0xff) << 16 |
        (ours(1).rgb((y * sw + x) * 3 + 1) & 0xff) << 8 |
        (ours(1).rgb((y * sw + x) * 3 + 2) & 0xff)
      assert(o == c1)
    }
    // totality: truncation anywhere must give None, never throw
    (1 until gif.length by 7).foreach(cut =>
      assert(GifCodec.decodeFrames(gif.take(cut)).isEmpty))
    // the single-frame decode still reads animated payloads (frame 0)
    assert(GifCodec.decode(gif).exists(i => i.width == sw && i.height == sh))
  }

  test("animated GIF decode is output-budget bounded against crafted payloads") {
    // a few-byte header claiming a 9500x9500 logical screen: one
    // snapshot alone (9500*9500*3 = 270 MB) exceeds MaxAnimBytes, so
    // the decoder must reject BEFORE allocating the canvas — the
    // frames x screen-area product is what a crafted tiny payload
    // (huge screen, many 1x1 frames) weaponizes
    val huge = {
      val out = new java.io.ByteArrayOutputStream()
      out.write("GIF89a".getBytes("US-ASCII"))
      def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      u16(9500); u16(9500)
      out.write(0); out.write(0); out.write(0) // no global table
      out.write(0x3b)
      out.toByteArray
    }
    assert(9500L * 9500L * 3 > GifCodec.MaxAnimBytes)
    assert(GifCodec.decodeFrames(huge).isEmpty, "over-budget screen must reject")
    assert(GifCodec.decode(huge).isEmpty, "paletteless screen rejects in decode too")
    // a normal animation stays comfortably inside the budget
    val pal = Array.tabulate(256)(i => i << 16 | i << 8 | i)
    val small = GifCodec.encodeAnimated(8, 8, pal, Seq(
      GifCodec.AnimFrame(0, 0, 8, 8, Array.fill(64)(1.toByte)),
      GifCodec.AnimFrame(2, 2, 4, 4, Array.fill(16)(2.toByte))))
    assert(GifCodec.decodeFrames(small).exists(_.length == 2))
  }

  test("BMP RLE8 roundtrips pixel-exactly and actually compresses runs") {
    def px(img: PpmCodec.Image, x: Int, y: Int) =
      (0 to 2).map(c => img.rgb((y * img.width + x) * 3 + c) & 0xff)
    val (w, h) = (19, 7)
    val palette = Array.tabulate(256)(c =>
      (((c * 5 + 3) % 256) << 16) | (((c * 7 + 11) % 256) << 8) | ((c * 3 + 1) % 256))
    val idx = Array.tabulate[Byte](w * h)(i => ((i / 8) % 4).toByte) // blocky runs
    val bmp = BmpCodec.encodeRle8(w, h, idx, palette)
    val img = BmpCodec.decode(bmp).getOrElse(fail("RLE8 must decode"))
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val c = palette(idx(y * w + x) & 0xff)
      assert(px(img, x, y) == Seq((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff))
    }
    // blocky content must beat the raw 8-bit padded-stride data size
    assert(bmp.length - (54 + 1024) < ((w + 3) & ~3) * h, "RLE must compress")
  }

  test("BMP RLE8 interop: ImageIO reads our stream and we read ImageIO's") {
    def px(img: PpmCodec.Image, x: Int, y: Int) =
      (0 to 2).map(c => img.rgb((y * img.width + x) * 3 + c) & 0xff)
    val (w, h) = (23, 9)
    val palette = Array.tabulate(256)(c =>
      (((c * 11) % 256) << 16) | (((c * 3 + 7) % 256) << 8) | ((c * 13 + 5) % 256))
    val idx = Array.tabulate[Byte](w * h)(i => ((i * 31 / 16) % 256).toByte)
    // ours -> their reader
    val ours = BmpCodec.encodeRle8(w, h, idx, palette)
    val theirs = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(ours))
    assert(theirs != null, "ImageIO must accept our RLE8 BMP")
    for (y <- 0 until h; x <- 0 until w)
      assert((theirs.getRGB(x, y) & 0xffffff) == palette(idx(y * w + x) & 0xff),
        s"ImageIO pixel ($x,$y)")
    // their writer -> our decoder
    val rs = Array.tabulate[Byte](256)(c => ((palette(c) >> 16) & 0xff).toByte)
    val gs = Array.tabulate[Byte](256)(c => ((palette(c) >> 8) & 0xff).toByte)
    val bs = Array.tabulate[Byte](256)(c => (palette(c) & 0xff).toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, rs, gs, bs)
    val bi = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      bi.getRaster.setSample(x, y, 0, idx(y * w + x) & 0xff)
    val wr = javax.imageio.ImageIO.getImageWritersByFormatName("bmp").next()
    val p = wr.getDefaultWriteParam
    p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    p.setCompressionType("BI_RLE8")
    val bos = new java.io.ByteArrayOutputStream()
    wr.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    wr.write(null, new javax.imageio.IIOImage(bi, null, null), p)
    wr.dispose()
    val dec = BmpCodec.decode(bos.toByteArray)
      .getOrElse(fail("ImageIO's RLE8 BMP must decode"))
    assert(dec.width == w && dec.height == h)
    for (y <- 0 until h; x <- 0 until w) {
      val c = palette(idx(y * w + x) & 0xff)
      assert(px(dec, x, y) == Seq((c >> 16) & 0xff, (c >> 8) & 0xff, c & 0xff),
        s"our pixel ($x,$y)")
    }
  }

  test("BMP RLE8 rejects torn/overrunning/out-of-palette streams") {
    val palette = Array.tabulate(16)(c => c * 0x111111)
    val idx = Array.tabulate[Byte](5 * 3)(i => (i % 4).toByte)
    val good = BmpCodec.encodeRle8(5, 3, idx, palette)
    assert(BmpCodec.decode(good).isDefined)
    assert(BmpCodec.decode(good.dropRight(2)).isEmpty, "missing EOF escape")
    // a run longer than the row: count byte 200 on a width-5 image
    val overrun = good.clone()
    overrun(54 + 4 * 16) = 200.toByte
    assert(BmpCodec.decode(overrun).isEmpty, "run past row end")
    // run index beyond the declared palette (16 entries)
    val badIdx = good.clone()
    badIdx(54 + 4 * 16 + 1) = 99.toByte
    assert(BmpCodec.decode(badIdx).isEmpty, "index outside palette")
    // RLE + top-down (negative height) is contradictory
    val topDown = good.clone()
    val negH = -3
    topDown(22) = (negH & 0xff).toByte; topDown(23) = ((negH >> 8) & 0xff).toByte
    topDown(24) = 0xff.toByte; topDown(25) = 0xff.toByte
    assert(BmpCodec.decode(topDown).isEmpty, "top-down RLE")
  }

  test("sceneChanges: cuts land on frame jumps; 1-frame and malformed payloads degrade cleanly") {
    import spark.implicits._
    val (w, h) = (4, 2)
    def flat(v: Int) = Array.fill[Byte](w * h)(v.toByte)
    val media = Seq(
      // two identical frames, then a +80 jump: one boundary quiet, one cut
      (1L, graft.operators.Y4mCodec.encode(w, h, 25, 1, "mono",
        Array(flat(10), flat(10), flat(90)))),
      (2L, graft.operators.Y4mCodec.encode(w, h, 25, 1, "mono", Array(flat(33)))),
      (3L, Array[Byte](9, 9, 9))).toDS()
    val out = Multimodal.sceneChanges(media, threshold = 8.0).collect()
    val byId = out.groupBy(_.id)
    val b1 = byId(1L).sortBy(_.frame_idx.get)
    assert(b1.map(_.frame_idx.get).toSeq == Seq(1, 2))
    assert(b1(0).mad.contains(0.0) && b1(0).is_cut.contains(false))
    assert(b1(1).mad.contains(80.0) && b1(1).is_cut.contains(true))
    assert(!byId.contains(2L), "a 1-frame video has no boundaries")
    assert(byId(3L).head.frame_idx.isEmpty, "malformed payload nulls, never fails")
  }

  test("audioStats: crossings, RMS and silence fold exactly; all WAV formats feed it") {
    import spark.implicits._
    // square wave amp 1000, half-period 5, 100 samples (PCM16);
    // a constant ramp via ADPCM; a silent clip via µ-law byte 0xFF
    val sq = Array.tabulate[Short](100)(i => (if ((i / 5) % 2 == 0) 1000 else -1000).toShort)
    val media = Seq(
      (1L, WavCodec.encode(8000, sq)),
      (2L, WavCodec.encodeAdpcm(8000, Array.tabulate[Short](60)(i => (500 + i).toShort))),
      (3L, WavCodec.encodeUlaw(8000, Array.fill[Byte](50)(0xff.toByte))),
      (4L, Array[Byte](1, 2, 3))).toDS()
    val out = Multimodal.audioStats(media).collect().map(s => s.id -> s).toMap
    assert(out(1L).n_samples.contains(100))
    assert(out(1L).zero_crossings.contains(19L), s"19 sign flips, got ${out(1L).zero_crossings}")
    assert(out(1L).rms.contains(1000.0))
    assert(out(1L).silence_ratio.contains(0.0))
    // the ADPCM ramp (slope 1) decodes exactly: no flips, all loud
    assert(out(2L).n_samples.contains(60) && out(2L).zero_crossings.contains(0L))
    assert(out(2L).silence_ratio.contains(0.0))
    // µ-law 0xFF decodes to exactly 0 -> all silent, zero RMS
    assert(out(3L).silence_ratio.contains(1.0) && out(3L).rms.contains(0.0))
    assert(out(3L).zero_crossings.contains(0L), "zero samples never count as crossings")
    assert(out(4L).n_samples.isEmpty, "malformed payload nulls, never fails")
  }

  test("vadStats: voiced rule, run starts, and degenerate clips match a local fold") {
    import spark.implicits._
    // 5 frames of 100 samples: loud, quiet, quiet, loud, loud
    // (amp 1000 vs 10) — voiced = {0, 3, 4}, segments = {0, 3..4} = 2
    val mix = Array.tabulate[Short](500) { i =>
      val loud = Set(0, 3, 4).contains(i / 100)
      (if (loud) (if (i % 2 == 0) 1000 else -1000) else (if (i % 2 == 0) 10 else -10)).toShort
    }
    val flat = Array.fill[Short](300)(800) // all frames equal ⇒ none beats half the mean? 2·fs·nf > tot with fs=tot/nf ⇒ 2>1 ⇒ ALL voiced, 1 segment
    val media = Seq(
      (1L, WavCodec.encode(8000, mix)),
      (2L, WavCodec.encode(8000, flat)),
      (3L, WavCodec.encode(8000, Array.tabulate[Short](150)(i => (i % 7).toShort))), // 1 full frame, trailing 50 dropped
      (4L, WavCodec.encode(8000, Array.fill[Short](40)(5))), // shorter than one frame
      (5L, Array[Byte](9, 9, 9))).toDS()
    val out = Multimodal.vadStats(media).collect().map(s => s.id -> s).toMap
    // independent local fold over the mix clip
    val fs = (0 until 5).map(f => (0 until 100).map(i => math.abs(mix(f * 100 + i).toLong)).sum)
    val tot = fs.sum
    val vf = fs.map(s => 2L * s * 5 > tot)
    assert(vf == Seq(true, false, false, true, true))
    assert(out(1L).n_frames.contains(5) && out(1L).n_voiced.contains(3))
    assert(out(1L).n_segments.contains(2), "two maximal voiced runs")
    assert(out(1L).voiced_ratio.contains(3.0 / 5))
    // uniform energy: every frame beats HALF the mean ⇒ one voiced run
    assert(out(2L).n_voiced.contains(3) && out(2L).n_segments.contains(1))
    // a single frame always beats half its own mean
    assert(out(3L).n_frames.contains(1) && out(3L).n_voiced.contains(1))
    assert(out(4L).n_frames.contains(0) && out(4L).n_voiced.isEmpty,
      "sub-frame clip reports zero frames with null activity")
    assert(out(5L).n_frames.isEmpty, "malformed payload nulls, never fails")
  }

  test("IMA ADPCM reconstructs slope-{0,±1,±3,±4} ramps bit-exactly (the m12 oracle contract)") {
    for (slope <- Seq(0, 1, 3, 4, -1, -3, -4); a <- Seq(-500, 0, 77, 499)) {
      val n = 271 // spans 5 blocks at blockAlign 32 (57 samples/block)
      val pcm = Array.tabulate[Short](n)(i => (a + slope * i).toShort)
      val got = WavCodec.decode(WavCodec.encodeAdpcm(16000, pcm, blockAlign = 32))
        .getOrElse(fail(s"slope $slope must decode"))
      assert(got.sampleRate == 16000)
      assert(got.samples.toSeq == pcm.toSeq, s"slope=$slope a=$a")
    }
  }

  test("IMA ADPCM sine roundtrip SNR exceeds 20 dB (the adaptive path)") {
    val n = 4000
    val sig = Array.tabulate[Short](n)(i =>
      (8000 * math.sin(2 * math.Pi * 440 * i / 8000)).toShort)
    val out = WavCodec.decode(WavCodec.encodeAdpcm(8000, sig)).get.samples
    assert(out.length == n)
    var sp = 0.0; var np = 0.0
    for (i <- 0 until n) {
      sp += sig(i).toDouble * sig(i)
      val e = out(i).toDouble - sig(i)
      np += e * e
    }
    val snr = 10 * math.log10(sp / np)
    assert(snr > 20, s"SNR $snr dB")
  }

  test("IMA ADPCM decode agrees with an independent straight-line reference on arbitrary codes") {
    // hand-build a 2-block tag-0x11 WAV with pseudo-random nibbles and
    // decode it BOTH with WavCodec and with a reference state machine
    // typed here directly from the IMA recommended practice
    val blockAlign = 16 // 25 samples per block
    val nib = (blockAlign - 4) * 2
    val codes = Array.tabulate(2 * nib)(i => (i * 7 + i * i * 3 + 5) % 16)
    val preds = Array(1234, -876)
    val idxs = Array(0, 37)
    val data = new Array[Byte](2 * blockAlign)
    for (b <- 0 to 1) {
      data(b * blockAlign) = (preds(b) & 0xff).toByte
      data(b * blockAlign + 1) = ((preds(b) >> 8) & 0xff).toByte
      data(b * blockAlign + 2) = idxs(b).toByte
      for (i <- 0 until nib) {
        val c = codes(b * nib + i)
        val pos = b * blockAlign + 4 + (i >> 1)
        if ((i & 1) == 0) data(pos) = (c & 0xf).toByte
        else data(pos) = (data(pos) | (c << 4)).toByte
      }
    }
    def le32(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val spb = (blockAlign - 4) * 2 + 1
    val wav = "RIFF".getBytes("US-ASCII") ++ le32(4 + 28 + 8 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(20) ++
      le16(0x11) ++ le16(1) ++ le32(8000) ++ le32(8000 * blockAlign / spb) ++
      le16(blockAlign) ++ le16(4) ++ le16(2) ++ le16(spb) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
    // reference: bit-serial diff accumulation per the published spec,
    // written as an index-walking loop independent of the codec
    val step = Vector(7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23,
      25, 28, 31, 34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107,
      118, 130, 143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371,
      408, 449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166,
      1282, 1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
      3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493,
      10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350, 22385,
      24623, 27086, 29794, 32767)
    val expect = scala.collection.mutable.ArrayBuffer[Short]()
    for (b <- 0 to 1) {
      var pred = preds(b)
      var ix = idxs(b)
      expect += pred.toShort
      for (i <- 0 until nib) {
        val c = codes(b * nib + i)
        val st = step(ix)
        var d = st >> 3
        for (bit <- 0 to 2) if ((c & (1 << bit)) != 0) d += st >> (2 - bit)
        pred += (if ((c & 8) != 0) -d else d)
        pred = math.max(-32768, math.min(32767, pred))
        ix = math.max(0, math.min(88, ix + Vector(-1, -1, -1, -1, 2, 4, 6, 8)(c & 7)))
        expect += pred.toShort
      }
    }
    val got = WavCodec.decode(wav).getOrElse(fail("hand-built ADPCM WAV must decode"))
    assert(got.samples.toSeq == expect.toSeq)
  }

  test("IMA ADPCM fact trims padding, tracks jumps, and rejects malformed streams") {
    // 60 samples at spb 57 -> 2 blocks, 54 pad nibbles trimmed by fact
    val pcm = Array.tabulate[Short](60)(i => (i * 11 - 300).toShort)
    val wav = WavCodec.encodeAdpcm(8000, pcm, blockAlign = 32)
    assert(WavCodec.decode(wav).get.samples.length == 60)
    // a 0 -> 20000 step: the index adaptation must climb to the jump
    // within a few dozen samples (step grows up to 8 indices/code)
    val jump = Array.tabulate[Short](200)(i => if (i < 50) 0 else 20000)
    val tracked = WavCodec.decode(WavCodec.encodeAdpcm(8000, jump)).get.samples
    assert((50 until 90).exists(i => tracked(i) > 15000), "adaptation must reach the jump")
    assert((150 until 200).forall(i => math.abs(tracked(i) - 20000) < 500),
      "steady state must re-converge")
    // malformed: truncated data, fact > capacity, bad samplesPerBlock,
    // bad header step index, data not block-aligned
    assert(WavCodec.decode(wav.dropRight(3)).isEmpty, "torn final block")
    val overFact = wav.clone()
    overFact(wav.indexOfSlice("fact".getBytes) + 8) = 200.toByte // 60 -> 200 > 114 cap
    assert(WavCodec.decode(overFact).isEmpty, "fact beyond capacity")
    val badSpb = wav.clone()
    badSpb(wav.indexOfSlice("fmt ".getBytes) + 8 + 18) = 56.toByte
    assert(WavCodec.decode(badSpb).isEmpty, "inconsistent samples/block")
    val badIdx = wav.clone()
    badIdx(wav.indexOfSlice("data".getBytes) + 8 + 2) = 90.toByte
    assert(WavCodec.decode(badIdx).isEmpty, "header step index > 88")
    // totality on garbage
    assert(WavCodec.decode(Array.tabulate[Byte](300)(i => (i * 37).toByte)).isEmpty)
  }

  test("mime sniff labels every magic family and routes it; text falls through") {
    import Multimodal._
    val cases: Seq[(Array[Byte], String, String)] = Seq(
      (MagicPng ++ "rest".getBytes("US-ASCII"), "image/png", "image"),
      (MagicJpeg ++ Array[Byte](0xe0.toByte), "image/jpeg", "image"),
      ("GIF87a".getBytes("US-ASCII"), "image/gif", "image"),
      ("GIF89a".getBytes("US-ASCII"), "image/gif", "image"),
      (MagicBmp ++ "xx".getBytes("US-ASCII"), "image/bmp", "image"),
      // RIFF size bytes are arbitrary — the sniff reads the four-cc at
      // offset 8, not the size
      (MagicRiff ++ Array[Byte](9, 8, 7, 6) ++ MagicWave, "audio/x-wav", "audio"),
      (MagicRiff ++ Array[Byte](0, 0, 0, 0) ++ "AVI ".getBytes("US-ASCII"),
        "application/octet-stream", "binary"),
      (MagicY4m ++ " W2 H2".getBytes("US-ASCII"), "video/x-yuv4mpeg", "video"),
      ("P6\n1 1\n255\n".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0),
        "image/x-portable-pixmap", "image"),
      (MagicId3 ++ "tag".getBytes("US-ASCII"), "audio/mpeg", "audio"),
      ("just words".getBytes("US-ASCII"), "text/plain", "text"),
      (Array.empty[Byte], "text/plain", "text"),
      // truncated below the magic length falls through, never errors
      (Array[Byte](0x89.toByte, 'P'), "text/plain", "text"),
      // honest ambiguity: text that OPENS with a magic sniffs as it
      ("BMW sales rose".getBytes("US-ASCII"), "image/bmp", "image"))
    import spark.implicits._
    val got = cases.zipWithIndex
      .map { case ((p, _, _), i) => (i, p) }.toDF("i", "payload")
      .select(col("i"), Multimodal.sniffMime(col("payload")).as("mime"))
      .withColumn("route", Multimodal.mimeRoute(col("mime")))
      .orderBy("i").collect()
    got.zip(cases).foreach { case (r, (_, wantMime, wantRoute)) =>
      assert(r.getString(1) == wantMime, s"case ${r.getInt(0)}: mime")
      assert(r.getString(2) == wantRoute, s"case ${r.getInt(0)}: route")
    }
  }

  test("m23: letterbox geometry is exact on odd aspect ratios and degenerate strips") {
    import SparkTest.spark.implicits._
    def ppm(w: Int, h: Int, v: Byte): Array[Byte] =
      PpmCodec.encode(w, h, Array.fill[Byte](w * h * 3)(v))
    // (payload, expected (out_w, out_h, pad_left, pad_top, mean)) at t=8;
    // mean = v · (w'·h')/64 exactly since all pixels share one value
    val cases = Seq(
      (1L, ppm(6, 3, 100), (8, 8, 0, 2, 100.0 * 8 * 4 / 64)),   // 6x3 -> 8x4
      (2L, ppm(3, 6, 100), (8, 8, 2, 0, 100.0 * 4 * 8 / 64)),   // tall: 3x6 -> 4x8
      (3L, ppm(5, 5, 60), (8, 8, 0, 0, 60.0)),                  // square fills
      (4L, ppm(32, 1, 80), (8, 8, 0, 3, 80.0 * 8 * 1 / 64)),    // extreme strip -> 8x1
      (5L, ppm(1, 1, 40), (8, 8, 0, 0, 40.0))                   // 1x1 -> 8x8 fill
    )
    val rows = graft.operators.Multimodal.letterboxImages(
        SparkTest.spark.createDataset(cases.map(c => (c._1, c._2))), t = 8)
      .collect().map(r => r.id ->
        ((r.out_w.get, r.out_h.get, r.pad_left.get, r.pad_top.get,
          r.mean_r.get))).toMap
    cases.foreach { case (id, _, want) =>
      assert(rows(id) == want, s"case $id: expected $want got ${rows(id)}")
    }
    // malformed payload -> the null row
    val nr = graft.operators.Multimodal.letterboxImages(
      SparkTest.spark.createDataset(Seq((9L, "nope".getBytes("US-ASCII")))), 8)
      .collect()
    assert(nr.length == 1 && nr(0).out_w.isEmpty && nr(0).mean_r.isEmpty)
  }

  test("m22: BT.601 conversion hits the published anchor colors exactly") {
    import SparkTest.spark.implicits._
    // hand-built 2x2 C420 frames: one flat (Y, U, V) triple per frame
    def vid(y: Int, u: Int, v: Int): Array[Byte] = {
      val frame = Array.fill[Byte](4)(y.toByte) ++
        Array[Byte](u.toByte) ++ Array[Byte](v.toByte)
      graft.operators.Y4mCodec.encode(2, 2, 25, 1, "420", Array(frame))
    }
    val cases = Seq(
      (0L, vid(16, 128, 128), (0.0, 0.0, 0.0)),     // video black
      (1L, vid(235, 128, 128), (255.0, 255.0, 255.0)), // video white
      (2L, vid(126, 128, 128), (128.0, 128.0, 128.0)), // mid gray: (298*110+128)>>8 = 128
      (3L, vid(81, 90, 240), (255.0, 0.0, 0.0)))     // BT.601 pure red
    val rows = Multimodal.decodeVideoRgb(
        SparkTest.spark.createDataset(cases.map(c => (c._1, c._2))))
      .collect().map(r => r.id -> ((r.mean_r.get, r.mean_g.get, r.mean_b.get)))
      .toMap
    cases.foreach { case (id, _, want) =>
      assert(rows(id) == want, s"case $id: expected $want got ${rows(id)}")
    }
    // non-420 colorspaces take the null row, not a garbage decode
    val mono = graft.operators.Y4mCodec.encode(2, 2, 25, 1, "mono",
      Array(Array.fill[Byte](4)(7)))
    val nr = Multimodal.decodeVideoRgb(
      SparkTest.spark.createDataset(Seq((9L, mono)))).collect()
    assert(nr.length == 1 && nr(0).frame_idx.isEmpty && nr(0).mean_r.isEmpty)
  }
}
