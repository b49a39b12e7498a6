package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Binary PPM (P6) image codec — pure JVM, no external libraries. PPM
  * is a real, widely-supported image format (header `P6\n<w> <h>\n255\n`
  * + raw interleaved RGB bytes), which makes the multimodal decode path
  * REAL in this container: parse, dimensions, channel statistics and
  * box resize all operate on actual pixel data. Compressed formats
  * (JPEG/PNG/video) still need an external codec — that seam stays in
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

/** Multimodal-column plumbing (SURVEY §2c `m1_binary_meta`,
  * `m2_image_decode`).
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
  def decodeImages(media: Dataset[(Long, Array[Byte])]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.map { case (id, payload) =>
        val len = if (payload == null) 0 else payload.length
        PpmCodec.decode(payload) match {
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
