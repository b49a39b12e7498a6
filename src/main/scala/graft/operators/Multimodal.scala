package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2c `m1_binary_meta`).
  *
  * Contract: media rides as an opaque `binary` column plus typed
  * metadata; decode/feature-extraction runs per-partition so a real
  * decoder amortizes model/codec setup across a batch (the same batch
  * shape a vectorized/Arrow UDF would see). This container has no
  * image/audio libraries, so `decodeFrame` is a DETERMINISTIC STUB —
  * the schema, the partition-level batching, and the pipeline wiring
  * are the real, tested surface; swap `decodeFrame`'s body for an
  * actual codec to productionize.
  */
object Multimodal {

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
