package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTest._

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
}
