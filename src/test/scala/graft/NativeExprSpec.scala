package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Native, Vectors}
import graft.operators.Dedup
import graft.sources.Tables

class NativeExprSpec extends AnyFunSuite {
  import SparkTest._

  test("native WordShingles equals the composed formulation") {
    val docs = Tables.table(spark, sf, "documents").limit(200)
    val native = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val composed = docs.select(col("doc_id"),
      Dedup.shinglesComposed(col("text"), 3).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == composed)
  }

  test("WordShingles handles short token arrays") {
    import spark.implicits._
    val df = Seq("one two", "single", "a b c d").toDF("text")
    val out = df.select(Dedup.shingles(col("text"), 3)).collect()
      .map(_.getSeq[String](0).toSeq)
    assert(out(0) == Seq("one two"))
    assert(out(1) == Seq("single"))
    assert(out(2) == Seq("a b c", "b c d"))
  }

  test("native CosineSim is bit-identical to the composed double fold") {
    val emb = Tables.table(spark, sf, "embeddings").limit(100)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
    val diff = pairs.select(
      Vectors.cosine(col("a.embedding"), col("b.embedding")).as("n"),
      Vectors.cosineComposed(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(diff == 0)
  }

  test("native LshBuckets matches per-table composed buckets") {
    val planes = Vectors.randomPlanes(8, 64)
    val emb = Tables.table(spark, sf, "embeddings").limit(50)
    val native = emb.select(col("vec_id"),
      Native.lshBuckets(col("embedding"), planes, 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = emb.select(col("vec_id"),
      array(
        Vectors.lshBucket(col("embedding"), planes.slice(0, 4)),
        Vectors.lshBucket(col("embedding"), planes.slice(4, 8))).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == composed)
  }
}
