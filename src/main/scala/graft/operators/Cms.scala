package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Native

/** Count-Min sketch over the engine-portable polyHash family — ONE
  * definition of the geometry (width, depth, row constants) shared by
  * the q61 batch query, its SQL oracle generator, and the streaming
  * sketch sink, so the three can never diverge.
  *
  * Why CMS at 100 TB: the (depth × width) cell table is KB-sized and
  * MERGEABLE — cells add, so per-partition partial aggs combine
  * map-side, per-batch sketches union by cell sum, and a fleet of
  * ingest streams each maintain a shard sketch that merges into the
  * global one with no key-space shuffle at all. Estimates carry the
  * classic one-sided guarantee: never under, over by at most the
  * collision mass.
  */
object Cms {

  /** polyHash modulus (the repo-wide portable-hash prime). */
  val P: Long = 2038074743L

  /** Cells per row; 3 rows of 1024 — KB-scale, broadcastable. */
  val Width = 1024

  /** (row index, multiplier, offset) — embedded in the SQL oracle. */
  val Rows: Seq[(Int, Long, Long)] = Seq((0, 17L, 3L), (1, 131L, 7L), (2, 523L, 11L))

  private def bucket(hv: Column, a: Long, b: Long): Column =
    pmod(hv * lit(a) + lit(b), lit(P)) % Width

  private def bucketsOf(keyCol: String) = {
    val h = Native.polyHash(col(keyCol), P)
    array(Rows.map { case (_, a, b) => bucket(h, a, b) }: _*)
  }

  /** One pass over `keyCol`: the (i, bucket, cnt) cell table. Partial
    * aggs combine map-side; the output is ≤ depth·width rows. */
  def cells(df: DataFrame, keyCol: String): DataFrame =
    df.select(posexplode(bucketsOf(keyCol)).as(Seq("i", "bucket")))
      .groupBy("i", "bucket").agg(count(lit(1)).as("cnt"))

  /** Min-of-rows estimates for every row of `keys` (which must carry
    * `keyCol`; other columns pass through the group-by). The sketch
    * side broadcasts. LEFT join + coalesce(cnt, 0): a sparse sketch
    * stores no row for an empty cell, so a never-inserted key must
    * estimate 0 (not vanish from the output), and a key missing one
    * of its cells must take the true minimum (0), not the min over
    * the surviving cells. */
  def estimates(sketch: DataFrame, keys: DataFrame, keyCol: String): DataFrame = {
    val carry = keys.columns.toSeq
    keys
      .select(carry.map(col) :+ posexplode(bucketsOf(keyCol)).as(Seq("i", "bucket")): _*)
      .join(broadcast(sketch), Seq("i", "bucket"), "left")
      .groupBy(carry.map(col): _*)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est_cnt"))
  }

  /** Merge every per-batch cell table under `path` (the streaming
    * sink's layout) into one sketch: cells ADD — the mergeability
    * that makes sketch maintenance shuffle-free. */
  def readMergedSketch(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .groupBy("i", "bucket").agg(sum(col("cnt")).as("cnt"))
}
