package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalView
import graft.sources.MergeTable

class IncrementalViewSpec extends AnyFunSuite {
  import SparkTest._

  private def direct(path: String): Map[String, (Long, String)] =
    MergeTable.read(spark, path)
      .groupBy("grp").agg(count(lit(1)), sum(col("amt").cast("decimal(20,4)")))
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString)).toMap

  private def mv(mvDir: String): Map[String, (Long, String)] =
    IncrementalView.read(spark, mvDir).collect()
      .map(r => r.getAs[String]("grp") ->
        (r.getAs[Long]("n_rows"),
          r.getAs[java.math.BigDecimal]("sum_val")
            .stripTrailingZeros.toPlainString)).toMap

  test("maintained MV equals the direct aggregate across merge/delete epochs") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivm").toString
    val path = s"$root/table"; val mvDir = s"$root/mv"
    val base = (0L until 30L).map(k => (k, if (k % 3 == 0) "a" else "b", k * 1.5))
      .toDF("id", "grp", "amt").repartitionByRange(3, col("id"))
    MergeTable.create(base, path, statsCol = Some("id"))
    // seed pass: the one full snapshot read
    assert(IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt") == 0)
    assert(mv(mvDir) == direct(path))
    // epoch 1: upsert incl. a GROUP FLIP (id 3 moves a -> b) + inserts
    MergeTable.merge(spark, path,
      Seq((3L, "b", 100.25), (50L, "c", 7.0), (51L, "c", 8.0))
        .toDF("id", "grp", "amt"), "id")
    // epoch 2: delete one key from each of two groups
    MergeTable.deleteKeys(spark, path, Seq(1L, 6L).toDF("id"), "id")
    val v = IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    assert(v == MergeTable.latestVersion(spark, path))
    assert(mv(mvDir) == direct(path),
      "delta-maintained state must equal the recompute")
    // already current: no-op
    assert(IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt") == v)
    // a group emptied by deletes must DROP from the MV
    MergeTable.deleteKeys(spark, path, Seq(50L, 51L).toDF("id"), "id")
    IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    assert(!mv(mvDir).contains("c") && mv(mvDir) == direct(path))
  }

  test("NULL group keys stay ONE group across epochs (null-safe alignment)") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivm_null").toString
    val path = s"$root/table"; val mvDir = s"$root/mv"
    val base = Seq((1L, Some("x"), 1.5), (2L, Option.empty[String], 2.0),
      (3L, Option.empty[String], 3.0)).toDF("id", "grp", "amt")
    MergeTable.create(base, path, statsCol = Some("id"))
    IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    // epochs that touch the NULL group: update + insert
    MergeTable.merge(spark, path,
      Seq((2L, Option.empty[String], 9.0), (4L, Option.empty[String], 1.0))
        .toDF("id", "grp", "amt"), "id")
    IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    val rows = IncrementalView.read(spark, mvDir).collect()
      .filter(_.isNullAt(0))
    assert(rows.length == 1,
      s"the NULL group must stay ONE row, got ${rows.length}")
    assert(mv(mvDir) == direct(path))
  }

  test("a vacuumed watermark reseeds from the latest snapshot, never wedges") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivm_vac").toString
    val path = s"$root/table"; val mvDir = s"$root/mv"
    val base = (0L until 10L).map(k => (k, if (k < 5) "x" else "y", k * 1.0))
      .toDF("id", "grp", "amt")
    MergeTable.create(base, path, statsCol = Some("id"))
    IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    MergeTable.merge(spark, path,
      Seq((2L, "y", 8.0)).toDF("id", "grp", "amt"), "id")
    MergeTable.merge(spark, path,
      Seq((20L, "z", 4.0)).toDF("id", "grp", "amt"), "id")
    // the maintainer drops every version the MV has seen
    MergeTable.vacuum(spark, path, keepVersions = 1, minAgeMs = 0L)
    val v = IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    assert(v == MergeTable.latestVersion(spark, path))
    assert(mv(mvDir) == direct(path),
      "the reseed from the retained snapshot must restore exact state")
  }

  test("a torn maintain (no _DONE marker) is invisible and redone") {
    import spark.implicits._
    val root = Files.createTempDirectory("ivm_torn").toString
    val path = s"$root/table"; val mvDir = s"$root/mv"
    val base = (0L until 10L).map(k => (k, if (k < 5) "x" else "y", k * 2.0))
      .toDF("id", "grp", "amt")
    MergeTable.create(base, path, statsCol = Some("id"))
    IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    MergeTable.merge(spark, path,
      Seq((2L, "y", 9.5)).toDF("id", "grp", "amt"), "id")
    val v = IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt")
    // manufacture the torn write: drop the marker of the latest state
    val fs = new org.apache.hadoop.fs.Path(mvDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$mvDir/v=$v/_DONE"), false)
    assert(IncrementalView.currentVersion(spark, mvDir) < v,
      "an unmarked state must be invisible")
    // the redo from the last complete watermark restores it exactly
    assert(IncrementalView.maintain(spark, path, mvDir, "id", "grp", "amt") == v)
    assert(mv(mvDir) == direct(path))
  }
}
