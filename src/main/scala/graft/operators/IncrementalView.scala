package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.MergeTable

/** A MAINTAINED AGGREGATE VIEW over a [[MergeTable]] — the q77 IVM
  * rule packaged as a stateful operator, closing the CDC loop the §2d
  * pipelines open: `mergeApplySink` lands change records in the table,
  * [[maintain]] advances a downstream grouped aggregate by applying
  * ONLY the change feed since the last maintained upstream version
  * (signed delta rule: insert/update_postimage credit, delete/
  * update_preimage debit; a group-key flip debits the old group and
  * credits the new; zero-count groups drop). Because the feed is
  * manifest-aware, one maintenance step costs the files the epochs
  * TOUCHED, never a recompute over the table — the posture that keeps
  * a 100 TB table's rollups fresh for the cost of the day's changes.
  *
  * MV state is itself versioned-by-manifest-number: each maintenance
  * publishes `mvDir/v=<upstreamVersion>` with a `_DONE` marker;
  * readers resolve the highest COMPLETE version, so a torn maintain
  * (crash mid-write: no marker) is invisible and the next call redoes
  * the same deterministic delta from the last complete watermark —
  * the idempotentParquetSink argument at the view layer. Sums apply
  * as DECIMAL(20,4) (exact addition; one double conversion belongs to
  * the consumer, never the state — repeated decimal→double→decimal
  * roundtrips would accumulate drift across maintenance steps).
  */
object IncrementalView {

  private val VDirRe = """v=(\d+)""".r

  /** Upstream version the current complete MV state reflects, or -1. */
  def currentVersion(spark: SparkSession, mvDir: String): Int = {
    val dir = new Path(mvDir)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    Option(fs.globStatus(new Path(dir, "v=*")))
      .getOrElse(Array.empty).toSeq
      .flatMap(st => st.getPath.getName match {
        case VDirRe(n) if fs.exists(new Path(st.getPath, "_DONE")) => Some(n.toInt)
        case _ => None
      }).sorted.lastOption.getOrElse(-1)
  }

  /** The maintained aggregate: (groupCol, n_rows, sum DECIMAL(20,4))
    * as of the current complete MV version. */
  def read(spark: SparkSession, mvDir: String): DataFrame = {
    val v = currentVersion(spark, mvDir)
    require(v >= 0, s"no complete MV state under $mvDir")
    spark.read.parquet(s"$mvDir/v=$v")
  }

  private def aggregate(df: DataFrame, groupCol: String, sumCol: String): DataFrame =
    df.groupBy(groupCol)
      .agg(count(lit(1)).as("n_rows"),
        sum(col(sumCol).cast(DecimalType(20, 4))).cast(DecimalType(20, 4))
          .as("sum_val"))

  /** Advance the MV to the upstream table's latest version. First call
    * seeds from the full latest snapshot (the one unavoidable full
    * pass); every later call applies only `MergeTable.changes(applied,
    * latest)`. Returns the upstream version the MV now reflects
    * (no-op when already current). Single-maintainer, like the
    * table-format maintenance ops. */
  def maintain(spark: SparkSession, tablePath: String, mvDir: String,
               key: String, groupCol: String, sumCol: String): Int = {
    val latest = MergeTable.latestVersion(spark, tablePath)
    require(latest >= 0, s"no MergeTable at $tablePath")
    // a watermark pointing at a vacuumed version cannot delta-apply —
    // reseed from the full latest snapshot instead of wedging the
    // maintenance loop forever (the one legitimate reseed after init)
    val watermark = currentVersion(spark, mvDir)
    val applied =
      if (watermark >= 0 &&
        !MergeTable.retainedVersions(spark, tablePath).contains(watermark)) -1
      else watermark
    if (applied >= latest) applied
    else {
      val next =
        if (applied < 0)
          aggregate(MergeTable.read(spark, tablePath, latest), groupCol, sumCol)
        else {
          val prev = read(spark, mvDir)
            .select(col(groupCol).as("__g0"), col("n_rows").as("__n0"),
              col("sum_val").as("__s0"))
          val d = MergeTable.changes(spark, tablePath, applied, latest, key)
            .withColumn("__sgn",
              when(col("_change_type").isin("insert", "update_postimage"), 1L)
                .otherwise(-1L))
            .groupBy(col(groupCol).as("__g1"))
            .agg(sum(col("__sgn")).as("__dn"),
              sum((col(sumCol).cast(DecimalType(20, 4)) * col("__sgn"))
                .cast(DecimalType(20, 4))).as("__ds"))
          // null-safe group alignment: a NULL group is one group, not
          // a never-matching pair of rows (plain equi-join would emit
          // a duplicate NULL-group row per epoch)
          prev.join(d, col("__g0") <=> col("__g1"), "full_outer")
            .select(coalesce(col("__g0"), col("__g1")).as(groupCol),
              (coalesce(col("__n0"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
                .as("n_rows"),
              (coalesce(col("__s0"), lit(0).cast(DecimalType(20, 4))) +
                coalesce(col("__ds"), lit(0).cast(DecimalType(20, 4))))
                .cast(DecimalType(20, 4)).as("sum_val"))
            .filter(col("n_rows") > 0L)
        }
      val out = s"$mvDir/v=$latest"
      next.write.mode("overwrite").parquet(out)
      val fs = new Path(mvDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.create(new Path(out, "_DONE"), true).close()
      // retire superseded states, KEEPING the previous complete one:
      // if this publish later turns out torn (marker lost with the
      // dir), the survivor is the watermark the redo delta-applies
      // from — without it a torn latest would force a full reseed
      val complete = Option(fs.globStatus(new Path(new Path(mvDir), "v=*")))
        .getOrElse(Array.empty).toSeq
        .filter(st => fs.exists(new Path(st.getPath, "_DONE")))
        .flatMap(st => st.getPath.getName match {
          case VDirRe(n) => Some(n.toInt); case _ => None
        }).sorted
      val keep = complete.takeRight(2).map(v => s"v=$v").toSet
      Option(fs.globStatus(new Path(new Path(mvDir), "v=*")))
        .getOrElse(Array.empty)
        .filterNot(st => keep.contains(st.getPath.getName))
        .foreach(st => fs.delete(st.getPath, true))
      latest
    }
  }
}
