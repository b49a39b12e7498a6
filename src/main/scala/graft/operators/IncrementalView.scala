package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * manifest-aware (incl. across `optimize` via rewrite lineage), one
  * maintenance step costs the files the epochs TOUCHED, never a
  * recompute over the table — the posture that keeps a 100 TB table's
  * rollups fresh for the cost of the day's changes.
  *
  * AGGREGATE SURFACE — the decomposable core: `count(*)` (always
  * maintained as `n_rows`), any number of `sum` columns, and `avg`
  * (derived as its sum over `n_rows` at READ time — no extra state).
  * `min`/`max` are REJECTED, not approximated: they are not
  * decomposable under deletes (removing the current minimum forces a
  * full re-scan of the group — the classic IVM seam), so asking for
  * them raises with that explanation instead of silently serving a
  * stale bound.
  *
  * MV state is itself versioned-by-manifest-number: each maintenance
  * publishes `mvDir/v=<upstreamVersion>` with a `_DONE` marker;
  * readers resolve the highest COMPLETE version, so a torn maintain
  * (crash mid-write: no marker) is invisible and the next call redoes
  * the same deterministic delta from the last complete watermark —
  * the idempotentParquetSink argument at the view layer. Sums live at
  * the PROMOTED precision DECIMAL(38,4) in state: narrowing back to
  * the input precision after each delta apply would overflow-throw
  * under ANSI (wedging the maintenance loop) or NULL-then-zero
  * silently with ANSI off; the one double conversion belongs to the
  * consumer, never the state.
  */
object IncrementalView {

  private val VDirRe = """v=(\d+)""".r
  private val StateDec = DecimalType(38, 4)

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

  /** The maintained state as stored: (groupCol, n_rows, one
    * DECIMAL(38,4) column per maintained sum) as of the current
    * complete MV version. */
  def read(spark: SparkSession, mvDir: String): DataFrame = {
    val v = currentVersion(spark, mvDir)
    require(v >= 0, s"no complete MV state under $mvDir")
    spark.read.parquet(s"$mvDir/v=$v")
  }

  /** The state plus the DERIVED averages the `avg` aggs requested:
    * `avg_<c>` = `sum_<c>` (as double) / `n_rows` — double division
    * of the exact decimal sum, the one conversion that belongs to the
    * consumer. Zero-count groups were already dropped by maintenance,
    * so the division is total. */
  def readAggs(spark: SparkSession, mvDir: String,
               aggs: Seq[(String, String)]): DataFrame = {
    validateAggs(aggs)
    val state = read(spark, mvDir)
    aggs.collect { case ("avg", c) => c }.distinct.foldLeft(state)((df, c) =>
      df.withColumn(s"avg_$c",
        col(s"sum_$c").cast("double") / col("n_rows")))
  }

  private def validateAggs(aggs: Seq[(String, String)]): Unit =
    aggs.foreach {
      case ("sum", _) | ("avg", _) => ()
      case (op @ ("min" | "max"), c) =>
        throw new IllegalArgumentException(
          s"$op($c) is not decomposable under deletes: removing the current " +
            s"$op forces a full re-scan of its group, so it cannot be " +
            "maintained from the change feed — recompute it, or keep a " +
            "sorted-structure sidecar outside this operator")
      case (op, c) =>
        throw new IllegalArgumentException(
          s"unsupported aggregate $op($c): maintainAggs supports sum and avg " +
            "(count(*) is always maintained as n_rows)")
    }

  /** Distinct source columns whose running DECIMAL(38,4) sums the
    * requested aggs need in state (avg rides its sum + n_rows). */
  private def sumCols(aggs: Seq[(String, String)]): Seq[String] =
    aggs.map(_._2).distinct

  /** Legacy single-sum surface (state column named `sum_val`): kept
    * for the §2d sinks; [[maintainAggs]] is the general form. */
  def maintain(spark: SparkSession, tablePath: String, mvDir: String,
               key: String, groupCol: String, sumCol: String): Int =
    maintainNamed(spark, tablePath, mvDir, key, groupCol,
      Seq("sum_val" -> sumCol), -1)

  /** Advance the MV to the upstream table's latest retained version
    * (or an explicit retained `toVersion` — bounded catch-up). First
    * call seeds from the full target snapshot (the one unavoidable
    * full pass); every later call applies only
    * `MergeTable.changes(applied, target)`. `aggs` are (op, column)
    * pairs, op ∈ sum | avg — see the aggregate-surface contract
    * above. Returns the upstream version the MV now reflects (no-op
    * when already current). Single-maintainer, like the table-format
    * maintenance ops. */
  def maintainAggs(spark: SparkSession, tablePath: String, mvDir: String,
                   key: String, groupCol: String,
                   aggs: Seq[(String, String)],
                   toVersion: Int = -1): Int = {
    validateAggs(aggs)
    maintainNamed(spark, tablePath, mvDir, key, groupCol,
      sumCols(aggs).map(c => s"sum_$c" -> c), toVersion)
  }

  // ---- MV state AS a MergeTable (snapshot isolation + CDF on the
  // rollup itself) -------------------------------------------------
  //
  // The parquet-dir state above is the minimal shape; maintainTable
  // stores the SAME maintained aggregate in a [[MergeTable]] keyed by
  // an encoded group key, so the rollup inherits the table layer
  // wholesale: snapshot isolation (a reader never sees a half-applied
  // maintenance step), time travel over rollup history, point lookups
  // by group through the string-range probe, and ITS OWN change feed
  // (`MergeTable.changes` on the MV table answers "which rollup rows
  // moved this epoch" — the second-order CDF a downstream alert or
  // cache invalidation consumes). The upstream WATERMARK rides as a
  // SENTINEL ROW (`__g_key = "W"`, carrying the applied version in
  // `__w`) upserted in the SAME applyBatch commit as the group
  // changes — state and watermark are atomic by construction, so a
  // torn maintain is impossible rather than merely detectable (the
  // `_DONE`-marker dance the parquet-dir variant needs).
  //
  // Group keys encode as "N" (NULL group) / "V" + canonical string —
  // non-null and unique per version, as the tracked key requires.
  // PRECONDITION (documented, not checked): distinct group values
  // must render distinct strings — true for the atomic types a
  // GROUP BY key can be.

  private val WatermarkKey = "W"

  private def gKey(groupCol: String): Column =
    when(col(groupCol).isNull, lit("N"))
      .otherwise(concat(lit("V"), col(groupCol).cast("string")))

  /** Upstream version the MV table currently reflects, or -1. One
    * candidate-file point lookup (the sentinel row), never a scan. */
  def appliedVersion(spark: SparkSession, mvTablePath: String): Int = {
    import spark.implicits._
    if (MergeTable.latestVersion(spark, mvTablePath) < 0) -1
    else MergeTable.readKeys(spark, mvTablePath,
      Seq(WatermarkKey).toDF("__g_key"), "__g_key")
      .select(col("__w")).collect()
      .headOption.map(_.getLong(0).toInt).getOrElse(-1)
  }

  /** The maintained rollup from the MV table's LATEST snapshot (or a
    * retained `version` — the rollup's own time travel), internals
    * (sentinel row, encoded key, watermark column) stripped. */
  def readTable(spark: SparkSession, mvTablePath: String,
                version: Int = -1): DataFrame =
    MergeTable.read(spark, mvTablePath, version)
      .filter(col("__g_key") =!= WatermarkKey)
      .drop("__g_key", "__w")

  /** [[maintainAggs]] with the state in a [[MergeTable]] at
    * `mvTablePath` (same aggregate surface and rejection rules; same
    * seeding, delta and reseed-after-vacuum semantics). Each
    * maintenance step lands as ONE applyBatch commit: changed groups
    * upsert, emptied groups delete, untouched groups' files CARRY BY
    * NAME (the rollup's own COW pruning), and the new watermark
    * commits atomically with them. Returns the upstream version the
    * MV now reflects. */
  def maintainTable(spark: SparkSession, tablePath: String,
                    mvTablePath: String, key: String, groupCol: String,
                    aggs: Seq[(String, String)],
                    toVersion: Int = -1): Int = {
    import spark.implicits._
    validateAggs(aggs)
    val sums = sumCols(aggs).map(c => s"sum_$c" -> c)
    val retained = MergeTable.retainedVersions(spark, tablePath)
    require(retained.nonEmpty, s"no MergeTable at $tablePath")
    val target =
      if (toVersion < 0) retained.last
      else {
        require(retained.contains(toVersion),
          s"version $toVersion not retained (have ${retained.mkString(",")})")
        toVersion
      }
    val exists = MergeTable.latestVersion(spark, mvTablePath) >= 0
    val watermark = if (exists) appliedVersion(spark, mvTablePath) else -1
    val applied = if (watermark >= 0 && !retained.contains(watermark)) -1
                  else watermark
    if (applied >= target) return applied

    val stateCols = Seq(col("__g_key"), col(groupCol), col("n_rows")) ++
      sums.map { case (n, _) => col(n) } :+ col("__w")
    val groupType =
      MergeTable.read(spark, tablePath, target).schema(groupCol).dataType
    def fullState(df: DataFrame): DataFrame =
      df.groupBy(groupCol)
        .agg(count(lit(1)).as("n_rows"),
          sums.map { case (n, c) => sum(col(c).cast(StateDec))
            .cast(StateDec).as(n) }: _*)
        .withColumn("__g_key", gKey(groupCol))
        .withColumn("__w", lit(null).cast("long"))
    // the watermark row: committed in the SAME applyBatch as the
    // group changes, so state and watermark can never tear apart
    val sentinel: DataFrame =
      spark.range(1).select(
        lit(WatermarkKey).as("__g_key") +:
          lit(null).cast(groupType).as(groupCol) +:
          lit(0L).as("n_rows") +:
          sums.map { case (n, _) => lit(0).cast(StateDec).as(n) } :+
          lit(target.toLong).as("__w"): _*)

    if (applied < 0) {
      val seed = fullState(MergeTable.read(spark, tablePath, target))
        .select(stateCols: _*)
      val ups = seed.unionByName(sentinel)
      if (!exists)
        MergeTable.create(ups, mvTablePath, statsCol = Some("__g_key"))
      else {
        // reseed after an upstream vacuum: replace content wholesale —
        // groups gone from the new seed delete, the rest upsert
        val dels = MergeTable.read(spark, mvTablePath).select("__g_key")
          .filter(col("__g_key") =!= WatermarkKey)
          .join(seed.select("__g_key"), Seq("__g_key"), "left_anti")
        MergeTable.applyBatch(spark, mvTablePath, ups, dels, "__g_key")
      }
    } else {
      val sgn = when(
        col("_change_type").isin("insert", "update_postimage"), 1L)
        .otherwise(-1L)
      val d = MergeTable.changes(spark, tablePath, applied, target, key)
        .withColumn("__sgn", sgn)
        .groupBy(gKey(groupCol).as("__g_key"), col(groupCol).as("__dg"))
        .agg(sum(col("__sgn")).as("__d_n"),
          sums.map { case (n, c) =>
            val v = col(c).cast(StateDec)
            sum(when(col("__sgn") === 1L, v).otherwise(-v))
              .cast(StateDec).as(s"__d_$n")
          }: _*)
      // prior rows of ONLY the affected groups: the table's own
      // point-lookup probe — maintenance never scans the rollup
      val prev = MergeTable.readKeys(spark, mvTablePath,
        d.select("__g_key"), "__g_key")
        .select(col("__g_key") +: (("n_rows" +: sums.map(_._1))
          .map(n => col(n).as(s"__p_$n"))): _*)
      val joined = d.join(prev, Seq("__g_key"), "left_outer")
        .select(col("__g_key") +: col("__dg").as(groupCol) +:
          ((coalesce(col("__p_n_rows"), lit(0L)) + col("__d_n")).as("n_rows") +:
            sums.map { case (n, _) =>
              (coalesce(col(s"__p_$n"), lit(0).cast(StateDec)) +
                coalesce(col(s"__d_$n"), lit(0).cast(StateDec)))
                .cast(StateDec).as(n)
            }): _*)
        .withColumn("__w", lit(null).cast("long"))
        .persist()
      try {
        val ups = joined.filter(col("n_rows") > 0L).select(stateCols: _*)
          .unionByName(sentinel)
        val dels = joined.filter(col("n_rows") <= 0L).select("__g_key")
        MergeTable.applyBatch(spark, mvTablePath, ups, dels, "__g_key")
      } finally joined.unpersist()
    }
    target
  }

  /** The maintenance core over explicit (stateName, srcCol) sums. */
  private def maintainNamed(spark: SparkSession, tablePath: String,
                            mvDir: String, key: String, groupCol: String,
                            sums: Seq[(String, String)],
                            toVersion: Int): Int = {
    val retained = MergeTable.retainedVersions(spark, tablePath)
    require(retained.nonEmpty, s"no MergeTable at $tablePath")
    val target =
      if (toVersion < 0) retained.last
      else {
        require(retained.contains(toVersion),
          s"version $toVersion not retained (have ${retained.mkString(",")})")
        toVersion
      }
    // a watermark pointing at a vacuumed version cannot delta-apply —
    // reseed from the full target snapshot instead of wedging the
    // maintenance loop forever (the one legitimate reseed after init)
    val watermark = currentVersion(spark, mvDir)
    val applied = if (watermark >= 0 && !retained.contains(watermark)) -1
                  else watermark
    if (applied >= target) applied
    else {
      def grouped(df: DataFrame, nameOf: String => String): DataFrame =
        df.groupBy(groupCol)
          .agg(count(lit(1)).as(nameOf("n_rows")),
            sums.map { case (n, c) => sum(col(c).cast(StateDec))
              .cast(StateDec).as(nameOf(n)) }: _*)
      val next =
        if (applied < 0)
          grouped(MergeTable.read(spark, tablePath, target), identity)
        else {
          val prev = read(spark, mvDir)
            .select(col(groupCol).as("__g0") +:
              ("n_rows" +: sums.map(_._1)).map(n => col(n).as(s"__p_$n")): _*)
          // signed delta rule; negation (not multiplication) keeps
          // the decimal type at the promoted state precision
          val sgn = when(
            col("_change_type").isin("insert", "update_postimage"), 1L)
            .otherwise(-1L)
          val d = MergeTable.changes(spark, tablePath, applied, target, key)
            .withColumn("__sgn", sgn)
            .groupBy(col(groupCol).as("__g1"))
            .agg(sum(col("__sgn")).as("__d_n_rows"),
              sums.map { case (n, c) =>
                val v = col(c).cast(StateDec)
                sum(when(col("__sgn") === 1L, v).otherwise(-v))
                  .cast(StateDec).as(s"__d_$n")
              }: _*)
          def applyDelta(n: String, zero: Column): Column =
            coalesce(col(s"__p_$n"), zero) + coalesce(col(s"__d_$n"), zero)
          // null-safe group alignment: a NULL group is one group, not
          // a never-matching pair of rows (plain equi-join would emit
          // a duplicate NULL-group row per epoch)
          prev.join(d, col("__g0") <=> col("__g1"), "full_outer")
            .select(coalesce(col("__g0"), col("__g1")).as(groupCol) +:
              applyDelta("n_rows", lit(0L)).as("n_rows") +:
              sums.map { case (n, _) =>
                applyDelta(n, lit(0).cast(StateDec)).cast(StateDec).as(n)
              }: _*)
            .filter(col("n_rows") > 0L)
        }
      val out = s"$mvDir/v=$target"
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
      target
    }
  }
}
