package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main. Each query is consumed through a `noop`-format write:
  * unlike `count()`, a write materializes EVERY output column (so
  * ColumnPruning cannot strip computed projections — the trap SURVEY §6d
  * documents) and, unlike an aggregate root, it keeps the final ORDER BY
  * in the executed plan, so sort cost is measured too.
  *
  * The suite runs at a second, smaller scale factor first: a query whose
  * time barely moves between SFs is dominated by fixed session overhead,
  * which separates overhead from scaling behavior in the report. The
  * JSON line goes to stdout (driver contract) AND `bench_out.json`,
  * because the driver's captured stdout tail truncated round 3's line.
  */
object Bench {
  /** The one consumption contract (also used by BenchOne, so the
    * isolated re-measure always measures the same thing). */
  private[graft] def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The one bench session recipe (shared with BenchOne). */
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }

  // adaptive min-of-N per query (2..5 runs): keep re-running while a
  // run still improves >20% on the best so far. Rationale, measured:
  // a heavy-codegen query landing while the C2 queue is saturated by
  // its predecessors times 20-30 s in-suite but 1.3-1.5 s warm
  // (BenchOne), and the slow slot FOLLOWS THE SUITE POSITION, not the
  // query (q38 under hash order, q53/q54 under sorted order) — a fixed
  // min-of-2 bakes that compilation backlog into whichever query sits
  // there. Converged queries still stop at 2 runs. A failing query
  // must abort the bench loudly — swallowing it would report a crash
  // as the fastest "time" in the suite.
  // sorted name order: Map hash order reshuffles whenever a query is
  // added, which both breaks cross-round per-query comparability and
  // moves the JIT warm-up sequence under every query; sorted is stable
  private def timeSuite(spark: SparkSession, sfDir: String): Map[String, Double] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        try consume(fn(spark, sfDir)) catch {
          case e: Throwable =>
            System.err.println(s"[bench] query $name failed at $sfDir")
            throw e
        }
        (System.nanoTime() - t0) / 1e9
      }
      var best = once()
      var runs = 1
      var improving = true
      // keep running while improving OR while the best is still over
      // the backlog threshold: a PERSISTENT C2 backlog produces two
      // similar slow runs (e.g. 25 s then 23 s — "not improving"),
      // which the improvement test alone would accept as converged;
      // nearly every warm query in this suite is < 2 s, so a > 5 s
      // best buys the compiler more runs to catch up before we record
      // it. A genuinely slow query pays at most 5 runs.
      while (runs < 5 && (improving || best > 5.0)) {
        val t = once()
        improving = t < best * 0.8
        if (t < best) best = t
        runs += 1
      }
      name -> best
    }.toMap

  private def js(m: Map[String, Double]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = session()
    // generic JIT/codegen warmup so the first measured query doesn't
    // absorb JVM start (no query results are precomputed)
    spark.range(1000000).selectExpr("sum(id * 2) AS s").collect()
    spark.read.parquet(s"$sfDir/nation.parquet").count()

    // the secondary pass must be strictly SMALLER than the primary (the
    // overhead-floor inference depends on it); an unrecognized custom
    // sfDir gets no secondary rather than an unrelated hardcoded one
    val sfNorm = sfDir.stripSuffix("/")
    val smallDir =
      if (sfNorm.endsWith("sf0.1")) Some(s"${sfNorm.stripSuffix("sf0.1")}sf0.01")
      else if (sfNorm.endsWith("sf0.01")) Some(s"${sfNorm.stripSuffix("sf0.01")}sf0.001")
      else None
    val small = smallDir match {
      case Some(dir) if Files.isDirectory(Paths.get(dir)) => timeSuite(spark, dir)
      case _ =>
        System.err.println(s"[bench] no smaller secondary SF for $sfDir — single-SF run")
        Map.empty[String, Double]
    }

    val results = timeSuite(spark, sfDir)
    val total = results.values.sum
    val extra =
      if (small.isEmpty) ""
      else s""","sf_small":"${smallDir.get}","total_small":${small.values.sum},"queries_small":${js(small)}"""
    val line =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${js(results)},"sf":"$sfDir"$extra}"""
    println(line)
    Files.write(Paths.get("bench_out.json"),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
