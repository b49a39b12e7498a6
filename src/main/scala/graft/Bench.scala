package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.GraftSparkBridge
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
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
  *
  * Every timed run also samples TaskMetrics (a bus-drained listener):
  * the per-query peak task execution memory and total spill bytes ride
  * into the JSON, so the no-driver-state / bounded-executor-state
  * posture of the sketch- and buffer-heavy rows is recorded evidence,
  * not argument.
  */
object Bench {
  /** The one consumption contract (also used by BenchOne, so the
    * isolated re-measure always measures the same thing). */
  private[graft] def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Per-query TaskMetrics accumulator: peak task execution memory
    * (max over tasks — the executor-state bound) and total spill
    * bytes (memory+disk). Reset per timed run; read only after the
    * listener bus drains. */
  private[graft] final class MetricsListener extends SparkListener {
    private val peak = new AtomicLong(0)
    private val spill = new AtomicLong(0)
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      val m = e.taskMetrics
      if (m != null) {
        var p = peak.get()
        while (m.peakExecutionMemory > p &&
          !peak.compareAndSet(p, m.peakExecutionMemory)) p = peak.get()
        spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    }
    def reset(): Unit = { peak.set(0); spill.set(0) }
    def snapshot(): (Long, Long) = (peak.get(), spill.get())
  }

  private val listener = new MetricsListener

  /** The one bench session recipe (shared with BenchOne). */
  private[graft] def session(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // codegen-fallback gate: a query that falls out of whole-stage
      // codegen (Janino compile failure — the JIT cliff SURVEY §6c
      // tracks) must ABORT the bench, not silently run interpreted and
      // report a mystery 50× row. Fallback count = 0 is asserted by
      // construction; the JSON line records the gate was armed.
      .config("spark.sql.codegen.fallback", "false")
      // production deployment config: SQL surface + optimizer rewrites
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(listener)
    spark
  }

  /** One measured query: best wall-clock over the adaptive runs, with
    * the TaskMetrics of THAT best run (the metrics belong to the
    * number the artifact reports). `spread` is the run-to-run noise
    * envelope of THIS measurement — (second-best − best) / best over
    * the adaptive runs — committed next to the headline so a
    * round-over-round diff can tell a regression from the ~10%/1.33×
    * run variance two otherwise-identical suites exhibit: only a
    * |Δ| beyond the two rounds' spreads is a finding. */
  private[graft] final case class Timed(sec: Double, peakMem: Long, spill: Long,
                                        spread: Double = 0.0)

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
  private def timeQuery(spark: SparkSession, sfDir: String, name: String): Timed = {
    val fn = SparkEntry.queries(name)
    def once(): Timed = {
      GraftSparkBridge.drainListenerBus(spark.sparkContext)
      listener.reset()
      val t0 = System.nanoTime()
      try consume(fn(spark, sfDir)) catch {
        case e: Throwable =>
          System.err.println(s"[bench] query $name failed at $sfDir")
          throw e
      }
      val sec = (System.nanoTime() - t0) / 1e9
      GraftSparkBridge.drainListenerBus(spark.sparkContext)
      val (p, s) = listener.snapshot()
      Timed(sec, p, s)
    }
    var best = once()
    var times = List(best.sec)
    var runs = 1
    var improving = true
    // keep running while improving OR while the best is still over
    // the backlog threshold: a PERSISTENT C2 backlog produces two
    // similar slow runs (e.g. 25 s then 23 s — "not improving"),
    // which the improvement test alone would accept as converged;
    // nearly every warm query in this suite is < 2 s, so a > 5 s
    // best buys the compiler more runs to catch up before we record
    // it. A genuinely slow query pays at most 5 runs. Minimum depth
    // is 3 (was 2): two r9 suites differed 10% total / 1.33× p90
    // per-query at min-of-2, the same magnitude as the regressions
    // the artifact exists to flag — the third run both tightens the
    // min and gives the spread column a second independent sample.
    while (runs < 5 && (improving || runs < 3 || best.sec > 5.0)) {
      val t = once()
      times ::= t.sec
      improving = t.sec < best.sec * 0.8
      if (t.sec < best.sec) best = t
      runs += 1
    }
    val sorted = times.sorted
    best.copy(spread = (sorted(1) - sorted.head) / math.max(sorted.head, 1e-9))
  }

  private def timeSuite(spark: SparkSession, sfDir: String): Map[String, Timed] =
    SparkEntry.queries.keys.toSeq.sorted
      .map(name => name -> timeQuery(spark, sfDir, name)).toMap

  // A 10× data step cannot legitimately cost more than ~12× (10× +
  // slack) once times are above the fixed per-query session floor —
  // bigger ratios are the C2-compile-backlog / host-noise artifact
  // SURVEY §6e documents, not a plan property. Round-4 shipped 8 such
  // rows (q32 at 171×); the dual-SF data to catch them was already in
  // the artifact, unconsulted.
  private val RatioCap = 12.0
  private val OverheadFloor = 0.15 // sec; fixed per-query session cost
  // A smaller-SF run should never beat its big-SF sibling by more than
  // noise: the small suite runs FIRST, so a small row well above its
  // big row is C2/codegen warmup recorded as data (round 6 shipped
  // d32 at 2.67 s sf0.01 vs 0.40 s sf0.1 — an inverted row the >12×
  // gate could not see). 1.5× over the big row, floors applied, flags
  // it for a warm isolated re-measure.
  private val InvertedCap = 1.5
  // The ratio gates cannot see SAME-SUITE inflation: when the C2
  // backlog inflates a query's small AND big rows together (round 7:
  // d23 3.40 s in-suite vs 0.27 s isolated, ratio only 2.7), no
  // cross-SF comparison flags it. So every big-SF row still over this
  // threshold after the ratio splice gets ONE isolated re-measure on
  // the drained warm JVM — the expensive rows are exactly the ones
  // the round report audits, and a warm re-run of an honest row costs
  // ~its own runtime. Bounded at ExpensiveMaxN rows per pass.
  private val ExpensiveFloor = 1.0 // sec
  private val ExpensiveMaxN = 16

  /** Queries whose big-SF suite time is implausible against their
    * small-SF time get one isolated adaptive re-measure on the
    * now-quiet warm JVM (the BenchOne methodology, in-process, after
    * the suite has drained the C2 compile queue). Returns
    * name -> (suiteTime, isolated). */
  private def remeasureOutliers(
      spark: SparkSession, sfDir: String,
      big: Map[String, Timed], small: Map[String, Timed]): Map[String, (Double, Timed)] =
    big.keys.toSeq.sorted.flatMap { name =>
      small.get(name).collect {
        case s if big(name).sec > math.max(s.sec, OverheadFloor) * RatioCap =>
          System.err.println(
            f"[bench] $name: suite ${big(name).sec}%.2f s is >${RatioCap}%.0f× its " +
              f"small-SF ${s.sec}%.2f s — isolated re-measure")
          name -> (big(name).sec, timeQuery(spark, sfDir, name))
      }
    }.toMap

  /** The most expensive remaining rows, re-measured isolated (see
    * ExpensiveFloor): same splice contract as the ratio outliers. */
  private def remeasureExpensive(
      spark: SparkSession, sfDir: String, results: Map[String, Timed],
      already: Set[String]): Map[String, (Double, Timed)] =
    results.toSeq
      .filter { case (n, t) => t.sec > ExpensiveFloor && !already(n) }
      .sortBy(-_._2.sec)
      .take(ExpensiveMaxN)
      .map { case (name, t) =>
        System.err.println(
          f"[bench] $name: ${t.sec}%.2f s headline row — isolated re-measure")
        name -> (t.sec, timeQuery(spark, sfDir, name))
      }.toMap

  private def splice(suite: Map[String, Timed],
                     outliers: Map[String, (Double, Timed)]): Map[String, Timed] =
    suite ++ outliers.collect {
      case (n, (s, iso)) if iso.sec < s => n -> iso
    }

  private def js(m: Map[String, Timed]): String =
    m.map { case (k, v) => "\"" + k + "\":" + v.sec }.mkString("{", ",", "}")

  private def jsSpread(m: Map[String, Timed]): String =
    m.map { case (k, v) =>
      "\"" + k + "\":" + (math.rint(v.spread * 1000) / 1000)
    }.mkString("{", ",", "}")

  private def jsMem(m: Map[String, Timed]): String =
    m.map { case (k, v) =>
      "\"" + k + "\":{\"peak_mb\":" + (v.peakMem / 1e6) +
        ",\"spill_mb\":" + (v.spill / 1e6) + "}"
    }.mkString("{", ",", "}")

  private def outlierBlock(key: String, m: Map[String, (Double, Timed)]): String =
    if (m.isEmpty) ""
    else {
      val body = m.toSeq.sortBy(_._1).map { case (n, (s, iso)) =>
        "\"" + n + "\":{\"suite\":" + s + ",\"isolated\":" + iso.sec + "}"
      }.mkString("{", ",", "}")
      s""","$key":$body"""
    }

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
      if (sfNorm.endsWith("sf1")) Some("/root/testdata/sf0.1")
      else if (sfNorm.endsWith("sf0.1")) Some(s"${sfNorm.stripSuffix("sf0.1")}sf0.01")
      else if (sfNorm.endsWith("sf0.01")) Some(s"${sfNorm.stripSuffix("sf0.01")}sf0.001")
      else None
    val small = smallDir match {
      case Some(dir) if Files.isDirectory(Paths.get(dir)) => timeSuite(spark, dir)
      case _ =>
        System.err.println(s"[bench] no smaller secondary SF for $sfDir — single-SF run")
        Map.empty[String, Timed]
    }

    val suite = timeSuite(spark, sfDir)
    // splice isolated re-measures over ratio-implausible rows; headline
    // is the isolated number (never worse than the suite row — the
    // re-measure runs warm), both are recorded for provenance
    val outliers = remeasureOutliers(spark, sfDir, suite, small)
    val afterRatio = splice(suite, outliers)
    // then the expensive-row pass: same-suite inflation that the ratio
    // gates cannot see (both SFs inflated together) pins to the
    // isolated number here
    val expensive = remeasureExpensive(spark, sfDir, afterRatio, outliers.keySet)
    val resultsPre = splice(afterRatio, expensive)

    // inverted rows: the small suite ran first (cold), so any small row
    // beyond InvertedCap× its (spliced) big row gets one warm isolated
    // re-measure at the small SF; both numbers are recorded
    val outliersSmall = small.keys.toSeq.sorted.flatMap { name =>
      resultsPre.get(name).collect {
        case b if small(name).sec > math.max(b.sec, OverheadFloor) * InvertedCap =>
          System.err.println(
            f"[bench] $name: small-SF ${small(name).sec}%.2f s exceeds its big-SF " +
              f"${b.sec}%.2f s — warmup artifact, isolated re-measure")
          name -> (small(name).sec, timeQuery(spark, smallDir.get, name))
      }
    }.toMap
    val smallFinal = splice(small, outliersSmall)

    // optional third pass one decade UP (SPARK_GRAFT_SF1_DIR, e.g. the
    // GenData output): runs last, on the warmest JVM, so the committed
    // artifact carries the per-query sf0.1 -> sf1 scaling table the
    // round reports — driver-visible, not builder-asserted
    val sf1Dir = sys.env.get("SPARK_GRAFT_SF1_DIR")
      .filter(d => Files.isDirectory(Paths.get(d)))
    val (results, sf1Json) = sf1Dir.fold((resultsPre, "")) { dir =>
      val s1 = timeSuite(spark, dir)
      val out1 = remeasureOutliers(spark, dir, s1, resultsPre)
      val after1 = splice(s1, out1)
      val exp1 = remeasureExpensive(spark, dir, after1, out1.keySet)
      val r1 = splice(after1, exp1)
      // the middle SF's own inverted splice: sf1 runs LAST on the
      // warmest JVM, so a middle row can carry C2 backlog its sf1 twin
      // does not — the same warmup-artifact class the small-SF splice
      // catches, one decade up (round 8 shipped e1 at 0.94 s sf0.1 vs
      // 0.34 s sf1 before this pass existed)
      val invMid = resultsPre.keys.toSeq.sorted.flatMap { name =>
        r1.get(name).collect {
          case b if resultsPre(name).sec >
              math.max(b.sec, OverheadFloor) * InvertedCap =>
            System.err.println(
              f"[bench] $name: mid-SF ${resultsPre(name).sec}%.2f s exceeds its " +
                f"sf1 ${b.sec}%.2f s — warmup artifact, isolated re-measure")
            name -> (resultsPre(name).sec, timeQuery(spark, sfDir, name))
        }
      }.toMap
      // warmth SYMMETRY: a pair still inverted after the mid's
      // isolated re-measure is comparing an isolated mid row against a
      // deep-warm in-suite sf1 row (round 8: d67 mid 2.59 s isolated
      // vs sf1 1.30 s deep-warm, while an equal-warmth sf1 run reads
      // ~3.4 s — the decade actually scales normally). For those rows
      // ONLY, the sf1 side re-measures under the same isolated warmth
      // and the scaling table takes it in EITHER direction, so the
      // committed per-query decade compares like with like.
      val midFinal = splice(resultsPre, invMid)
      val warmth = invMid.keys.toSeq.sorted.flatMap { name =>
        r1.get(name).collect {
          case b if midFinal(name).sec >
              math.max(b.sec, OverheadFloor) * InvertedCap =>
            System.err.println(
              f"[bench] $name: still inverted after the mid splice " +
                f"(${midFinal(name).sec}%.2f s vs sf1 ${b.sec}%.2f s deep-warm) " +
                "— re-measuring the sf1 side at equal warmth")
            name -> (b.sec, timeQuery(spark, dir, name))
        }
      }.toMap
      val r1Final = r1 ++ warmth.map { case (n, (_, iso)) => n -> iso }
      (midFinal,
        s""","sf1_dir":"$dir","total_sf1":${r1Final.values.map(_.sec).sum}""" +
          s""","queries_sf1":${js(r1Final)},"spread_sf1":${jsSpread(r1Final)},"mem_sf1":${jsMem(r1Final)}""" +
          outlierBlock("outliers_sf1", out1) +
          outlierBlock("outliers_sf1_expensive", exp1) +
          outlierBlock("outliers_mid_inverted", invMid) +
          outlierBlock("outliers_sf1_warmth", warmth))
    }
    val total = results.values.map(_.sec).sum

    val outlierJson = outlierBlock("outliers", outliers) +
      outlierBlock("outliers_expensive", expensive) +
      outlierBlock("outliers_small", outliersSmall)
    val extra =
      if (small.isEmpty) ""
      else s""","sf_small":"${smallDir.get}","queries_small":${js(smallFinal)}"""
    // field order matters to the DRIVER, not to JSON: its capture keeps
    // only the stdout TAIL (~2000 chars), so the summary scalars sit at
    // the very END of the line — the headline numbers always survive
    // the window, where the old metric-first layout lost them behind
    // 25 KB of per-query maps (BENCH_r08's parsed: null)
    val summary = s""","metric":"total","unit":"sec"""" +
      (if (small.isEmpty) ""
       else s""","total_small":${smallFinal.values.map(_.sec).sum}""") +
      s""","n_queries":${results.size},"value":$total"""
    val line =
      s"""{"sf":"$sfDir","codegen_fallback":"disallowed","queries":${js(results)},"spread":${jsSpread(results)},"mem":${jsMem(results)}$outlierJson$extra$sf1Json$summary}"""
    println(line)
    Files.write(Paths.get("bench_out.json"),
      (line + "\n").getBytes(StandardCharsets.UTF_8))
    // the compact headline twin, derived from the SAME spliced in-memory
    // results (one measurement pipeline): per-round BENCH artifacts copy
    // this file, so round-over-round per-query diffs compare all 225+
    // queries at equal warmth instead of whatever 62-query fragment the
    // stdout tail happened to keep (the round-8 phantom-regression
    // source: q36/d21 flagged 2.5× on tail fragments of unequal warmth)
    // spread rides in the headline twin too: the per-round diff tool
    // reads this file, and a delta is only reportable when it clears
    // BOTH rounds' committed spreads
    val headline =
      s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","queries":${js(results)},"spread":${jsSpread(results)}}"""
    Files.write(Paths.get("bench_headline.json"),
      (headline + "\n").getBytes(StandardCharsets.UTF_8))
    spark.stop()
  }
}
