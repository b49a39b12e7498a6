package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends AnyFunSuite {
  import SparkTest._

  private lazy val emb = Tables.table(spark, sf, "embeddings")
  private lazy val queries = emb.filter(col("vec_id") < 5)

  test("brute-force top-k returns k ranked neighbors per query") {
    val out = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
    assert(out.length == 50)
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to 10))
      // cos must be non-increasing with rank
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    }
  }

  test("persisted IVF index answers bit-identically to the in-memory path") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf").toString
    Similarity.writeIvfIndex(emb, s"$dir/idx")
    // cells/ is a hive layout: one directory per cell — the inverted list
    val cellDirs = new java.io.File(s"$dir/idx/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty, "expected cell=N partition directories")
    // a cell filter must prune to its directory WITHOUT a cast on the
    // partition column (cell is written as INT so the inferred
    // partition type matches) — partition pruning IS the inverted list
    val pruned = spark.read.parquet(s"$dir/idx/cells").filter(col("cell") === 1)
    val prunedPlan = pruned.queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") &&
      prunedPlan.contains("cell"), prunedPlan)
    assert(!prunedPlan.contains("cast(cell"),
      "the partition column must not be wrapped in a cast")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("cand_id"), r.getAs[Double]("cos"))
    val fromIndex = Similarity.ivfTopKFromIndex(spark, s"$dir/idx", queries, k = 10)
      .collect().map(key).sortBy(t => (t._1, t._2))
    val direct = Similarity.ivfTopK(emb, queries, k = 10)
      .collect().map(key).sortBy(t => (t._1, t._2))
    assert(fromIndex.toSeq == direct.toSeq,
      "index round-trip must not change a single rank or score")
  }

  test("appended delta answers bit-identically to a full index rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_delta").toString
    // base keeps the first-nlist bootstrap vectors so both builds share
    // centroids; the delta lands via a hive-partition parquet append
    val base = emb.filter(col("vec_id") < 16 || col("vec_id") % 2 === 0)
    val delta = emb.filter(col("vec_id") >= 16 && col("vec_id") % 2 === 1)
    assert(delta.count() > 0, "the delta split must be non-empty")
    Similarity.writeIvfIndex(base, s"$dir/inc")
    Similarity.appendToIvfIndex(delta, s"$dir/inc")
    Similarity.writeIvfIndex(emb, s"$dir/full")
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("cand_id"), r.getAs[Double]("cos"))
    val inc = Similarity.ivfTopKFromIndex(spark, s"$dir/inc", queries, k = 10)
      .collect().map(key).sortBy(t => (t._1, t._2))
    val full = Similarity.ivfTopKFromIndex(spark, s"$dir/full", queries, k = 10)
      .collect().map(key).sortBy(t => (t._1, t._2))
    assert(inc.toSeq == full.toSeq,
      "append+query must not differ from rebuild+query in any rank or score")
  }

  test("LSH ANN achieves reasonable recall vs brute force") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val lsh = Similarity.lshTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    assert(lsh.nonEmpty, "LSH returned nothing")
    val recalls = brute.keys.toSeq.map { q =>
      val hit = lsh.getOrElse(q, Set.empty)
      if (hit.isEmpty) 0.0 else brute(q).intersect(hit).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.2, s"avg recall $avg too low: $recalls")
  }

  test("IVF ANN achieves reasonable recall vs brute force") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val ivf = Similarity.ivfTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val recalls = brute.keys.toSeq.map { q =>
      brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.2, s"avg IVF recall $avg too low: $recalls")
  }

  test("Lloyd-refined IVF keeps reasonable recall") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val ivf = Similarity.ivfLloydTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val recalls = brute.keys.toSeq.map { q =>
      brute(q).intersect(ivf.getOrElse(q, Set.empty)).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.2, s"avg Lloyd-IVF recall $avg too low: $recalls")
  }

  test("e2_ann_lsh query returns rows at sf0.001") {
    assert(SparkEntry.queries("e2_ann_lsh")(spark, sf).count() > 0)
  }

  test("Lloyd refinement survives a cell that captures no vectors") {
    import spark.implicits._
    // every vector is nearest centroid 1; centroid 2's cell stays empty
    val corpus = Seq(
      (1L, Array(1.0f, 0.1f)), (2L, Array(1.0f, 0.2f)), (3L, Array(0.9f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents0 = Array(Array(1.0f, 0.0f), Array(-1.0f, 0.0f))
    val refined = Similarity.lloydRefine(corpus, cents0)
    assert(refined.length == 2)
    // the empty cell keeps its seed (float→double), not a crash
    assert(refined(1).toSeq == Seq(-1.0, 0.0))
    // the populated cell moved toward the members' mean
    assert(refined(0)(1) > 0.0)
  }

  test("Lloyd means are exact fixed-point sums: stable across partitionings") {
    val cents0: Array[Array[Float]] = emb.orderBy("vec_id").limit(4)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val a = Similarity.lloydRefine(emb, cents0)
    val b = Similarity.lloydRefine(emb.repartition(7), cents0)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq)
  }

  test("PQ/ADC ANN achieves reasonable recall vs brute force") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val pq = Similarity.pqTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val recalls = brute.keys.toSeq.map { q =>
      brute(q).intersect(pq.getOrElse(q, Set.empty)).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.2, s"avg PQ recall $avg too low: $recalls")
  }

  test("IVF+PQ ANN returns ranked candidates from probed cells with real recall") {
    val brute = Similarity.bruteForceTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val ivfpq = Similarity.ivfPqTopK(emb, queries, k = 10).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    assert(ivfpq.nonEmpty)
    val recalls = brute.keys.toSeq.map { q =>
      brute(q).intersect(ivfpq.getOrElse(q, Set.empty)).size.toDouble / 10.0
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.15, s"avg IVF+PQ recall $avg too low: $recalls")
    // the candidate set must be a subset of plain IVF's (same probes,
    // only the scoring differs)
    val ivf = Similarity.ivfTopK(emb, queries, k = Int.MaxValue / 2).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    ivfpq.foreach { case (q, cands) =>
      assert(cands.subsetOf(ivf(q)), s"q$q scored outside its probed cells")
    }
  }

  test("PQ codes are m small ints and scores are partition-stable") {
    val a = Similarity.pqTopK(emb, queries, k = 5).collect()
      .map(_.toString).sorted.toSeq
    val b = Similarity.pqTopK(emb.repartition(7), queries, k = 5).collect()
      .map(_.toString).sorted.toSeq
    assert(a == b, "ADC scores must not depend on partitioning")
    // the scan-side representation really is m=8 codes in [0, ks)
    val boot = emb.orderBy("vec_id").limit(16).select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    val cbFlat = Array.tabulate(8 * 16 * 8) { i =>
      boot((i / 8) % 16)((i / (8 * 16)) * 8 + i % 8)
    }
    val codes = emb.orderBy("vec_id").select(
        graft.functions.Native.pqEncode(col("embedding"), cbFlat, 8, 16, 8).as("code"))
      .collect().map(_.getSeq[Int](0))
    assert(codes.forall(c => c.length == 8 && c.forall(j => j >= 0 && j < 16)))
    // a bootstrap vector's nearest codeword in every subspace is itself
    val self = codes(0)
    assert(self.forall(_ == 0), s"vector 0 should encode to its own codewords: $self")
  }

  test("knn graph covers every node with ranked edges and real recall") {
    val k = 5
    val g = Similarity.knnGraph(emb, k).collect()
    val byN = g.groupBy(_.getAs[Long]("src"))
    assert(byN.size == emb.count(), "every node must get neighbors")
    byN.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Int]("rank")).sorted.toSeq
      assert(ranks == (1 to ranks.max).toSeq, "ranks must be dense from 1")
      assert(ranks.size <= k)
    }
    // recall vs brute force over the whole corpus (every node a query)
    val brute = Similarity.bruteForceTopK(emb, emb, k).collect()
      .groupBy(_.getAs[Long]("q_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("cand_id")).toSet }
    val got = byN.map { case (n, rs) => n -> rs.map(_.getAs[Long]("dst")).toSet }
    val recalls = brute.keys.toSeq.map { n =>
      brute(n).intersect(got.getOrElse(n, Set.empty)).size.toDouble / k
    }
    val avg = recalls.sum / recalls.size
    assert(avg >= 0.2, s"avg knn-graph recall $avg too low")
  }

  test("near-dup pairs: singleScan mode is result-identical to the default") {
    def pairs(singleScan: Boolean) =
      Similarity.lshNearDupPairs(emb, minCos = 0.2, singleScan = singleScan)
        .collect().map(r => (r.getAs[Long]("a_id"), r.getAs[Long]("b_id"),
          r.getAs[Double]("cos"))).toSet
    val dual = pairs(singleScan = false)
    val single = pairs(singleScan = true)
    assert(dual.nonEmpty)
    assert(single == dual)
  }

  test("near-dup pairs: singleScan plans one shared band-key exchange") {
    import org.apache.spark.sql.execution.FormattedMode
    val single = Similarity.lshNearDupPairs(emb, minCos = 0.2, singleScan = true)
      .queryExecution.explainString(FormattedMode)
    // both self-join sides repartition on (tbl, bucket): canonically
    // identical exchanges that AQE stage reuse executes once (the d7b
    // shape) — the corpus band map is computed from a single scan
    assert(single.contains("REPARTITION_BY_COL"),
      "singleScan must repartition the banded rows on the bucket key")
    assert(!single.contains("CartesianProduct"))
    val default = Similarity.lshNearDupPairs(emb, minCos = 0.2)
      .queryExecution.explainString(FormattedMode)
    assert(!default.contains("REPARTITION_BY_COL"),
      "default mode must not force the exchange (cheap-map recompute wins at bench scale)")
  }

  test("semdedup: autoNlist holds expected cell occupancy at 64") {
    // the pure-integer rule the DuckDB oracle re-derives from count(*):
    // smallest power of two in [16, 2^24] with nlist * 64 >= n
    assert(Similarity.autoNlist(1) == 16)
    assert(Similarity.autoNlist(1024) == 16)
    assert(Similarity.autoNlist(1025) == 32)
    assert(Similarity.autoNlist(6000) == 128)   // sf0.1
    assert(Similarity.autoNlist(60000) == 1024) // sf1
    assert(Similarity.autoNlist(4096L * 64) == 4096)
    // past the flat-assignment cap the rule keeps growing (the
    // two-level quantizer carries assignment there)
    assert(Similarity.autoNlist(4096L * 64 + 1) == 8192)
    assert(Similarity.autoNlist(1L << 30) == (1 << 24))
    assert(Similarity.autoNlist(Long.MaxValue) == (1 << 24)) // capped
  }

  test("auto-granularity rules agree with the oracle SQL derivations") {
    // the SQL CTEs interpolate the Scala constants, so the bounds
    // can't fork; this checks the RENDERED oracle really carries them
    // and that the two integer formulas are the same function of n
    val e13 = SparkEntry.oracleSql("e13_semdedup")
    assert(e13.contains(
      s"generate_series(${Similarity.AutoNlistMinExp}, ${Similarity.AutoNlistMaxExp})"),
      "e13 oracle must derive nlist from the shared exponent bounds")
    val e4 = SparkEntry.oracleSql("e4_cosine_neardup")
    assert(e4.contains(s"generate_series(4, ${Similarity.MaxPlanesPerTable})"),
      "LSH oracle must derive p from the shared exponent bounds")
    def sqlNlist(n: Long): Int = {
      val j = (Similarity.AutoNlistMinExp to Similarity.AutoNlistMaxExp)
        .find(j => (64L << j) >= n).getOrElse(Similarity.AutoNlistMaxExp)
      1 << j
    }
    def sqlPlanes(n: Long): Int =
      (4 to Similarity.MaxPlanesPerTable)
        .find(j => (32L << j) >= n).getOrElse(Similarity.MaxPlanesPerTable)
    val sweep = (0 to 40).map(i => (1L << (i / 2)) + i) ++
      Seq(1L, 600L, 6000L, 60000L, 262144L, 262145L, Long.MaxValue)
    sweep.foreach { n =>
      assert(Similarity.autoNlist(n) == sqlNlist(n), s"autoNlist forked at n=$n")
      assert(Similarity.autoPlanes(n) == sqlPlanes(n), s"autoPlanes forked at n=$n")
    }
  }

  test("semdedup: auto geometry equals an explicit-nlist run") {
    val n = emb.count()
    val auto = Similarity.semDedup(emb, minCos = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val explicit = Similarity.semDedup(emb, minCos = 0.35,
        nlist = Similarity.autoNlist(n))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(auto.nonEmpty && auto == explicit)
  }

  test("semdedup: non-dense vec_ids fall back to the orderBy/limit bootstrap") {
    // an offset-id corpus (a filtered view, a re-keyed shard) must
    // dedup to the SAME set as the dense original, shifted — the
    // vec_id < nlist fast path alone would see zero centroids here
    // and silently keep everything
    val off = 1000000L
    val dense = Similarity.semDedup(emb, minCos = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val shifted = Similarity.semDedup(
        emb.withColumn("vec_id", col("vec_id") + off), minCos = 0.35)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(shifted == dense.map(_ + off))
  }

  /** Deterministic pseudo-random unit-ish vector (plain xorshift-style
    * mixing — no external randomness, stable across runs). */
  private def synthVec(seed: Long, dim: Int): Array[Float] =
    Array.tabulate(dim) { d =>
      var z = seed * 2654435761L + d * 40503L + 12345L
      z ^= z >>> 13; z *= 1099511628211L; z ^= z >>> 7
      ((z % 2001L) / 1000.0f) - 1.0f
    }

  private def addNoise(v: Array[Float], seed: Long, eps: Float): Array[Float] = {
    val n = synthVec(seed, v.length)
    Array.tabulate(v.length)(i => v(i) + n(i) * eps)
  }

  /** Exactly CosineSim.compute's fold (sequential, double) so local
    * reference assignments are bit-identical to the engine's. */
  private def cosLocal(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("two-level cells above the flat cap match a local reference of the rule") {
    // generic (unclustered) corpus, nlist forced above FlatAssignCap:
    // the distributed two-level assignment must equal a straight
    // single-threaded implementation of the same hierarchical rule
    val dim = 16
    val nl = 4608 // > FlatAssignCap, non-power-of-two on purpose
    val n = 5120
    val vecs = Array.tabulate(n)(i => synthVec(i.toLong * 7919L + 17L, dim))
    import spark.implicits._
    val corpus = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "embedding")
    val cents = Similarity.bootCentroidCols(corpus, nl)
    val got = Similarity.semCellsTwoLevel(corpus, cents, nl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    // local reference: supers = first 2^ceil(log2(sqrt(nl))) centroids
    var nSupers = 1
    while (nSupers.toLong * nSupers < nl) nSupers <<= 1
    def argmax(v: Array[Float], ids: Seq[Int]): Int = {
      var best = -1; var bestCs = Double.NegativeInfinity
      ids.foreach { j =>
        val cs = cosLocal(v, vecs(j))
        if (cs > bestCs || (cs == bestCs && (best < 0 || j < best))) {
          best = j; bestCs = cs
        }
      }
      best
    }
    val superIds = 0 until nSupers
    val centBranch = (0 until nl).map(j => j -> argmax(vecs(j), superIds)).toMap
    val byBranch = (0 until nl).groupBy(centBranch)
    val want = (0 until n).map { i =>
      val br = argmax(vecs(i), superIds)
      i.toLong -> argmax(vecs(i), byBranch(br)).toLong
    }.toMap
    assert(got.size == n)
    val diffs = want.keys.filter(k => got(k) != want(k))
    assert(diffs.isEmpty,
      s"${diffs.size} cells diverge from the reference, e.g. ${diffs.take(3)}")
  }

  test("flat cellRouteExpr equals the legacy inlined-literal assignment") {
    // the reference-object kernel must be a drop-in for the literal
    // probe expression in the regime both can reach (<=128 centroids):
    // identical argmax, identical lowest-cid ties, bit-identical cosines
    val dim = 16
    val nl = 96
    val n = 400
    val vecs = Array.tabulate(n)(i => synthVec(i.toLong * 52361L + 11L, dim))
    import spark.implicits._
    val corpus = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "embedding")
    val cents = vecs.take(nl).map(_.map(_.toDouble))
    val legacy = corpus.select(col("vec_id"),
        Similarity.cellAssignExpr(cents)(col("embedding")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val routed = corpus.select(col("vec_id"),
        Similarity.cellRouteExpr((1L to nl.toLong).toArray, cents)(col("embedding"))
          .as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(routed == legacy,
      "reference-object flat routing must equal the literal expression cell-for-cell")
  }

  test("cellRouteExpr two-level equals the distributed semCellsTwoLevel rule") {
    // the reference-object router (one stateless Column, the stream
    // ingest kernel) forced into its two-level regime must assign the
    // EXACT cells the distributed join-based quantizer does — same
    // supers, same tie rules, bit-identical cosines
    val dim = 16
    val nl = 256
    val n = 800
    val vecs = Array.tabulate(n)(i => synthVec(i.toLong * 104729L + 5L, dim))
    import spark.implicits._
    val corpus = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "embedding")
    val cents = Similarity.bootCentroidCols(corpus, nl)
    val want = Similarity.semCellsTwoLevel(corpus, cents, nl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centArr = cents.orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray.map(_.toDouble)))
    val got = corpus.select(col("vec_id"),
        Similarity.cellRouteExpr(centArr.map(_._1), centArr.map(_._2),
          flatCap = 64)(col("embedding")).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n)
    val diffs = want.keys.filter(k => got(k) != want(k))
    assert(diffs.isEmpty,
      s"${diffs.size} cells diverge from semCellsTwoLevel, e.g. ${diffs.take(3)}")
  }

  test("two-level equals flat assignment on margin-separated clusters above the cap") {
    // the regime the hierarchy is FOR: corpora whose nearest super
    // agrees with the nearest centroid's branch. supers well apart,
    // centroids tight around supers, free vectors tight around
    // centroids -> two-level == flat Voronoi, exactly
    val dim = 32
    val nl = 4608
    val n = 5120
    var nSupers = 1
    while (nSupers.toLong * nSupers < nl) nSupers <<= 1
    val superVs = Array.tabulate(nSupers)(s => synthVec(s * 1299721L + 3L, dim))
    val vecs = Array.tabulate(n) { i =>
      if (i < nSupers) superVs(i)
      else if (i < nl) addNoise(superVs(i % nSupers), i * 31L + 7L, 0.02f)
      else addNoise(superVs(i % nSupers), i * 37L + 11L, 0.03f)
    }
    import spark.implicits._
    val corpus = vecs.zipWithIndex
      .map { case (v, i) => (i.toLong, v) }.toSeq
      .toDF("vec_id", "embedding")
    val cents = Similarity.bootCentroidCols(corpus, nl)
    val flat = Similarity.semCellsFlat(corpus, cents)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val two = Similarity.semCellsTwoLevel(corpus, cents, nl)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(flat.size == n && two.size == n)
    val diffs = flat.keys.filter(k => flat(k) != two(k))
    assert(diffs.isEmpty,
      s"${diffs.size} of $n cells differ between flat and two-level")
  }

  test("semcells: knownN short-circuits the corpus count, same result") {
    val n = emb.count()
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(key(Similarity.diversitySample(emb, k = 8, knownN = n)) ==
      key(Similarity.diversitySample(emb, k = 8)))
  }

  test("centroid drift: report matches a local re-derivation on a skewed corpus") {
    import spark.implicits._
    // 2 bootstrap centroids (vec_id 0 -> x-axis, 1 -> y-axis), then a
    // cluster of x-like vectors DRIFTED toward y: cell 1's true mean
    // pulls away from its built centroid, cell 2 keeps only its seed
    val dim = 4
    def v(xs: Double*) = xs.map(_.toFloat).toArray ++ Array.fill(dim - xs.length)(0f)
    val rows = Seq(
      0L -> v(1.0, 0.0), 1L -> v(0.0, 1.0),
      2L -> v(1.0, 0.4), 3L -> v(1.0, 0.45), 4L -> v(1.0, 0.35))
    val corpus = rows.toDF("vec_id", "embedding")
    val out = Similarity.centroidDrift(corpus, nlist = 2).collect()
      .map(r => r.getAs[Long]("cell") ->
        (r.getAs[Long]("n_assigned"), r.getAs[Double]("share"), r.getAs[Double]("drift"))).toMap
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 4L && out(2L)._1 == 1L, s"occupancy: $out")
    assert(math.abs(out(1L)._2 - 0.8) < 1e-12 && math.abs(out(2L)._2 - 0.2) < 1e-12)
    // local re-derivation with the same fixed-point mean
    val members = rows.filter(p => Set(0L, 2L, 3L, 4L)(p._1)).map(_._2)
    val mean = (0 until dim).map { d =>
      members.map(m => math.floor(m(d).toDouble * 1e6)).sum / 1e6 / members.size
    }
    val cent = rows.head._2.map(_.toDouble)
    def cos(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum /
        (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(math.abs(out(1L)._3 - (1.0 - cos(mean, cent))) < 1e-12,
      s"drift ${out(1L)._3} vs local ${1.0 - cos(mean, cent)}")
    // the seed-only cell reports zero drift: nothing but its own seed
    assert(out(2L)._3 == 0.0 || out(2L)._3 < 1e-12)
  }

  test("graph search: beam structure, self-navigation, and partition invariance") {
    val out = Similarity.graphSearch(emb, queries, beam = 4, rounds = 3).collect()
    val byQ = out.groupBy(_.getAs[Long]("q_id"))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    byQ.foreach { case (qid, rows) =>
      val sorted = rows.sortBy(_.getAs[Int]("rank"))
      assert(sorted.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length).toSeq)
      assert(rows.length <= 4)
      val cs = sorted.map(_.getAs[Double]("cos"))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b }, s"q$qid not ranked")
    }
    // query 0 IS the entry node: it must navigate to itself at rank 1
    val q0top = byQ(0L).minBy(_.getAs[Int]("rank"))
    assert(q0top.getAs[Long]("node") == 0L && q0top.getAs[Double]("cos") > 1.0 - 1e-9)
    // the walk is deterministic under a different input partitioning
    val again = Similarity.graphSearch(emb.repartition(13), queries, beam = 4, rounds = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(again == out.map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet)
    // more rounds can only improve (or hold) the best-found cosine
    val deeper = Similarity.graphSearch(emb, queries, beam = 4, rounds = 4).collect()
    val best3 = byQ.map { case (q, rs) => q -> rs.map(_.getAs[Double]("cos")).max }
    deeper.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.map(_.getAs[Double]("cos")).max >= best3(q) - 1e-12,
        s"greedy frontier regressed for q$q")
    }
  }

  test("semantic cluster map persists, memoizes, and the keep rule matches a local re-derivation") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = rows(Similarity.semanticClusterMap(emb))
    assert(direct.nonEmpty, "test embeddings should contain near-dup clusters")
    val dir = java.nio.file.Files.createTempDirectory("graft_semmap").toString
    assert(rows(Similarity.ensureSemanticClusterMap(emb, s"$dir/m")) == direct)
    // a committed path must never rebuild: a different corpus for the
    // same path still reads the original map
    assert(rows(Similarity.ensureSemanticClusterMap(
      emb.filter(col("vec_id") < 3), s"$dir/m")) == direct)

    // the SemDeDup keep rule against a local re-derivation (exact
    // fixed-point means, lowest cos-to-centroid, vec_id tie-break)
    val kept = Similarity.semDedupKeep(emb,
        Similarity.readSemanticClusterMap(spark, s"$dir/m"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val byCluster = direct.groupBy(_._2)
    assert(kept.keySet == byCluster.keySet)
    byCluster.foreach { case (c, mem) =>
      val ids = mem.map(_._1).toSeq.sorted
      val n = ids.length
      val mean = Array.tabulate(64) { d =>
        ids.map(id => math.floor(vecs(id)(d).toDouble * 1e6).toLong).sum
          .toDouble / 1e6 / n
      }
      def cos(a: Array[Float], b: Array[Double]) = {
        val dot = a.indices.map(i => a(i).toDouble * b(i)).sum
        dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
          math.sqrt(b.map(x => x * x).sum))
      }
      val best = ids.map(id => (cos(vecs(id), mean), id)).min
      val (keptVec, keptCos, nMembers) = kept(c)
      assert(keptVec == best._2, s"cluster $c kept $keptVec, expected ${best._2}")
      assert(math.abs(keptCos - best._1) < 1e-9)
      assert(nMembers == n.toLong)
    }
  }

  test("multi-entry graph search: delegation, duplicate collapse, determinism") {
    import org.apache.spark.sql.functions.col
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("q_id"), r.getAs[Int]("rank"), r.getAs[Long]("node"))
    val edges = Similarity.knnGraph(emb, 5)
      .select(col("src"), col("dst")).localCheckpoint()
    // graphSearch(entryId) must be graphSearchFrom(entries=[entryId])
    // over the same graph — the single-entry path IS the general one
    val single = Similarity
      .graphSearchFrom(edges, emb, queries, beam = 4, rounds = 3, Seq(0L))
      .collect().map(key).toSet
    val viaOld = Similarity.graphSearch(emb, queries, beam = 4, rounds = 3)
      .collect().map(key).toSet
    assert(single == viaOld, "entry-set [0] must equal the entryId=0 walk")
    // duplicate entries collapse to the distinct set
    val dup = Similarity
      .graphSearchFrom(edges, emb, queries, beam = 4, rounds = 3, Seq(0L, 0L, 0L))
      .collect().map(key).toSet
    assert(dup == single, "duplicate entries must not change the walk")
    // the multi-entry walk keeps the beam contract and is partition-
    // deterministic (the e23 oracle pins its VALUES; here the shape)
    val multi = Similarity
      .graphSearchFrom(edges, emb, queries, beam = 4, rounds = 3, 0L to 7L)
      .collect()
    multi.groupBy(_.getAs[Long]("q_id")).foreach { case (q, rs) =>
      assert(rs.length <= 4 &&
        rs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to rs.length).toSeq,
        s"beam contract broken for q$q")
    }
    val multiAgain = Similarity
      .graphSearchFrom(edges, emb.repartition(13), queries,
        beam = 4, rounds = 3, 0L to 7L)
      .collect().map(key).toSet
    assert(multiAgain == multi.map(key).toSet, "multi-entry walk not deterministic")
  }

  test("e28: persisted-graph search equals a fresh-graph search; ensure memoizes") {
    val dir = java.nio.file.Files.createTempDirectory("e28_graph").toString
    val path = s"$dir/edges"
    def search(edges: org.apache.spark.sql.DataFrame) =
      Similarity.graphSearchFrom(edges, emb, queries,
          beam = 4, rounds = 3, entryIds = 0L until 8L)
        .collect().map(r =>
          (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
            r.getAs[Long]("node"), r.getAs[Double]("cos"))).toSeq
    val viaIndex = search(Similarity.ensureKnnGraph(emb, path))
    val fresh = Similarity.knnGraph(emb, k = 5)
      .select(col("src"), col("dst")).localCheckpoint()
    assert(viaIndex == search(fresh),
      "index read path must be indistinguishable from the fresh build")
    // second ensure must be a read, not a rebuild
    val marker = java.nio.file.Paths.get(path, "_SUCCESS")
    val t0 = java.nio.file.Files.getLastModifiedTime(marker)
    Similarity.ensureKnnGraph(emb, path).count()
    assert(java.nio.file.Files.getLastModifiedTime(marker) == t0,
      "ensure must memoize behind the _SUCCESS marker")
  }

  test("e29: persisted-PQ search equals the from-scratch ADC top-k row-for-row") {
    val dir = java.nio.file.Files.createTempDirectory("e29_pq").toString
    Similarity.ensurePqIndex(emb, dir)
    val a = Similarity.pqTopKFromIndex(spark, dir, queries, k = 10)
      .select("q_id", "rank", "cand_id", "adc").collect().map(_.toSeq).toSeq
    val b = Similarity.pqTopK(emb, queries, k = 10)
      .select("q_id", "rank", "cand_id", "adc").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a.toSet == b.toSet,
      "index read path must be indistinguishable from the from-scratch query")
    // second ensure must be a read, not a rebuild
    val marker = java.nio.file.Paths.get(dir, "codes", "_SUCCESS")
    val t0 = java.nio.file.Files.getLastModifiedTime(marker)
    Similarity.ensurePqIndex(emb, dir)
    assert(java.nio.file.Files.getLastModifiedTime(marker) == t0,
      "ensure must memoize behind the _SUCCESS marker")
  }

  test("e27 range search equals exhaustive-k IVF filtered at the threshold") {
    val n = emb.count().toInt
    val viaTopK = Similarity.ivfTopK(emb, queries, k = n)
      .filter(col("cos") >= 0.1).select("q_id", "cand_id", "cos")
      .collect().map(_.toSeq).toSet
    val range = Similarity.ivfRangeSearch(emb, queries, minCos = 0.1)
      .select("q_id", "cand_id", "cos").collect().map(_.toSeq).toSet
    assert(range.nonEmpty, "threshold should admit some candidates at sf0.001")
    assert(range == viaTopK,
      "range search must equal the unbounded top-k filtered at the same threshold")
  }

  test("e31 pre-filters candidates, never post-filters the top-k") {
    val langs = Tables.table(spark, sf, "documents")
      .select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive IVF candidates (same cells/probes as e31), pre-filter
    // re-rank locally
    val n = emb.count().toInt
    val all = Similarity.ivfTopK(emb, queries, k = n).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cos")))
    val expected = all.groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
      rows.filter(t => langs.get(t._2).contains("en"))
        .sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
        .map { case ((_, cid, cos), i) => (qid, i + 1, cid, cos) }.toSeq
    }.toSet
    val out = SparkEntry.queries("e31_filtered_search")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSet == expected,
      "e31 must equal the pre-filter re-rank of the exhaustive candidates")
    out.foreach { case (_, _, cid, _) =>
      assert(langs.get(cid).contains("en"), "every hit must satisfy the filter")
    }
    // the trap e31 avoids: post-filtering the unfiltered top-10 loses
    // rows whenever it contains other-language hits
    val post = all.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.sortBy(t => (-t._3, t._2)).take(10)
        .count(t => langs.get(t._2).contains("en"))
    }
    val pre = out.groupBy(_._1).view.mapValues(_.length)
    assert(post.forall { case (qid, c) => c <= pre.getOrElse(qid, 0) })
    assert(post.exists { case (qid, c) => c < pre.getOrElse(qid, 0) },
      "fixture should exhibit the post-filter deficit on some query")
  }

  test("e30 sweep is monotone in nprobe and matches the e1/e3 composition") {
    val rows: Map[(Int, Long), Double] =
      SparkEntry.queries("e30_nprobe_recall")(spark, sf).collect()
        .map(r => ((r.getInt(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(rows.keys.map(k => k._1).toSet == Set(1, 2, 4, 8))
    // more probes can only add candidates: recall must not decrease
    val qids = rows.keys.map(k => k._2).toSet.toSeq
    for (qid <- qids; pair <- Seq(1, 2, 4, 8).sliding(2).toSeq)
      assert(rows((pair(0), qid)) <= rows((pair(1), qid)),
        s"recall at nprobe=${pair(1)} must not drop below nprobe=${pair(0)} " +
          s"for query $qid")
    // the nprobe=4 sweep point must equal the e12-style join of the
    // oracle-green e1 (ground truth) and e3 (IVF nprobe=4) operators
    val exact = SparkEntry.queries("e1_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val approx = SparkEntry.queries("e3_ann_ivf")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    exact.groupBy(_._1).foreach { case (qid, hits) =>
      val expect = hits.count(approx.contains).toDouble / 10.0
      assert(rows((4, qid)) == expect,
        s"nprobe=4 recall for query $qid must equal the e1/e3 composition")
    }
  }

  test("e32 hard negatives: planted near-dup is ranked by top-k but never mined") {
    import spark.implicits._
    // corpus: the real embeddings PLUS a near-identical copy of query 0
    // (vec_id 0 scaled by 1.01 with one component nudged — cosine with
    // the query ≈ 1, far above any real candidate)
    val q0 = emb.filter(col("vec_id") === 0)
      .select("embedding").collect()(0).getSeq[Float](0).toArray
    val dup = q0.clone(); dup(0) = dup(0) + 0.001f
    val maxId = emb.agg(max(col("vec_id"))).collect()(0).getLong(0)
    val corpus = emb.select(col("vec_id"), col("embedding"))
      .union(Seq((maxId + 1, dup.toSeq)).toDF("vec_id", "embedding"))
    val qs = corpus.filter(col("vec_id") < 5)
    val topk = Similarity.ivfTopK(corpus, qs, k = 10)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id")))
    assert(topk.contains((0L, maxId + 1)),
      "the planted near-dup must dominate query 0's plain top-k")
    val hard = Similarity.ivfHardNegatives(corpus, qs, k = 10, maxCos = 0.2)
      .collect()
    assert(!hard.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id")))
        .contains((0L, maxId + 1)),
      "the near-dup must never poison the negative set")
    // survivors are the best-of-the-rest: equal to the unbounded top-k
    // filtered at the ceiling then re-ranked
    val n = corpus.count().toInt
    val expected = Similarity.ivfTopK(corpus, qs, k = n).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("cand_id"),
        r.getAs[Double]("cos")))
      .filter(_._3 < 0.2)
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
          .map { case ((_, cid, cos), i) => (qid, i + 1, cid, cos) }
      }.toSet
    val got = hard.map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
      r.getAs[Long]("cand_id"), r.getAs[Double]("cos"))).toSet
    assert(got == expected,
      "hard negatives must equal the ceiling-filtered re-rank of all candidates")
    hard.foreach(r => assert(r.getAs[Double]("cos") < 0.2,
      "every mined negative sits strictly below the ceiling"))
  }

  test("e33: MMR picks equal an independent local greedy fold") {
    val got = SparkEntry.queries("e33_mmr_select")(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("rel"), r.getAs[Double]("mmr"))).toSeq
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val q = emb(0L)
    val pool = emb.toSeq.filter(_._1 != 0L)
      .map { case (id, v) => id -> cosLocal(q, v) }
      .sortBy { case (id, c) => (-c, id) }.take(20).toMap
    var selected = List.empty[Long]
    var remaining = pool.keySet
    val expected = (1 to 5).map { rank =>
      val (bestId, bestScore) = remaining.toSeq.sorted.map { c =>
        val s =
          if (selected.isEmpty) Similarity.MmrLambda * pool(c)
          else Similarity.MmrLambda * pool(c) - Similarity.MmrOneMinusLambda *
            selected.map(sId => cosLocal(emb(c), emb(sId))).max
        (c, s)
      }.maxBy { case (id, s) => (s, -id) }
      selected ::= bestId
      remaining -= bestId
      (rank, bestId, pool(bestId), bestScore)
    }
    assert(got == expected, "distributed MMR must equal the local greedy fold")
    // diversity sanity: the greedy set is not just the top-5 by relevance
    assert(got.map(_._2).toSet.size == 5)
  }

  test("e35: residual IVF+PQ equals an independent local re-derivation") {
    val got = SparkEntry.queries("e35_residual_pq")(spark, sf).collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("rank"),
        r.getAs[Long]("cand_id"), r.getAs[Double]("adc"))).toSet
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val cents = (0L until 16L).map(i => emb(i).map(_.toDouble)).toArray
    def cellLoc(v: Array[Float]): Int = // argmax cosine, first max wins
      cents.map(c => cosLocal(v, c.map(_.toFloat))).zipWithIndex
        .maxBy { case (cs, i) => (cs, -i) }._2
    def residLoc(v: Array[Float]): Array[Double] = {
      val c = cents(cellLoc(v))
      Array.tabulate(v.length)(i => v(i).toDouble - c(i))
    }
    // codebook = first 16 vectors' own residuals; per-subspace argmin
    val rboot = (0L until 16L).map(i => residLoc(emb(i))).toArray
    def subDist(rv: Array[Double], j: Int, s: Int): Double = {
      var acc = 0.0; var d = 0
      while (d < 8) { val x = rv(s * 8 + d) - rboot(j)(s * 8 + d); acc += x * x; d += 1 }
      acc
    }
    def encode(rv: Array[Double]): Array[Int] =
      Array.tabulate(8) { s =>
        var best = Double.PositiveInfinity; var bj = 0
        (0 until 16).foreach { j =>
          val dd = subDist(rv, j, s); if (dd < best) { best = dd; bj = j } }
        bj
      }
    val codes = emb.map { case (id, v) => id -> encode(residLoc(v)) }
    val expected = (0L until 5L).flatMap { qid =>
      val probes = cents.indices
        .map(i => i -> cosLocal(emb(qid), cents(i).map(_.toFloat)))
        .sortBy { case (i, cs) => (-cs, i) }.take(4).map(_._1).toSet
      val scoredRows = emb.keys.filter(_ != qid)
        .filter(cid => probes.contains(cellLoc(emb(cid)))).map { cid =>
          val qr = { // query residual AGAINST THE CANDIDATE'S cell
            val c = cents(cellLoc(emb(cid)))
            Array.tabulate(64)(i => emb(qid)(i).toDouble - c(i))
          }
          val adc = (0 until 8).map(s => subDist(qr, codes(cid)(s), s)).sum
          (cid, adc)
        }.toSeq
      scoredRows.sortBy { case (cid, adc) => (adc, cid) }.take(10).zipWithIndex
        .map { case ((cid, adc), i) => (qid, i + 1, cid, adc) }
    }.toSet
    assert(got == expected,
      "residual IVFADC must equal the local residual-LUT re-derivation")
    // residual codes genuinely differ from raw-vector codes (the e9
    // baseline) — the refinement is not a no-op on this corpus
    val rawBoot = (0L until 16L).map(i => emb(i).map(_.toDouble)).toArray
    def rawEncode(v: Array[Float]): Array[Int] = Array.tabulate(8) { s =>
      var best = Double.PositiveInfinity; var bj = 0
      (0 until 16).foreach { j =>
        var acc = 0.0; var d = 0
        while (d < 8) { val x = v(s * 8 + d).toDouble - rawBoot(j)(s * 8 + d); acc += x * x; d += 1 }
        if (acc < best) { best = acc; bj = j }
      }
      bj
    }
    assert(emb.exists { case (id, v) => !codes(id).sameElements(rawEncode(v)) },
      "residual encoding must differ from raw-vector encoding somewhere")
  }

  test("e36: the fixed-point error means are invariant under repartitioning") {
    // the 100 TB determinism claim: floor(err·2^20) long sums make the
    // cross-row mean independent of partition count and row order
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    def run(df: org.apache.spark.sql.DataFrame) =
      Similarity.pqErrorReport(df, df.filter(col("vec_id") < 5))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .toSet
    val base = run(emb)
    assert(run(emb.repartition(3)) == base,
      "3-partition run must reproduce the exact report")
    assert(run(emb.repartition(17, col("vec_id"))) == base,
      "17-way keyed repartition must reproduce the exact report")
  }

  test("e34: farthest-first trace equals an independent local greedy derivation") {
    val got = SparkEntry.queries("e34_kcenter_init")(spark, sf).collect()
      .map(r => (r.getAs[Int]("rank"), r.getAs[Long]("vec_id"),
        r.getAs[Double]("radius"))).toSeq
    val emb = spark.read.parquet(s"$sf/embeddings.parquet").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val seed = emb.keySet.min
    var selected = List(seed)
    val expected = scala.collection.mutable.ArrayBuffer((1, seed, 0.0))
    (2 to 5).foreach { rank =>
      val (id, rad) = emb.toSeq.filter(e => !selected.contains(e._1))
        .map { case (cid, v) =>
          cid -> selected.map(s => 1.0 - cosLocal(v, emb(s))).min }
        .minBy { case (cid, r) => (-r, cid) }
      expected += ((rank, id, rad))
      selected ::= id
    }
    assert(got == expected.toSeq,
      "distributed farthest-first must equal the local greedy trace")
    // coverage radii never increase: each pick plugs the biggest hole
    val radii = got.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
      "k-center radii must be non-increasing")
    assert(got.map(_._2).toSet.size == 5)
  }
}
