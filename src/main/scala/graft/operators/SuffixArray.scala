package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Distributed suffix-array construction by prefix doubling (SURVEY
  * §2c). The exact-substring dedup family (d66/d75, Lee et al.
  * arXiv:2107.06499) screens at a FIXED shingle width; the suffix
  * array is the structure the paper actually builds — every corpus
  * suffix ranked lexicographically — which resolves repeats at EVERY
  * width at once. Single-node builds (the paper's) stop at corpus ≈
  * RAM; prefix doubling is the classical O(log depth)-round
  * formulation that distributes: round k sorts (rank_k(i),
  * rank_k(i + 2^k)) pairs, so rank_{k+1} orders suffixes by their
  * first 2^{k+1} tokens, and every round is ONE keyed exchange of
  * 8-byte rank pairs — token text keys nothing after round 0.
  *
  * Coordinate system: the lowercased whitespace token stream per
  * document — the same grid d66's spans and d75's cut speak, so ranks
  * compose with the rest of the dedup suite. Suffixes never compare
  * past their document's end (a doc boundary behaves as a sentinel
  * below every real token — partner-rank 0 below every real rank
  * ≥ 1), which makes per-document suffixes order exactly like the
  * concatenated-with-unique-separators corpus of the literature.
  *
  * Depth is CAPPED at 2^maxLog2 tokens (default 64): ranks order
  * suffixes by their first 64 tokens, enough to resolve any repeat
  * the span family acts on, and it bounds both the round count and
  * the oracle's comparison depth. Two suffixes equal to the cap
  * share a rank (dense ranking) — the capped-prefix equivalence the
  * DuckDB oracle states directly as
  * `DENSE_RANK() OVER (ORDER BY list_slice(toks, pos, pos+63))`.
  */
object SuffixArray {

  /** Distributed dense rank of `df` by `keys`: a global 1..K numbering
    * where equal keys share a number — WITHOUT a corpus-wide
    * single-partition Window (the naive `dense_rank().over(orderBy)`
    * funnels every row through one task and dies at scale). Shape:
    * range-partition by the keys (equal keys land in one partition by
    * construction), dense-rank LOCALLY per partition (a partitionBy
    * window — parallel), then lift local ranks to global by adding
    * each partition's prefix of distinct-key counts. The only
    * unpartitioned window runs over that per-partition count table —
    * one row PER PARTITION (dozens), the same driver-scale metadata
    * every range exchange already samples; data-sized rows never
    * cross it. The range-partitioned input is pinned with
    * localCheckpoint so the count pass and the rank pass read the
    * SAME partition assignment (range boundaries are sampled per
    * execution and may not be reused across subplans).
    */
  def denseRankBy(df: DataFrame, keys: Seq[String], out: String,
                  numParts: Int = 0): DataFrame = {
    val parts =
      if (numParts > 0) numParts
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val kc = keys.map(col)
    val sorted = df.repartitionByRange(parts, kc: _*)
      .withColumn("__sa_pid", spark_partition_id())
      .localCheckpoint()
    val offs = sorted.groupBy("__sa_pid")
      .agg(countDistinct(kc.head, kc.tail: _*).as("__sa_n"))
      .withColumn("__sa_off",
        coalesce(sum(col("__sa_n")).over(Window.orderBy("__sa_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__sa_pid", "__sa_off")
    sorted
      .withColumn("__sa_lr",
        dense_rank().over(Window.partitionBy("__sa_pid").orderBy(kc: _*))
          .cast("long"))
      .join(broadcast(offs), Seq("__sa_pid"))
      .withColumn(out, col("__sa_off") + col("__sa_lr"))
      .drop("__sa_pid", "__sa_lr", "__sa_off")
  }

  /** The positional token grid suffixes are defined over: one row per
    * (doc_id, pos) with the token at that 1-based position and the
    * doc's total token count. Fan-out happens after a doc_id
    * repartition (the spanGrid convention) so explode skew spreads.
    */
  def tokenGrid(docs: DataFrame): DataFrame =
    docs.filter(trim(col("text")) =!= "")
      .repartition(col("doc_id"))
      .select(col("doc_id"), Text.tokens(lower(col("text"))).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
        posexplode(col("toks")).as(Seq("p", "tok")))
      .select(col("doc_id"), col("n_toks"),
        (col("p") + 1).cast("long").as("pos"), col("tok"))

  /** Prefix-doubling rank ladder: returns (width, ranks) for width =
    * 1, 2, 4, …, 2^maxLog2, where `ranks` is (doc_id, n_toks, pos,
    * rank) and rank dense-orders suffixes by their first `width`
    * tokens (capped at doc end). Stops early once every suffix holds
    * a unique rank — every later ladder step would reproduce the
    * same numbering (doubling an already-total order changes
    * nothing), so consumers see identical results either way. Each
    * level is localCheckpoint-pinned: it feeds the next round TWICE
    * (as itself and as its own 2^k-shifted partner) plus any
    * consumer, and the convergence count below is a driver action —
    * the d20/e5 iterative-operator convention.
    */
  def rankLevels(docs: DataFrame, maxLog2: Int = 6): Seq[(Int, DataFrame)] = {
    val grid = tokenGrid(docs)
    var cur = denseRankBy(grid, Seq("tok"), "rank")
      .select("doc_id", "n_toks", "pos", "rank").localCheckpoint()
    val levels = scala.collection.mutable.ArrayBuffer((1, cur))
    var width = 1
    var saturated = false
    while (width < (1 << maxLog2) && !saturated) {
      // dense ranks are 1..K: max(rank) == row count ⇔ all distinct
      val conv = cur.agg(count(lit(1)), max(col("rank"))).head()
      if (conv.getLong(1) == conv.getLong(0)) saturated = true
      else {
        val shifted = cur.select(col("doc_id"),
          (col("pos") - width).as("pos"), col("rank").as("rank2"))
        val paired = cur.join(shifted, Seq("doc_id", "pos"), "left")
          .withColumn("rank2", coalesce(col("rank2"), lit(0L)))
        cur = denseRankBy(paired, Seq("rank", "rank2"), "nrank")
          .select(col("doc_id"), col("n_toks"), col("pos"),
            col("nrank").as("rank"))
          .localCheckpoint()
        width *= 2
        levels += ((width, cur))
      }
    }
    levels.toSeq
  }

  /** Final capped-depth suffix ranks: (doc_id, n_toks, pos, rank). */
  def suffixRanks(docs: DataFrame, maxLog2: Int = 6): DataFrame =
    rankLevels(docs, maxLog2).last._2

  /** The PERSISTED rank ladder — the index-is-data lifecycle on the
    * suffix side (the d47/d66_spans_indexed convention): the doubling
    * build runs ONCE per corpus generation and lands each level as a
    * parquet table under `dir/w=<width>`; every consumer afterwards
    * reads stored 8-byte ranks instead of re-running six exchange
    * rounds. The `_LADDER_DONE` marker commits the WHOLE ladder
    * atomically-enough for the single-maintainer artifact convention
    * (a torn build has no marker and rebuilds); the level set is
    * data-dependent (early exit), so readers list `w=*` rather than
    * assuming seven.
    *
    * APPEND SEAM (deliberate): unlike the delta-maintained artifacts
    * (e11's IVF delta, d34/d73's incremental screens — all per-key or
    * per-pattern LOCAL, so new data composes by union), suffix ranks
    * are a GLOBAL dense numbering over every corpus suffix: appending
    * one document shifts the rank of every suffix that sorts after
    * any of its prefixes, so there is no union-shaped delta — a true
    * incremental path is the classical two-suffix-array MERGE
    * (rank-order merge of old ladder + new-docs ladder, itself a full
    * relabel of the rank column). The intended 100 TB posture is
    * therefore REBUILD PER CORPUS GENERATION: the build is measured
    * and ledgered (SURVEY §6k — 8.5 s sf0.1 / ~75 s sf1, linear per
    * decade), runs once per generation, and every consumer
    * (d77/d78/d80) reads the stored ranks. Appends BETWEEN
    * generations ride the d34 incremental screen against the frozen
    * ladder until the next generation rebuild picks them up. */
  def ensureLadder(docs: DataFrame, dir: String,
                   maxLog2: Int = 6): Seq[(Int, DataFrame)] = {
    val spark = docs.sparkSession
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new org.apache.hadoop.fs.Path(dirPath, "_LADDER_DONE")
    if (!fs.exists(marker)) {
      rankLevels(docs, maxLog2).foreach { case (w, df) =>
        df.write.mode("overwrite").parquet(s"$dir/w=$w")
      }
      fs.create(marker, true).close()
    }
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(dirPath, "w=*")))
      .getOrElse(Array.empty).toSeq
      .map(_.getPath.getName.stripPrefix("w=").toInt).sorted
      .map(w => (w, spark.read.parquet(s"$dir/w=$w")))
  }

  /** Multi-resolution repeat screen over the rank ladder: for every
    * document, the longest token run it shares verbatim with ANY
    * OTHER document, measured at power-of-two resolution (a true
    * repeat of length L reports in (L/2, L] — an underestimate of
    * less than 2×, never an overestimate). A width-w rank shared
    * across ≥ 2 docs certifies a w-token match (or a full shorter
    * tail match — capped-prefix equality at doc end — hence the
    * LEAST against the remaining length, so a short shared tail
    * reports its ACTUAL length, not the level width). Per level this
    * is one rank-keyed aggregate (min≠max doc — no countDistinct)
    * and a join back; ranks are 8-byte longs, text keys nothing.
    */
  def repeatScreen(docs: DataFrame, maxLog2: Int = 6): DataFrame =
    repeatScreen(docs, rankLevels(docs, maxLog2))

  /** Screen over an externally supplied ladder (in-query build or the
    * persisted [[ensureLadder]] tables — identical either way, which
    * the driver gate certifies by sharing the oracle text). */
  def repeatScreen(docs: DataFrame, levels: Seq[(Int, DataFrame)]): DataFrame = {
    val hits = levels.map { case (w, r) =>
      val shared = r.groupBy("rank")
        .agg(min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select("rank")
      r.join(shared, Seq("rank"))
        .select(col("doc_id"),
          least(lit(w.toLong), col("n_toks") - col("pos") + 1).as("rep"))
    }.reduce(_ unionByName _)
    val best = hits.groupBy("doc_id").agg(max(col("rep")).as("max_shared_len"))
    docs.filter(trim(col("text")) =!= "")
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_toks"))
      .join(best, Seq("doc_id"), "left")
      .withColumn("max_shared_len", coalesce(col("max_shared_len"), lit(0L)))
      .select("doc_id", "n_toks", "max_shared_len")
  }
}
