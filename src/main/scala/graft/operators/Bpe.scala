package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Distributed byte-pair-encoding TOKENIZER TRAINING — the
  * subword-vocabulary learning step (Sennrich et al. 2016,
  * arXiv:1508.07909) an LLM data pipeline runs over its corpus before
  * any tokenization-dependent curation (d9 applies a BPE-ish regex;
  * this LEARNS the merge table itself).
  *
  * Scale shape: the ONLY corpus-sized pass is the word-frequency
  * aggregation (map-side combine into a dict of DISTINCT words — at
  * 100 TB the dict is orders of magnitude smaller than the corpus,
  * which is exactly why production tokenizer training is feasible at
  * all). Every merge round then runs on the dict alone: one
  * explode-pairs + sum aggregation and a 1-row argmax to the driver —
  * the same driver-loop-over-tiny-results shape as the d20 connected-
  * components loop. The symbol rewrite is a narrow map with no
  * shuffle; `localCheckpoint` every few rounds truncates the iterative
  * lineage.
  *
  * Determinism: the winning pair is (max count, then lexicographically
  * smallest left, then right). Ordering is Spark's UTF8 binary string
  * order; the corpus here is single-byte text where that matches the
  * JVM's `String` order — reference comparisons in the spec stay in
  * that regime.
  */
object BpeTrain {

  /** Word-end marker, appended as a standalone symbol so merges can
    * learn whole-word units (the Sennrich convention). */
  val EndOfWord = "</w>"

  /** One learned merge. */
  final case class Merge(rank: Int, left: String, right: String, pair_count: Long)

  /** Greedy LEFT-TO-RIGHT, NON-OVERLAPPING application of one merge:
    * "aaa" under (a,a) becomes ["aa","a"], never ["a","aa"]. */
  def applyMerge(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += a + b
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** Split a word into its initial symbol sequence: one symbol per
    * char plus the [[EndOfWord]] marker. */
  def initialSymbols(word: String): Array[String] =
    word.map(_.toString).toArray :+ EndOfWord

  /** BPE-encode one word with a trained merge list, applying merges in
    * RANK ORDER (the standard encoder; rank order — not greedy
    * longest-match — is what makes train/encode consistent). */
  def encode(word: String, merges: Seq[(String, String)]): Array[String] = {
    var syms = initialSymbols(word)
    merges.foreach { case (a, b) => syms = applyMerge(syms, a, b) }
    syms
  }

  /** Learn `numMerges` merges from the corpus; returns one row per
    * merge: (rank, left, right, pair_count), rank-ordered. Stops early
    * if no pair remains. Adjacent-pair counts are the standard
    * OVERLAPPING zip count ("aaa" contributes (a,a) twice); the
    * rewrite is [[applyMerge]]'s non-overlapping greedy pass. */
  def train(docs: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive, got $numMerges")
    val spark = docs.sparkSession
    import spark.implicits._
    // the corpus-sized pass: distinct-word frequencies (partial aggs
    // combine map-side, so the shuffle carries the dict, not the text)
    var words: Dataset[(Array[String], Long)] = docs
      .select(explode(Text.tokens(col(textCol))).as("w"))
      .where(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .as[(String, Long)]
      .map { case (w, n) => (initialSymbols(w), n) }
      .cache()
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var r = 0
    var exhausted = false
    while (r < numMerges && !exhausted) {
      val top = words
        .flatMap { case (syms, n) =>
          (0 until syms.length - 1).iterator.map(i => (syms(i), syms(i + 1), n))
        }
        .toDF("l", "r", "n")
        .groupBy("l", "r").agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += Merge(r, a, b, c)
        val prev = words
        val mapped = prev.map { case (syms, n) => (applyMerge(syms, a, b), n) }.cache()
        // truncate the iterative lineage before it stacks 10 maps deep;
        // the checkpoint materializes its own blocks, so the pre-
        // checkpoint cache is dead weight — unpersist it immediately
        // (keeping only the tail reference would orphan one cached
        // Dataset per checkpoint round over a long training run)
        words =
          if ((r + 1) % 4 == 0) {
            val ckpt = mapped.localCheckpoint(true)
            mapped.unpersist(false)
            ckpt
          } else mapped
        prev.unpersist(false)
      }
      r += 1
    }
    words.unpersist(false)
    spark.createDataFrame(merges.toSeq)
      .select(col("rank"), col("left"), col("right"), col("pair_count"))
      .orderBy("rank")
  }
}
