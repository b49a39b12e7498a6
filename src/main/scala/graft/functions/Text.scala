package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-training-data operators
  * (SURVEY §2c): tokenization, quality scoring, language ID,
  * fingerprinting. Pure `functions._` compositions — codegen-friendly,
  * no UDFs — and every expression has a DuckDB-SQL equivalent used by
  * the oracles (identical operation order, so doubles match bit-exact).
  */
object Text {

  /** Whitespace tokenization. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** The native one-pass stats struct backing the three counters
    * below (plans/TextStats.scala). Extracting different fields in
    * one projection evaluates the struct ONCE per row (semantically
    * equal instances collapse under codegen subexpression
    * elimination); the composed formulations are kept as the
    * NativeExprSpec equivalence oracles. */
  private def stats(c: Column): Column =
    org.apache.spark.sql.GraftBridge.column(
      graft.plans.TextStats(org.apache.spark.sql.GraftBridge.expression(c)))

  def tokenCount(c: Column): Column = stats(c)("n_tokens").cast("int")

  private[graft] def tokenCountComposed(c: Column): Column = size(tokens(c))

  val Stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")

  /** Hashed-feature linear-classifier weight: polyHash(token) lands in
    * one of 1024 feature buckets; the per-bucket weight is the fixed
    * closed form (bucket·2654435761) mod 2039 − 1019 (a stand-in for an
    * offline-trained model — inference is the engine's job). ONE
    * definition shared by the d33 batch gate and the streaming quality
    * screen so the two can never drift; the same fold is replicated in
    * the d33 oracle SQL. */
  def classifierWeight(t: Column): Column =
    (Native.polyHash(t, 1000003L) % lit(1024L)) * lit(2654435761L) %
      lit(2039L) - lit(1019L)

  /** Integer weight sum over a token array — one narrow per-row fold
    * (no explode, no join, no aggregation state). */
  def classifierRawScore(toks: Column): Column =
    aggregate(transform(toks, classifierWeight _), lit(0L), (acc, x) => acc + x)

  /** Count of stopword tokens (lowercased). */
  def stopwordCount(c: Column): Column = stats(c)("n_stop").cast("int")

  private[graft] def stopwordCountComposed(c: Column): Column =
    size(filter(tokens(lower(c)), w => w.isin(Stopwords: _*)))

  /** Characters that are neither lowercase letters, digits nor spaces. */
  def punctCount(c: Column): Column = stats(c)("n_punct").cast("int")

  private[graft] def punctCountComposed(c: Column): Column =
    length(c) - length(regexp_replace(c, "[^a-z0-9 ]", ""))

  /** Composite quality score in [0,1]: stopword density, punctuation
    * cleanliness, length saturation. Expression shape is mirrored
    * exactly in the oracle SQL. */
  def qualityScore(nTokens: Column, stopRatio: Column, punctRatio: Column): Column =
    lit(0.4) * stopRatio + lit(0.3) * (lit(1.0) - punctRatio) +
      lit(0.3) * least(lit(1.0), nTokens.cast("double") / lit(100.0))

  /** The whole d2 quality score as ONE column over raw text — the
    * shared kernel of the d58 curriculum phases and the streaming
    * curriculum router, so the two can never drift. Identical
    * operation order to the d2 chain (the 0/0 guard included). */
  def docQualityScore(text: Column): Column = {
    val nTok = tokenCount(text)
    val stopRatio = stopwordCount(text).cast("double") / nTok.cast("double")
    val punctRatio = when(length(text) === 0, lit(0.0))
      .otherwise(punctCount(text).cast("double") / length(text).cast("double"))
    qualityScore(nTok, stopRatio, punctRatio)
  }

  /** DSIR hashed-bigram bucket sequence (d61 + streaming twin shared
    * kernel): d48's bigram convention bucketed by the d33 polyHash
    * rule. */
  def dsirBuckets(text: Column): Column =
    transform(Native.wordShingles(tokens(lower(text)), 2),
      b => (Native.polyHash(b, 1000003L) % lit(1024L)).cast("int"))

  /** Exact integer DSIR sum: Σ(model[bkt]+1) over a bucket sequence —
    * the add-one-smoothed occurrence mass under a 1024-bucket count
    * model shipped as a broadcast array literal. */
  def dsirSum(bkts: Column, model: Array[Long]): Column =
    aggregate(bkts, lit(0L),
      (acc, k) => acc + element_at(typedlit(model), k + 1) + lit(1L))

  /** Marker-word counts for deterministic language ID. */
  private def markers(c: Column, pattern: String): Column =
    size(regexp_extract_all(c, lit(pattern), lit(0)))

  val EnMarkers = "\\b(?:the|and|of|to)\\b"
  val EsMarkers = "\\b(?:el|la|de|que)\\b"
  val DeMarkers = "\\b(?:der|die|das|und)\\b"

  /** Deterministic n-gram/marker-word language ID (first rule that
    * clears the threshold wins; 'und' otherwise). Not a statistical
    * model — a scale-friendly heuristic with an exact oracle. */
  def langId(c: Column): Column = {
    val en = markers(c, EnMarkers)
    val es = markers(c, EsMarkers)
    val de = markers(c, DeMarkers)
    when(en >= 3 && en >= es && en >= de, "en")
      .when(es >= 3 && es >= de, "es")
      .when(de >= 3, "de")
      .otherwise("und")
  }

  /** GPT-2-style pretokenizer approximation: contractions, space-glued
    * word/number runs, punctuation runs, whitespace runs. A BPE-ish
    * token count without a merges table (the corpus is lowercase). */
  val BpePattern = "'(?:[sdmt]|ll|ve|re)| ?[a-z]+| ?[0-9]+| ?[^\\sa-z0-9]+|\\s+"

  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(c, lit(BpePattern), lit(0)))

  /** Polynomial rolling-hash fingerprint of the first 64 chars
    * (base 31, modulus 1e15 keeps Long exact in both engines). */
  def fingerprint(c: Column): Column =
    aggregate(
      split(substring(lower(c), 1, 64), ""),
      lit(0L),
      (acc, ch) => (acc * 31 + ascii(ch)) % 1000000000000000L)

  /** The d15/d69 portable multiplicative hash of a numeric id —
    * deterministic under any partitioning, identical in DuckDB. The
    * id reduces mod 2^31−1 BEFORE the multiply so the product stays
    * below 2^63 for any BIGINT id: without the reduction, ids above
    * ~3.47e9 overflow Long — Spark wraps silently while DuckDB errors
    * on BIGINT overflow, forking the engines exactly at the
    * multi-billion-document scales the shard/FIM queries target. */
  def portableHash(id: Column): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(2654435761L), lit(2147483647L))

  /** A SECOND independent id hash (LCG constants) for permutation
    * sort keys — d69's within-shard order and d70's second FIM cut.
    * Same pre-reduction as [[portableHash]] (max product ~2.37e18). */
  def portableHash2(id: Column): Column =
    pmod(pmod(id, lit(2147483647L)) * lit(1103515245L) + lit(12345L), lit(2147483647L))

  /** Training-shard assignment (d69 + streaming twin shared kernel). */
  def shardOf(id: Column, nShards: Long): Column =
    portableHash(id) % lit(nShards)

  /** Fill-in-the-middle PSM projection (Bavarian et al. 2022 — d70 +
    * streaming twin shared kernel): hash-gated rewrite of ~half the
    * rows into `<PRE> prefix <SUF> suffix <MID> middle` with
    * hash-derived cut points; pass-through rows keep the original
    * text. Pure in-row (zero shuffle). Returns a struct
    * (fim_applied, n_prefix, n_middle, n_suffix, psm_text). */
  def fimTransform(docId: Column, text: Column): Column = {
    val h1 = portableHash(docId)
    val h2 = portableHash2(docId)
    val toks = tokens(text)
    val n = size(toks)
    val applied = h1 % 2 === 0
    val lo = least(h1 % (n + 1), h2 % (n + 1)).cast("int")
    val hi = greatest(h1 % (n + 1), h2 % (n + 1)).cast("int")
    struct(
      applied.as("fim_applied"),
      when(applied, lo).otherwise(n).as("n_prefix"),
      when(applied, hi - lo).otherwise(lit(0)).as("n_middle"),
      when(applied, n - hi).otherwise(lit(0)).as("n_suffix"),
      when(applied,
        concat(lit("<PRE> "), array_join(slice(toks, lit(1), lo), " "),
          lit(" <SUF> "), array_join(slice(toks, hi + 1, n - hi), " "),
          lit(" <MID> "), array_join(slice(toks, lo + 1, hi - lo), " ")))
        .otherwise(text).as("psm_text"))
  }

  /** Hash-derived robots.txt rule set for a domain (d72 + streaming
    * twin shared kernel): array of (rpath, allow) structs — a blanket
    * "/" allow (absent for h%3 = 0 domains, exercising the
    * default-allow branch), a disallowed language section, and a
    * longer allow override inside it (exercising longest-match). */
  def robotsRuleArray(domain: Column): Column = {
    val h = Native.polyHash(domain, 1000003L)
    val bl = element_at(typedlit(Seq("en", "es", "de", "fr", "zh")),
      (pmod(h, lit(5L)) + 1).cast("int"))
    when(pmod(h, lit(3L)) === 0,
      array(
        struct(concat(lit("/"), bl, lit("/")).as("rpath"), lit(0).as("allow")),
        struct(concat(lit("/"), bl, lit("/p1")).as("rpath"), lit(1).as("allow"))))
      .otherwise(array(
        struct(lit("/").as("rpath"), lit(1).as("allow")),
        struct(concat(lit("/"), bl, lit("/")).as("rpath"), lit(0).as("allow")),
        struct(concat(lit("/"), bl, lit("/p1")).as("rpath"), lit(1).as("allow"))))
  }

  /** Sliding-window chunk structs over a token array — the shared
    * RAG/embedding chunking kernel (batch d54_rag_chunks ≡ streaming
    * streamRagChunks, so the two geometries cannot drift). Chunk count
    * = ⌈(n − overlap) / stride⌉ floored at 1: every doc (even empty)
    * yields a chunk and the trailing tokens are always covered. Pure
    * in-row; explode downstream of this stays shuffle-free. */
  def ragChunks(toks: Column, chunkSize: Int, stride: Int): Column = {
    val ov = chunkSize - stride
    val nChunks = greatest(lit(1),
      ceil((size(toks) - ov) / lit(stride.toDouble)).cast("int"))
    transform(sequence(lit(0), nChunks - 1), i =>
      struct(i.cast("int").as("chunk_idx"),
        (i * stride).cast("int").as("start_tok"),
        slice(toks, i * stride + 1, lit(chunkSize)).as("chunk")))
  }

  /** The Gopher rule GATE (Rae et al. 2021 table A1) over a
    * `Native.gopherStats` struct — the one boolean shared by the
    * batch d36 report and the streaming ingest screen, so the two
    * verdicts can never drift: word-count bounds, mean-word-length
    * bounds, symbol-to-word ratio, alphabetic-word fraction, required
    * stopwords. Same operation order as the d36 chain (ratios divide
    * exactly once each). */
  def gopherPass(g: Column): Column = {
    val nw = g("n_words").cast("double")
    g("n_words") >= 50 && g("n_words") <= 100000 &&
      (g("sum_wlen").cast("double") / nw) >= 3.0 &&
      (g("sum_wlen").cast("double") / nw) <= 10.0 &&
      (g("n_sym").cast("double") / nw) <= 0.1 &&
      (g("n_alpha").cast("double") / nw) >= 0.8 &&
      g("n_req_stop") >= 2
  }
}
