package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Native, Vectors}

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY §2c). Baseline: brute-force cosine top-k — a broadcast of
  * the (small) query set against a single pass over the corpus; the
  * rank-k filter after row_number() is planned as WindowGroupLimit,
  * so each task keeps only k rows before the shuffle. Scale path:
  * sign-LSH bucketing turns the scan into an equi-join on bucket.
  */
object Similarity {

  /** Layout-stable hyperplane pool: every LSH table owns
    * `MaxPlanesPerTable` consecutive planes of one deterministic pool,
    * the native expression always computes the FULL 16-bit bucket, and
    * a build that wants p < 16 planes per table masks the bucket to its
    * low p bits. Growing p therefore REFINES existing buckets (each
    * splits in two) instead of reshuffling them — and the SQL oracle
    * can reproduce any p by masking the same embedded plane pool. */
  private[graft] val MaxPlanesPerTable = 16

  /** Planes per table for a corpus of `n` vectors: the smallest
    * p ∈ [4, 16] with 32·2^p ≥ n, i.e. expected bucket occupancy is
    * held ≤ ~32 per table as the corpus grows. A FIXED p is the
    * quadratic-densification trap this repo measured at the
    * sf0.1→sf1 decade: with 8 tables × 2^4 buckets the band self-join
    * grew ~100× for 10× data (e4 16.3×, e8 15.0× wall-clock ratios);
    * occupancy-held bucketing keeps candidate volume ~32·nTables·n/2,
    * linear in n at ANY corpus size. Pure integer comparison so the
    * DuckDB oracle derives the identical p from count(*). */
  private[graft] def autoPlanes(n: Long): Int =
    (4 to MaxPlanesPerTable).find(j => (32L << j) >= n)
      .getOrElse(MaxPlanesPerTable)

  /** The banded (id, tbl, bucket) map shared by every sign-LSH surface:
    * full-width buckets from the stable pool, masked to `p` bits. */
  private def bandedLsh(df: DataFrame, idCol: String, p: Int,
                        nTables: Int, dim: Int): DataFrame = {
    val planes = Vectors.randomPlanes(nTables * MaxPlanesPerTable, dim)
    df.select(col(idCol),
        posexplode(Native.lshBuckets(col("embedding"), planes, MaxPlanesPerTable))
          .as(Seq("tbl", "bucket")))
      .withColumn("bucket", col("bucket").bitwiseAND(lit((1L << p) - 1)))
  }

  /** Brute-force cosine top-k: every query against the full corpus.
    * `queries` must be small (it is broadcast). Self-matches excluded. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Vectors.cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Maximum-inner-product top-k (the recommendation / retrieval
    * primitive: cosine ranks direction, MIPS ranks direction×length).
    * Brute force is the e1 shape — broadcast query set, one corpus
    * pass, rank≤k planned as WindowGroupLimit. The same pass computes
    * the NORM-AUGMENTATION reduction score (append
    * sqrt(M²−‖x‖²)/M to x/M and 0 to the unit query; then
    * cos(q′,x′) = ip/(‖q‖·M)) — the public trick that turns any
    * cosine index (e2's LSH tables, e3/e9's IVF cells) into a MIPS
    * index at scale — and `aug_agrees` machine-checks per row that
    * the reduced score induces the identical ranking. The corpus max
    * norm M is a 1-row broadcast. */
  def mipsTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val mx = corpus.agg(max(Vectors.norm2(col("embedding"))).as("maxnorm"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("ce"))
    val scored = c.crossJoin(broadcast(q)).crossJoin(broadcast(mx))
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Vectors.dot(col("qe"), col("ce")).as("ip"),
        Vectors.norm2(col("qe")).as("qn"), col("maxnorm"))
      // aug_cos derives from the ip COLUMN — the O(dim) dot fold is
      // guaranteed to evaluate once per row, with or without codegen CSE
      .select(col("q_id"), col("cand_id"), col("ip"),
        (col("ip") / (col("qn") * col("maxnorm"))).as("aug_cos"))
    val wIp = Window.partitionBy("q_id").orderBy(col("ip").desc, col("cand_id"))
    val wAug = Window.partitionBy("q_id").orderBy(col("aug_cos").desc, col("cand_id"))
    // rank≤k filters adjacent to the ip window (so WindowGroupLimit
    // keeps k rows per task); the agreement re-rank then runs over the
    // ≤k survivors on the SAME q_id partitioning — no extra exchange
    scored.withColumn("rank", row_number().over(wIp))
      .filter(col("rank") <= k)
      .withColumn("aug_rank", row_number().over(wAug))
      .select(col("q_id"), col("rank"), col("cand_id"), col("ip"),
        (col("rank") === col("aug_rank")).cast("integer").as("aug_agrees"))
  }

  /** Multi-table sign-LSH ANN: `nTables` independent hash tables of
    * `planesPerTable` hyperplanes each; a candidate is scored if it
    * shares a bucket with the query in ANY table (union-of-tables is
    * what makes sign-LSH recall workable on high-dim data). Each corpus
    * row expands to `nTables` (table, bucket) keys — a narrow map —
    * and the only wide operation is the equi-join on that key against
    * the broadcast query side, so the corpus shuffles at most once. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nTables: Int = 8, planesPerTable: Int = 0, dim: Int = 64): DataFrame = {
    // planesPerTable = 0 → auto-tune from corpus size (occupancy-held
    // bucketing; see autoPlanes): per-query candidate volume stays
    // ~32·nTables instead of growing linearly with the corpus
    val p = if (planesPerTable > 0) planesPerTable else autoPlanes(corpus.count())
    val planes = Vectors.randomPlanes(nTables * MaxPlanesPerTable, dim)
    def buckets(v: org.apache.spark.sql.Column) =
      graft.functions.Native.lshBuckets(v, planes, MaxPlanesPerTable)
    val mask = lit((1L << p) - 1)
    val c = corpus.select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        posexplode(buckets(col("embedding"))).as(Seq("tbl", "bucket")))
      .withColumn("bucket", col("bucket").bitwiseAND(mask))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        posexplode(buckets(col("embedding"))).as(Seq("tbl", "bucket")))
      .withColumn("bucket", col("bucket").bitwiseAND(mask))
    val scored = c.join(broadcast(q), Seq("tbl", "bucket"))
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("qe"), col("cand_id"), col("ce"))
      .dropDuplicates("q_id", "cand_id")
      .select(col("q_id"), col("cand_id"),
        Vectors.cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Embedding-cosine near-dup pairs with sign-LSH blocking: each
    * vector expands to `nTables` (table, bucket) keys — a narrow map —
    * and candidate pairs come from the self-equi-join on that key, with
    * exact cosine verifying only candidates. There is no label- or
    * corpus-wide self-join, so the shape holds at any corpus size
    * (recall is the union-of-tables LSH recall, tunable via
    * nTables/planesPerTable). Each self-join side recomputes the cheap
    * bucketing map over its own scan by default; `singleScan = true`
    * repartitions the banded rows on (tbl, bucket) so both sides share
    * one canonical exchange and the corpus is scanned once — use it
    * when the scan (wide rows, remote storage) dominates the cheap
    * bucketing map; at bench scale the forced exchange costs more. */
  def lshNearDupPairs(corpus: DataFrame, minCos: Double,
                      nTables: Int = 8, planesPerTable: Int = 0,
                      dim: Int = 64, singleScan: Boolean = false): DataFrame = {
    // planesPerTable = 0 → auto-tune from corpus size: a fixed p makes
    // the band self-join quadratic (occupancy grows with n); the
    // occupancy-held p keeps candidate pairs ~32·nTables·n/2, linear
    val p = if (planesPerTable > 0) planesPerTable else autoPlanes(corpus.count())
    // banded rows carry ONLY (vec_id, tbl, bucket): candidate pairs and
    // their dedup exchange move 16-byte keys, not embedding payloads
    // (shipping vectors through an 8-way band explosion is the
    // 100 TB shuffle sin); vectors join back by id for the verify pass
    val banded = bandedLsh(corpus, "vec_id", p, nTables, dim)
    // with singleScan, both self-join sides become canonically identical
    // exchanges that AQE stage reuse executes ONCE (the simhashNearDups
    // shape, gated in PlanSpec)
    val b = if (singleScan) banded.repartition(col("tbl"), col("bucket")) else banded
    val pairs = b.as("a").join(b.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
      .dropDuplicates("a_id", "b_id")
    val e = corpus.select(col("vec_id"), col("embedding"))
    pairs
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ae")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("be")), "b_id")
      .select(col("a_id"), col("b_id"), Vectors.cosine(col("ae"), col("be")).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** IVF + scalar quantization (the FAISS IVF-SQ8 index family):
    * coarse cells bound the candidate set exactly as [[ivfTopK]], and
    * the scan side carries 8-bit codes — one byte per dimension, 4×
    * narrower than the float vectors (vs PQ's 8 bytes/vector but with
    * much higher recall: SQ quantizes each dimension independently
    * instead of 8-dim subspaces). Train = per-dimension min/max, ONE
    * distributive aggregate whose 1-row result is a stats bootstrap,
    * not data movement; encode = floor((x−min)·255/(max−min)) clamped,
    * a narrow map; score = inner product against the midpoint
    * reconstruction min + (code+0.5)·(max−min)/255, folded
    * d-ascending in double so the SQL oracle reproduces every code
    * and score exactly. Probes broadcast; per-query top-k is a
    * WindowGroupLimit. */
  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
                 nlist: Int = 16, nprobe: Int = 4, dim: Int = 64): DataFrame = {
    val statsRow = corpus.agg(
      array((0 until dim).map(i =>
        min(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mns"),
      array((0 until dim).map(i =>
        max(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mxs"))
      .collect()(0)
    val mns = statsRow.getSeq[Double](0).toArray
    val mxs = statsRow.getSeq[Double](1).toArray
    val cents = bootCentroids(corpus, nlist)
    val centScores = centScoresFor(cents) _
    // cell + code: the only columns that ever leave the corpus scan.
    // Encode and score are NATIVE loop expressions (plans/Sq8Exprs):
    // the formerly-composed 64-element array() + 64-term sum unrolled
    // past Janino's 64 KB method limit, which made the whole stage
    // silently fall back to interpreted execution (caught by the
    // bench's codegen-fallback gate). Same math, same zero-range
    // guard (code 0), same d-ascending double fold — oracle unchanged.
    val codes = cellAssign(corpus, centScores)
      .select(col("cand_id"), col("cell"),
        Native.sq8Encode(col("ce"), mns, mxs).as("code"))
    val q = ivfQueries(queries, centScores, nlist, nprobe)
    val scales = Array.tabulate(dim)(i => (mxs(i) - mns(i)) / 255.0)
    val score = Native.sq8Score(col("qe"), col("code"), mns, scales)
    val scored = codes.join(broadcast(q), "cell")
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"), score.as("sq_ip"))
    val w = Window.partitionBy("q_id").orderBy(col("sq_ip").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Two-stage ANN cascade (the FAISS search-then-refine deployment
    * shape): the quantized index ([[ivfSq8TopK]]) generates a top-`c`
    * candidate set per query from CODES only, then the exact cosine
    * re-ranks those `c` rows to the final top-`k` with the true float
    * vectors joined back BY ID — so full-precision vectors are read
    * for c rows per query, not the corpus. Refinement cost is
    * constant per query (c ≈ 3-10× k) on top of the index probe; the
    * re-rank reuses the q_id partitioning the candidate top-c already
    * established (no extra exchange beyond the id joins). */
  def annRerankTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    c: Int = 30, nlist: Int = 16, nprobe: Int = 4,
                    dim: Int = 64): DataFrame = {
    val cand = ivfSq8TopK(corpus, queries, k = c, nlist, nprobe, dim)
      .select(col("q_id"), col("cand_id"))
    val exact = cand
      .join(broadcast(queries.select(col("vec_id").as("q_id"),
        col("embedding").as("qe"))), "q_id")
      .join(corpus.select(col("vec_id").as("cand_id"),
        col("embedding").as("ce")), "cand_id")
      .select(col("q_id"), col("cand_id"),
        Vectors.cosine(col("qe"), col("ce")).as("cos"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    exact.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Cluster count for a SemDeDup corpus of `n` vectors: the smallest
    * power of two in [16, 4096] whose expected cell occupancy n/nlist
    * is ≤ 64. A FIXED nlist is the quadratic-densification trap this
    * repo measured at the sf0.1→sf1 decade (e13 13.5× wall-clock for
    * 10× data, isolated re-measure confirming it was pair volume, not
    * JIT): within-cell pairs total n²/(2·nlist), so holding occupancy
    * makes them ≤ 32·n — linear — exactly the published SemDeDup
    * posture, where cluster count grows with the corpus (the paper
    * runs ~100k clusters). Pure-integer rule so the DuckDB oracle
    * derives the identical nlist from count(*) — the SQL derivation
    * interpolates [[AutoNlistMinExp]]/[[AutoNlistMaxExp]], so the two
    * sides cannot fork silently (property-checked in SimilaritySpec).
    *
    * Above [[FlatAssignCap]] cells the flat n·nlist assignment stops
    * being the right plan, and [[semCells]] switches to the two-level
    * IMI-style coarse quantizer ([[semCellsTwoLevel]]) — n·2√nlist
    * scores, branch-bounded broadcasts. The exponent cap 24 holds
    * target occupancy up to ~10^9 vectors (16.7M cells × 64), the
    * honest large-corpus posture. */
  private[graft] val AutoNlistMinExp = 4
  private[graft] val AutoNlistMaxExp = 24
  /** Largest nlist the flat broadcast-centroid assignment uses; above
    * it [[semCells]] assigns hierarchically. 4096 centroids × 64-dim
    * floats ≈ 1 MiB broadcast — far below any broadcast threshold,
    * while n·4096 cosine rows per scan task is already the compute
    * ceiling worth paying for oracle-exact flat Voronoi cells. */
  private[graft] val FlatAssignCap = 4096
  private[graft] def autoNlist(n: Long): Int =
    (AutoNlistMinExp to AutoNlistMaxExp).map(1 << _)
      .find(p => p.toLong * 64L >= n).getOrElse(1 << AutoNlistMaxExp)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic dedup by
    * clustering: assign every vector to a coarse cell (centroids = the
    * first nlist corpus vectors, the same deterministic bootstrap rule
    * as [[ivfTopK]], so cell geometry is SQL-derivable), generate
    * candidate pairs ONLY within a cell, verify with exact cosine, and
    * drop the higher-id member of every pair at or above `minCos` (a
    * deterministic keeper in place of the paper's centroid-distance
    * rule — same dedup set shape, oracle-exact). Complements
    * [[lshNearDupPairs]] (e4/e6): hyperplane buckets catch
    * near-identical vectors with tunable recall; cells partition the
    * space exhaustively, so within-cell dedup is the published
    * semantic-prune shape for LLM training corpora. The candidate
    * self-join carries ONLY (vec_id, cell) — embeddings join back by
    * id for the verify pass — and both sides share one canonical cell
    * exchange.
    *
    * nlist = 0 (default) auto-scales with the corpus ([[autoNlist]]).
    * Assignment is a broadcast join against the ≤4096-row centroid
    * side with a map-side max_by argmax — NOT the inlined-literal
    * centroid expression the probe-query family uses: at nlist ≥ ~128
    * the literal form outgrows Janino method limits, and the n·nlist
    * score rows here collapse to n rows in the partial aggregate, so
    * nothing wide ever shuffles. */
  /** The occupancy-held SemDeDup cell map: (vec_id, cell) for every
    * corpus vector, cell = argmax-cosine bootstrap centroid (highest
    * score, lowest cid on ties — bit-identical to the oracles'
    * ROW_NUMBER ORDER BY cs DESC, cid). Assignment is a broadcast
    * join against the ≤4096-row centroid side with a map-side max_by
    * argmax — n·nlist score rows collapse to n in the partial
    * aggregate, nothing wide shuffles. NOT pre-partitioned on cell:
    * each consumer decides its own exchange (semDedup repartitions so
    * the self-join shares one canonical exchange; diversitySample
    * lets the window insert the exchange so its group limit can run
    * partial, upstream of it).
    *
    * `knownN` short-circuits the corpus count the auto-nlist rule
    * needs, so composed operators (semDedup then diversitySample over
    * one corpus) count once, not per call.
    *
    * Above [[FlatAssignCap]] centroids, assignment switches to the
    * two-level hierarchical quantizer ([[semCellsTwoLevel]]) — the
    * published IMI / coarse-quantizer posture for very large cell
    * counts. Below the cap (every oracle-graded scale: the SQL flat
    * rule holds up to 4096·64 = 262144 vectors) the two rules use the
    * same bootstrap geometry and the flat path runs unchanged. */
  private[graft] def semCells(corpus: DataFrame, nlist: Int = 0,
                              knownN: Long = -1L): DataFrame = {
    val nl = if (nlist > 0) nlist
             else autoNlist(if (knownN >= 0) knownN else corpus.count())
    val cents = bootCentroidCols(corpus, nl)
    if (nl <= FlatAssignCap) semCellsFlat(corpus, cents)
    else semCellsTwoLevel(corpus, cents, nl)
  }

  /** The deterministic (cid, centv) bootstrap as a DataFrame: first
    * `nl` vectors by id. For dense ids 0..n-1 (the in-repo tables) the
    * rule collapses to a pushable vec_id < nl filter; the guard is
    * EXACT — ids are unique, so the filter returns nl rows iff
    * {0..nl-1} are all present — and an arbitrary (filtered /
    * offset-id) corpus falls back to the orderBy/limit bootstrap
    * instead of silently assigning against a short or empty centroid
    * set. */
  private[graft] def bootCentroidCols(corpus: DataFrame, nl: Int): DataFrame = {
    val fast = corpus.filter(col("vec_id") < nl)
      .select(col("vec_id").as("cid"), col("embedding").as("centv"))
    if (fast.count() == nl) fast
    else corpus.orderBy("vec_id").limit(nl)
      .select(col("vec_id").as("cid"), col("embedding").as("centv"))
  }

  private[graft] def semCellsFlat(corpus: DataFrame, cents: DataFrame): DataFrame =
    corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(broadcast(cents))
      .select(col("vec_id"), col("cid"),
        Vectors.cosine(col("embedding"), col("centv")).as("cs"))
      .groupBy("vec_id")
      .agg(max(struct(col("cs"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vec_id"), (-col("m")("ncid")).as("cell"))

  /** Two-level coarse quantizer for cell counts above
    * [[FlatAssignCap]] — the inverted-multi-index shape FAISS-class
    * systems use when a flat coarse scan stops scaling:
    *
    *  1. supers = the first ⌈√nlist⌉ (next power of two) bootstrap
    *     centroids — a broadcast-sized table at ANY nlist ≤ 2^24;
    *  2. every centroid joins its argmax-cosine super (branch) — an
    *     nlist-row broadcast join, n-independent;
    *  3. every vector finds its branch the same way (n·S scores,
    *     collapsing map-side), then equi-joins the ~√nlist centroids
    *     OF THAT BRANCH ONLY and takes the within-branch argmax —
    *     n·(nlist/S) scores instead of n·nlist.
    *
    * Total score work is n·O(√nlist) and no broadcast ever exceeds
    * the super table — that is what makes occupancy-held cell counts
    * viable at 10^9+ vectors. The hierarchical cell rule equals flat
    * Voronoi assignment whenever a vector's nearest super agrees with
    * its nearest centroid's branch (always true for margin-separated
    * clusters — spec-proven; the published IMI recall caveat
    * otherwise). Ties break to the lowest sid/cid exactly like the
    * flat rule. */
  private[graft] def semCellsTwoLevel(corpus: DataFrame, cents: DataFrame,
                                      nl: Int): DataFrame = {
    val nSupers = {
      var s = 1
      while (s.toLong * s < nl) s <<= 1
      s
    }
    // supers are the first nSupers centroids BY ID — reuse the same
    // dense-prefix fast path the bootstrap uses (cents is tiny here
    // relative to the corpus, so the count guard is cheap)
    val supers = broadcast(cents.orderBy("cid").limit(nSupers)
      .select(col("cid").as("sid"), col("centv").as("sv")))
    // branch of every centroid: argmax cosine over supers, ties to the
    // lowest sid; centv rides inside the argmax struct (sid is unique,
    // so the comparison never reaches it)
    val centBranch = cents
      .crossJoin(supers)
      .select(col("cid"),
        Vectors.cosine(col("centv"), col("sv")).as("scs"),
        (-col("sid")).as("nsid"), col("centv"))
      .groupBy("cid")
      .agg(max(struct(col("scs"), col("nsid"), col("centv"))).as("m"))
      .select((-col("m")("nsid")).as("branch"), col("cid"),
        col("m")("centv").as("centv"))
    // branch of every vector, same rule, embedding riding the struct
    val vecBranch = corpus.select(col("vec_id"), col("embedding"))
      .crossJoin(supers)
      .select(col("vec_id"),
        Vectors.cosine(col("embedding"), col("sv")).as("scs"),
        (-col("sid")).as("nsid"), col("embedding"))
      .groupBy("vec_id")
      .agg(max(struct(col("scs"), col("nsid"), col("embedding"))).as("m"))
      .select(col("vec_id"), (-col("m")("nsid")).as("branch"),
        col("m")("embedding").as("embedding"))
    // within-branch argmax — the equi-join fans each vector out to its
    // branch's ~√nlist centroids only
    vecBranch.join(centBranch, "branch")
      .select(col("vec_id"), col("cid"),
        Vectors.cosine(col("embedding"), col("centv")).as("cs"))
      .groupBy("vec_id")
      .agg(max(struct(col("cs"), (-col("cid")).as("ncid"))).as("m"))
      .select(col("vec_id"), (-col("m")("ncid")).as("cell"))
  }

  /** Cluster-level diversity sampling (e18): keep at most `k` vectors
    * per SemDeDup cell, chosen by the portable multiplicative hash of
    * vec_id (deterministic and engine-reproducible, like d15's corpus
    * sample) — the cluster-balanced pruning step semantic curation
    * runs AFTER semDedup removed near-duplicates: a cell that holds
    * thousands of routine variants contributes k representatives, a
    * rare cell keeps everything. rank ≤ k over a literal k plans as
    * WindowGroupLimit, and because the cell map arrives unpartitioned
    * the window's own exchange carries the partial mode: each task
    * keeps ≤ k rows per cell BEFORE the cell shuffle (plan-gated in
    * PlanSpec), so a million-vector cell ships k rows per input
    * partition, never the cell. */
  def diversitySample(corpus: DataFrame, k: Int, nlist: Int = 0,
                      knownN: Long = -1L): DataFrame = {
    val cells = semCells(corpus, nlist, knownN)
    val h = graft.functions.Text.portableHash(col("vec_id"))
    val w = Window.partitionBy("cell").orderBy(h.asc, col("vec_id").asc)
    cells.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("vec_id"), col("cell"), col("rank"))
  }

  def semDedup(corpus: DataFrame, minCos: Double, nlist: Int = 0,
               knownN: Long = -1L): DataFrame = {
    // the self-join's two sides are canonically identical, so the
    // explicit cell repartition is executed once and stage-reused
    val cells = semCells(corpus, nlist, knownN).repartition(col("cell"))
    val pairs = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"))
    val e = corpus.select(col("vec_id"), col("embedding"))
    val dups = pairs
      .join(e.select(col("vec_id").as("a_id"), col("embedding").as("ae")), "a_id")
      .join(e.select(col("vec_id").as("b_id"), col("embedding").as("be")), "b_id")
      .filter(Vectors.cosine(col("ae"), col("be")) >= minCos)
      .select(col("b_id").as("vec_id")).distinct()
    corpus.join(dups, Seq("vec_id"), "left_anti")
  }

  /** k-NN graph over the whole corpus — every node's k nearest
    * bucket-mates (the structure semantic clustering / graph-based
    * dedup builds on). Candidates come from the same sign-LSH banding
    * as [[lshNearDupPairs]] (narrow 16-byte (id, tbl, bucket) rows
    * through the band self-equi-join, vectors join back by id), and
    * the per-node top-k is a WindowGroupLimit — each task keeps only
    * k rows before the final shuffle. No corpus-wide cross join at
    * any scale; recall is the union-of-tables LSH recall. Unlike the
    * near-dup pairs the graph is DIRECTED: each node ranks all its
    * own bucket-mates, so (a → b) can exist without (b → a). */
  def knnGraph(corpus: DataFrame, k: Int,
               nTables: Int = 8, planesPerTable: Int = 0,
               dim: Int = 64): DataFrame = {
    // planesPerTable = 0 → auto-tune (see autoPlanes): the corpus-wide
    // band self-join stays linear in n because occupancy is held ~32
    val p = if (planesPerTable > 0) planesPerTable else autoPlanes(corpus.count())
    val banded = bandedLsh(corpus, "vec_id", p, nTables, dim)
    val pairs = banded.as("a").join(banded.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("src"), col("b.vec_id").as("dst"))
      .dropDuplicates("src", "dst")
    val e = corpus.select(col("vec_id"), col("embedding"))
    val scored = pairs
      .join(e.select(col("vec_id").as("src"), col("embedding").as("se")), "src")
      .join(e.select(col("vec_id").as("dst"), col("embedding").as("de")), "dst")
      .select(col("src"), col("dst"), Vectors.cosine(col("se"), col("de")).as("cos"))
    val w = Window.partitionBy("src").orderBy(col("cos").desc, col("dst"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Two-hop neighborhood expansion over the [[knnGraph]] — the
    * neighbor-of-neighbor candidate generation graph-based retrieval
    * and diversification run (an HNSW-style expansion expressed as
    * set algebra): per node, the 1-hop out-degree, the count of
    * DISTINCT nodes first reached at hop 2 (not self, not already a
    * 1-hop neighbor), and their ratio — the graph's expansion factor,
    * the health metric that predicts whether greedy graph search can
    * escape a node's local bucket. Scale shape: the edge table is
    * n·k narrow rows, localCheckpoint'd so the LSH chain runs ONCE;
    * hop 2 is one edge-edge equi-join on the shared dst=src key plus
    * a (src,dst) distinct and a left-anti against hop 1 — all
    * hash-partitioned by the same narrow keys, no vector payload
    * anywhere past the scoring join inside knnGraph. */
  def knnExpand(corpus: DataFrame, k: Int,
                nTables: Int = 8, planesPerTable: Int = 0,
                dim: Int = 64): DataFrame = {
    val edges = knnGraph(corpus, k, nTables, planesPerTable, dim)
      .select(col("src"), col("dst"))
      .localCheckpoint() // reused three times: run the LSH chain once
    val hop2 = edges.as("e1")
      .join(edges.as("e2"), col("e1.dst") === col("e2.src"))
      .select(col("e1.src").as("src"), col("e2.dst").as("dst"))
      .filter(col("src") =!= col("dst"))
      .dropDuplicates("src", "dst")
    val new2 = hop2.join(edges, Seq("src", "dst"), "left_anti")
    val deg1 = edges.groupBy("src").agg(count(lit(1)).as("n_hop1"))
    val deg2 = new2.groupBy("src").agg(count(lit(1)).as("n_hop2_new"))
    deg1.join(deg2, Seq("src"), "left")
      .select(col("src"), col("n_hop1"),
        coalesce(col("n_hop2_new"), lit(0L)).as("n_hop2_new"))
      .withColumn("expansion",
        col("n_hop2_new").cast("double") / col("n_hop1").cast("double"))
      .orderBy("src")
  }

  /** Matryoshka (MRL-style) truncation evaluation: retrieve with only
    * the FIRST `dims` dimensions of every embedding and report, for
    * each truncated top-k row, its truncated and full cosines plus
    * whether it also sits in the full-dimension top-k — the
    * measurement that decides how far an index can truncate vectors
    * (4× memory/bandwidth at dims=16 of 64) before recall pays. ONE
    * corpus pass computes both folds; both ranks share one q_id
    * exchange (two sorts, no second scan); ties (cos desc, cand asc)
    * keep the report oracle-reproducible. */
  def truncatedTopK(corpus: DataFrame, queries: DataFrame, dims: Int,
                    k: Int): DataFrame = {
    require(dims > 0 && k > 0, "dims and k must be positive")
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("qe"), slice(col("embedding"), 1, dims).as("qet"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), slice(col("embedding"), 1, dims).as("cet"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Vectors.cosine(col("qet"), col("cet")).as("cos_t"),
        Vectors.cosine(col("qe"), col("ce")).as("cos_full"))
    val wt = Window.partitionBy("q_id").orderBy(col("cos_t").desc, col("cand_id"))
    val wf = Window.partitionBy("q_id").orderBy(col("cos_full").desc, col("cand_id"))
    scored
      .withColumn("rank_t", row_number().over(wt))
      .withColumn("rank_full", row_number().over(wf))
      .filter(col("rank_t") <= k)
      .select(col("q_id"), col("rank_t"), col("cand_id"),
        col("cos_t"), col("cos_full"), (col("rank_full") <= k).as("in_full_topk"))
      .orderBy("q_id", "rank_t")
  }

  /** Binary (1-bit-per-dimension) quantization retrieval — the far
    * end of the e15/e24 compression ladder: each 64-dim float vector
    * collapses to ONE 64-bit sign signature (64× narrower than
    * floats), candidates rank by Hamming distance (a single XOR +
    * popcount per pair — the cheapest similarity there is), and the
    * report carries the full cosine and full-top-k membership so the
    * recall cost of 1-bit quantization is measured, not assumed.
    * Signatures build in-row (aggregate over the dimension range, no
    * shuffle); ties (hamming asc, cand asc) keep the ranking
    * oracle-reproducible. */
  def binaryQuantTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val sig = expr("aggregate(sequence(0, 63), 0L, " +
      "(acc, i) -> acc + IF(embedding[i] > 0, shiftleft(1L, i), 0L))")
    val q = queries.select(col("vec_id").as("q_id"),
      col("embedding").as("qe"), sig.as("sq"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("embedding").as("ce"), sig.as("sc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        expr("bit_count(sq ^ sc)").as("hamming"),
        Vectors.cosine(col("qe"), col("ce")).as("cos_full"))
    val wh = Window.partitionBy("q_id").orderBy(col("hamming").asc, col("cand_id"))
    val wf = Window.partitionBy("q_id").orderBy(col("cos_full").desc, col("cand_id"))
    scored
      .withColumn("rank", row_number().over(wh))
      .withColumn("rank_full", row_number().over(wf))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("cand_id"), col("hamming"),
        col("cos_full"), (col("rank_full") <= k).as("in_full_topk"))
      .orderBy("q_id", "rank")
  }

  /** Greedy BEAM SEARCH over the [[knnGraph]] — the search half of
    * graph-based ANN (the HNSW/NSG navigation loop, expressed as a
    * fixed number of expand-score-prune rounds): every query starts a
    * frontier at `entryId`, each round unions the frontier with its
    * out-neighbors, scores candidates by exact cosine against the
    * query, and keeps the top-`beam`; after `rounds` rounds the
    * frontier IS the result (rank + cos). Deterministic: ties break
    * (cos desc, node asc), so the walk is oracle-reproducible.
    *
    * Scale shape: the frontier is queries×beam rows — broadcast on
    * BOTH joins every round (frontier→edges to expand, candidates→
    * corpus to score), so no round shuffles the edge list or the
    * vectors; the corpus-sized work is the probe scans, which
    * bucketing/z-order on (src | vec_id) would prune to point reads
    * on a real deployment. The edge list is localCheckpoint'd so the
    * LSH chain runs once, not once per round. Self-retrieval is
    * allowed (a corpus member navigating to itself is the
    * connectivity sanity signal, cos = 1). */
  def graphSearch(corpus: DataFrame, queries: DataFrame, beam: Int,
                  rounds: Int, entryId: Long = 0L, k: Int = 5,
                  nTables: Int = 8, planesPerTable: Int = 0,
                  dim: Int = 64): DataFrame = {
    val edges = knnGraph(corpus, k, nTables, planesPerTable, dim)
      .select(col("src"), col("dst"))
      .localCheckpoint()
    graphSearchFrom(edges, corpus, queries, beam, rounds, Seq(entryId))
  }

  /** Persist the kNN graph as a TABLE — the index-is-data lifecycle on
    * the graph side (the writeIvfIndex/writeClusterMap pattern): the
    * LSH banding + scoring + per-src top-k chain runs ONCE per corpus
    * generation and lands as narrow (src, rank, dst, cos) rows (~28
    * bytes/edge, n·k total regardless of vector width); every
    * consumer search is then a scan of the edge table — at 100 TB you
    * never re-run the graph build per query. */
  def writeKnnGraph(corpus: DataFrame, path: String, k: Int = 5,
                    nTables: Int = 8, planesPerTable: Int = 0,
                    dim: Int = 64): Unit =
    knnGraph(corpus, k, nTables, planesPerTable, dim)
      .select(col("src"), col("rank"), col("dst"), col("cos"))
      .write.mode("overwrite").parquet(path)

  /** Memoized build behind the parquet `_SUCCESS` marker (the shared
    * Materialize.ensure contract d47/d50/e26 ride); returns the narrow
    * (src, dst) edge list ready for [[graphSearchFrom]]. */
  def ensureKnnGraph(corpus: DataFrame, path: String, k: Int = 5,
                     nTables: Int = 8, planesPerTable: Int = 0,
                     dim: Int = 64): DataFrame =
    graft.sources.Materialize.ensure(corpus.sparkSession, path) {
      writeKnnGraph(corpus, path, k, nTables, planesPerTable, dim)
    }.select(col("src"), col("dst"))

  /** [[graphSearch]] over a PREBUILT edge list and an arbitrary ENTRY
    * SET — multi-entry navigation (one walker per entry, merged into
    * one frontier before the first prune) is how graph ANN escapes the
    * single-entry local-bucket trap that e23 measures: with one entry
    * the beam can only reach the entry's component neighborhood, while
    * k spread entries cover k neighborhoods for the same per-round
    * cost (the frontier is still ≤ queries×beam after round 1).
    * Callers that search the same graph repeatedly (e23's recall-vs-
    * entry-count report) build the edges ONCE and pass them here. */
  def graphSearchFrom(edges: DataFrame, corpus: DataFrame, queries: DataFrame,
                      beam: Int, rounds: Int, entryIds: Seq[Long]): DataFrame = {
    require(beam > 0 && rounds > 0, "beam and rounds must be positive")
    require(entryIds.nonEmpty, "at least one entry node")
    val e = corpus.select(col("vec_id").as("node"), col("embedding").as("ce"))
    val q0 = queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"))
    var frontier = q0
      .select(col("q_id"), explode(array(entryIds.distinct.map(lit): _*)).as("e"))
      .select(col("q_id"), col("e").cast("long").as("node"))
    var result: DataFrame = null
    var r = 0
    while (r < rounds) {
      val expanded = broadcast(frontier)
        .join(edges, frontier("node") === edges("src"))
        .select(col("q_id"), col("dst").as("node"))
        .union(frontier.select(col("q_id"), col("node")))
        .dropDuplicates("q_id", "node")
      val scored = broadcast(expanded)
        .join(e, "node")
        .join(broadcast(q0), "q_id")
        .select(col("q_id"), col("node"),
          Vectors.cosine(col("qe"), col("ce")).as("cos"))
      val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("node"))
      result = scored.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= beam)
      frontier = result.select(col("q_id"), col("node"))
      r += 1
    }
    result.select(col("q_id"), col("rank"), col("node"), col("cos"))
      .orderBy("q_id", "rank")
  }

  /** The e14 semantic clusters (LSH-blocked near-dup pairs closed into
    * connected components) as the ONE shared definition for the
    * per-query path and the persisted-map lifecycle below — the
    * embedding-side analog of `Dedup.clusterMap`. */
  def semanticClusterMap(corpus: DataFrame, minCos: Double = 0.2): DataFrame =
    graft.operators.Dedup.connectedComponents(lshNearDupPairs(corpus, minCos))
      .select(col("id").as("vec_id"), col("cluster"))

  /** Persist the semantic cluster map (16-byte (vec_id, cluster) rows;
    * vectors in no near-dup pair are absent — their own singleton). */
  def writeSemanticClusterMap(corpus: DataFrame, path: String,
                              minCos: Double = 0.2): Unit =
    semanticClusterMap(corpus, minCos).write.mode("overwrite").parquet(path)

  /** Read a [[writeSemanticClusterMap]] table. */
  def readSemanticClusterMap(spark: org.apache.spark.sql.SparkSession,
                             path: String): DataFrame =
    spark.read.parquet(path)

  /** Read the persisted semantic cluster map, building iff the path
    * was never committed (the Materialize build-once lifecycle). */
  def ensureSemanticClusterMap(corpus: DataFrame, path: String,
                               minCos: Double = 0.2): DataFrame =
    graft.sources.Materialize.ensure(corpus.sparkSession, path) {
      writeSemanticClusterMap(corpus, path, minCos)
    }

  /** SemDeDup's published KEEP rule (arXiv:2303.09540 §2: within each
    * duplicate cluster keep the example with the LOWEST cosine
    * similarity to the cluster centroid — the farthest-from-center
    * member preserves the most diversity) over an explicit (vec_id,
    * cluster) assignment — the consumer query of the persisted
    * semantic cluster map.
    *
    * Centroids use the lloydRefine fixed-point mean (floor to µ-units,
    * exact long sums, O(1) aggregation state per (cluster, dim)), so
    * the keep decision is bit-deterministic under any partitioning and
    * the whole rule SQL-oracles. Embeddings shuffle ONCE keyed by
    * cluster (the mean pass); the centroid table is (clusters × dim)
    * narrow rows; per-cluster argmin is one WindowGroupLimit — no
    * member buffering anywhere. Ties (cos asc, then vec_id) are
    * portable because the mean arithmetic is exact. */
  def semDedupKeep(corpus: DataFrame, clusters: DataFrame): DataFrame = {
    val members = corpus.select(col("vec_id"), col("embedding"))
      .join(clusters, "vec_id")
    val means = members
      .select(col("cluster"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .select(col("cluster"), col("pos"),
        floor(col("v").cast("double") * lit(MeanScale)).as("fx"))
      .groupBy("cluster", "pos")
      .agg((sum(col("fx")).cast("double") / lit(MeanScale) /
        count(lit(1)).cast("double")).as("m"))
      .groupBy("cluster")
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        s => s("m")).as("centroid"))
    val w = Window.partitionBy("cluster")
      .orderBy(col("cos_centroid").asc, col("vec_id"))
    val wc = Window.partitionBy("cluster")
    members.join(means, "cluster")
      .select(col("cluster"), col("vec_id"),
        Vectors.cosine(col("embedding"), col("centroid")).as("cos_centroid"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_members", count(lit(1)).over(wc))
      .filter(col("rn") === 1)
      .select(col("cluster"), col("vec_id").as("kept_vec"),
        col("cos_centroid").as("kept_cos"), col("n_members"))
      .orderBy("cluster")
  }

  /** Fixed-point scale for deterministic centroid means: values are
    * floored to µ-units (1e-6), summed exactly as longs (associative —
    * any partitioning gives the same sum), and divided back out. A
    * cell of ~9e12 members fits the long sum, so the aggregation state
    * is ONE long per (cell, dim) — no per-member buffering. */
  private val MeanScale = 1000000.0

  /** One Lloyd iteration over the IVF coarse quantizer: assign every
    * vector to its nearest seed centroid, then take the per-cell
    * elementwise mean. Means use exact fixed-point long sums (above),
    * which makes the refinement bit-deterministic under any
    * partitioning — and therefore oracle-verifiable — with O(1)
    * aggregation state per (cell, dim) group (a collect_list of cell
    * members would OOM on a popular cell at corpus scale). A cell that
    * captures no vectors keeps its seed centroid (float→double), so
    * skewed or tiny corpora can't fault the refinement.
    */
  private[graft] def lloydRefine(corpus: DataFrame,
                                 cents0: Array[Array[Float]]): Array[Array[Double]] = {
    def centScores(v: Column) = array(cents0.map { c =>
      Native.cosineSim(v, array(c.map(x => lit(x.toDouble)): _*))
    }: _*)
    val nlist = cents0.length
    val assigned = corpus
      .select(col("embedding"), centScores(col("embedding")).as("scores"))
      .select(col("embedding"),
        array_position(col("scores"), array_max(col("scores"))).as("cell"))
    val means = assigned
      .select(col("cell"), posexplode(col("embedding")).as(Seq("pos", "val")))
      .select(col("cell"), col("pos"),
        floor(col("val").cast("double") * lit(MeanScale)).as("fx"))
      .groupBy("cell", "pos")
      .agg((sum(col("fx")).cast("double") / lit(MeanScale) /
        count(lit(1)).cast("double")).as("m"))
      .collect()
      .groupBy(_.getLong(0))
      .map { case (cell, rows) =>
        cell.toInt -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
    Array.tabulate(nlist)(i => means.getOrElse(i + 1, cents0(i).map(_.toDouble)))
  }

  /** IVF ANN with one Lloyd refinement of the seed centroids — better
    * cell balance than raw seeds, same query shape (narrow assignment +
    * bucket equi-join + WindowGroupLimit top-k). */
  // ---- the IVF building blocks, shared by EVERY variant so the probe
  // selection / assignment / scoring chains cannot diverge ------------

  /** Per-centroid cosine scores of a vector (centroids ride as
    * literals inside the expression — a tiny plan-side broadcast). */
  private def centScoresFor(cents: Array[Array[Double]])(v: Column): Column =
    array(cents.map(c => Native.cosineSim(v, array(c.map(lit): _*))): _*)

  /** Cell id = argmax centroid similarity (first on ties, 1-based). */
  private def cellOf(scores: Column): Column =
    array_position(scores, array_max(scores))

  /** Top-`nprobe` 1-based cell ids by centroid similarity — THE probe
    * expression. */
  private def probeCells(centScores: Column, nlist: Int, nprobe: Int): Column =
    slice(transform(
      sort_array(arrays_zip(
        transform(centScores, s => -s).as("neg"),
        sequence(lit(1L), lit(nlist.toLong)).as("cid"))),
      s => s.getField("cid")), 1, nprobe)

  /** Cell-joined exact-cosine scoring + per-query top-k: `c` carries
    * (cand_id, ce, cell), `q` carries (q_id, qe, cell). */
  /** The one candidate-nomination + scoring chain every cell-probing
    * variant shares: broadcast query side into the cell equi-join,
    * drop self-matches, exact cosine. Factored so the top-k, range,
    * and hard-negative variants cannot drift on the nomination rule. */
  private def cellCosScored(c: DataFrame, q: DataFrame): DataFrame =
    c.join(broadcast(q), "cell")
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Vectors.cosine(col("qe"), col("ce")).as("cos"))

  private def cellCosTopK(c: DataFrame, q: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    cellCosScored(c, q).withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Corpus cell assignment for the cosine variants. */
  /** Per-row cell id (1-based, first on ties) against a literal
    * centroid matrix — the probe-family assignment rule as a single
    * stateless Column, shared with the streaming router
    * (`Pipelines.streamCellRoute`). Janino-bounded like every
    * inlined-literal centroid expression: keep nlist ≲ 128. */
  private[graft] def cellAssignExpr(cents: Array[Array[Double]])(v: Column): Column =
    cellOf(centScoresFor(cents)(v))

  /** Cell assignment as ONE stateless Column at ANY nlist — the
    * scalable successor of [[cellAssignExpr]], shared by the persisted
    * index build ([[writeIvfIndex]]/[[appendToIvfIndex]]) and the
    * streaming router (`Pipelines.streamCellRoute`), so batch cells
    * and stream routing cannot drift: one kernel.
    *
    * The centroid table travels as a codegen REFERENCE OBJECT
    * (plans.CellRoute), not unrolled literals, so generated code is
    * constant-size — the ~128-centroid Janino bound of the inlined
    * form is gone. Above `flatCap` centroids, routing goes two-level
    * ([[semCellsTwoLevel]]'s exact rule: supers = the first ⌈√nlist⌉
    * (next power of two) centroids by cid, each centroid joins its
    * argmax-cosine super ties-to-lowest-sid, vectors route super
    * first then argmax within the branch) — n·O(√nlist) score work,
    * matching the autoNlist growth the batch semantic family already
    * has. The remaining bound is the centroid table itself (it rides
    * the closure/broadcast like every router's codebook must).
    *
    * `cids(i)` is the cell id of `cents(i)`; both ascend by cid so
    * first-best-wins IS the lowest-cid/lowest-sid tie rule. */
  private[graft] def cellRouteExpr(cids: Array[Long], cents: Array[Array[Double]],
                                   flatCap: Int = FlatAssignCap)(v: Column): Column = {
    require(cids.length == cents.length && cents.nonEmpty)
    val n = cents.length
    if (n <= flatCap)
      Native.cellRoute(v, Seq(cents.head.toSeq),
        Seq(cids.toSeq), Seq(cents.map(_.toSeq).toSeq))
    else {
      var s = 1
      while (s.toLong * s < n) s <<= 1
      val supers = cents.take(s)
      // branch of every centroid: argmax cosine over supers, ties to
      // the lowest sid — the same sequential fold as CosineSim, driver-
      // side, so branches equal semCellsTwoLevel's bit for bit
      def cosD(a: Array[Double], b: Array[Double]): Double = {
        val m = math.min(a.length, b.length)
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < m) {
          dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
        }
        dot / (math.sqrt(na) * math.sqrt(nb))
      }
      val byBranch = Array.fill(s)(
        scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double])])
      var ci = 0
      while (ci < n) {
        var best = Double.NegativeInfinity; var b = 0; var i = 0
        while (i < supers.length) {
          val sc = cosD(cents(ci), supers(i))
          if (sc > best) { best = sc; b = i }
          i += 1
        }
        byBranch(b) += ((cids(ci), cents(ci)))
        ci += 1
      }
      require(byBranch.forall(_.nonEmpty),
        "a super's branch is empty (duplicate centroids?) — routing would drop its vectors")
      Native.cellRoute(v, supers.map(_.toSeq).toSeq,
        byBranch.map(_.map(_._1).toSeq).toSeq,
        byBranch.map(_.map(_._2.toSeq).toSeq).toSeq)
    }
  }

  private def cellAssign(corpus: DataFrame,
                         centScores: Column => Column): DataFrame =
    corpus
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"),
        centScores(col("embedding")).as("scores"))
      .select(col("cand_id"), col("ce"), cellOf(col("scores")).as("cell"))

  private def ivfQueries(queries: DataFrame, centScores: Column => Column,
                         nlist: Int, nprobe: Int): DataFrame =
    queries.select(col("vec_id").as("q_id"), col("embedding").as("qe"),
        probeCells(centScores(col("embedding")), nlist, nprobe).as("probes"))
      .select(col("q_id"), col("qe"), explode(col("probes")).as("cell"))

  def ivfLloydTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                   nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val cents0: Array[Array[Float]] = corpus.orderBy("vec_id").limit(nlist)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val centScores = centScoresFor(lloydRefine(corpus, cents0)) _
    cellCosTopK(cellAssign(corpus, centScores),
      ivfQueries(queries, centScores, nlist, nprobe), k)
  }

  /** Product-quantization ANN with asymmetric-distance (ADC) scoring —
    * the memory-compression scale path: each vector is encoded once
    * into `m` sub-codes (one byte each at ks ≤ 256), so the scan side
    * of a query carries `m` small ints instead of `dim` floats — a
    * 32× narrower shuffle/broadcast payload at (m=8, dim=64). Queries
    * precompute a (m × ks) lookup table of exact subvector distances;
    * scoring a candidate is `m` table lookups, no float math.
    *
    * Codebooks are a deterministic corpus bootstrap (the first `ks`
    * vectors by id, split into `m` subvectors — the same bootstrap
    * convention as [[ivfTopK]]'s coarse centroids, and like them the
    * kmeans-refined variant keeps the identical query shape). The
    * bounded `.collect()` gathers `ks` vectors — centroid bootstrap,
    * not data movement. All distance folds run d-ascending in double,
    * so the SQL oracle reproduces every code and ADC score exactly.
    */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
             m: Int = 8, ks: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, "dim must split evenly into m subspaces")
    val subDim = dim / m
    // flat codebook, (s*ks + j)*subDim + d — the d-th component of
    // codeword j in subspace s (codeword j = subvectors of bootstrap
    // vector j)
    val boot: Array[Array[Double]] = corpus.orderBy("vec_id").limit(ks)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(boot.length == ks,
      s"PQ codebook bootstrap needs $ks corpus vectors, found ${boot.length}")
    require(boot.forall(_.length >= dim),
      s"PQ bootstrap vectors must have >= $dim components")
    val cbFlat: Array[Double] = Array.tabulate(m * ks * subDim) { i =>
      val d = i % subDim; val j = (i / subDim) % ks; val s = i / (subDim * ks)
      boot(j)(s * subDim + d)
    }
    // native one-pass expressions (plans/PqExprs) — the same math
    // spelled inline exceeded Janino's method limit at 1024 codebook
    // literals and dropped the stage out of codegen
    val enc = corpus.select(col("vec_id").as("cand_id"),
      Native.pqEncode(col("embedding"), cbFlat, m, ks, subDim).as("code"))
    val q = queries.select(col("vec_id").as("q_id"),
      Native.pqLut(col("embedding"), cbFlat, m, ks, subDim).as("lut"))
    val scored = enc.join(broadcast(q), col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Native.pqAdc(col("lut"), col("code"), ks).as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Persist the PQ index as TABLES — the index-is-data lifecycle on
    * the quantization side: `codes/` holds one row per vector with its
    * `m` one-byte sub-codes (the 32×-narrower scan side at m=8,
    * dim=64), `codebook/` the flat (i, v) codeword components. The
    * encode pass — the only corpus-sized float work — runs ONCE per
    * corpus generation; queries then read codes only and never touch
    * corpus embeddings. */
  def writePqIndex(corpus: DataFrame, path: String, m: Int = 8,
                   ks: Int = 16, dim: Int = 64): Unit = {
    require(dim % m == 0, "dim must split evenly into m subspaces")
    val subDim = dim / m
    val spark = corpus.sparkSession
    import spark.implicits._
    val boot: Array[Array[Double]] = corpus.orderBy("vec_id").limit(ks)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(boot.length == ks,
      s"PQ codebook bootstrap needs $ks corpus vectors, found ${boot.length}")
    val cbFlat: Array[Double] = Array.tabulate(m * ks * subDim) { i =>
      val d = i % subDim; val j = (i / subDim) % ks; val s = i / (subDim * ks)
      boot(j)(s * subDim + d)
    }
    cbFlat.zipWithIndex.map { case (v, i) => (i, v) }.toSeq
      .toDF("i", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$path/codebook")
    corpus.select(col("vec_id").as("cand_id"),
        Native.pqEncode(col("embedding"), cbFlat, m, ks, subDim).as("code"))
      .write.mode("overwrite").parquet(s"$path/codes")
  }

  /** Memoized [[writePqIndex]] behind the codes `_SUCCESS` marker. */
  def ensurePqIndex(corpus: DataFrame, path: String, m: Int = 8,
                    ks: Int = 16, dim: Int = 64): Unit = {
    graft.sources.Materialize.ensure(corpus.sparkSession, s"$path/codes") {
      writePqIndex(corpus, path, m, ks, dim)
    }
    ()
  }

  /** PQ-ADC top-k against the persisted index — identical LUT/ADC
    * math as [[pqTopK]] (spec-pinned row-for-row), but the corpus side
    * is the 8-byte codes table: no corpus embedding is read at query
    * time. The codebook collect is m·ks·subDim doubles — bounded. */
  def pqTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                      queries: DataFrame, k: Int, m: Int = 8,
                      ks: Int = 16, dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val cbFlat: Array[Double] = spark.read.parquet(s"$path/codebook")
      .orderBy("i").collect().map(_.getDouble(1))
    require(cbFlat.length == m * ks * subDim,
      s"codebook holds ${cbFlat.length} components, expected ${m * ks * subDim}")
    val codes = spark.read.parquet(s"$path/codes")
    val q = queries.select(col("vec_id").as("q_id"),
      Native.pqLut(col("embedding"), cbFlat, m, ks, subDim).as("lut"))
    val scored = codes.join(broadcast(q), col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Native.pqAdc(col("lut"), col("code"), ks).as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF+PQ ANN (the FAISS "IVFADC" composition): the corpus is
    * partitioned into `nlist` coarse cells AND compressed to `m`
    * one-byte PQ codes — the index layout for billion-vector corpora,
    * where the scan side of a query touches only `nprobe` cells and
    * reads `m` bytes per candidate instead of `dim` floats. Queries
    * probe their `nprobe` nearest cells and score candidates by
    * asymmetric distance (LUT lookups, no float math per candidate).
    * Both the cell assignment and the codes are narrow per-row maps
    * at the scan; the only wide operation is the (cell) equi-join
    * against the broadcast probe side + the WindowGroupLimit top-k.
    * Same deterministic bootstrap conventions as [[ivfTopK]] (first
    * `nlist` vectors as centroids) and [[pqTopK]] (first `ks` vectors
    * as codebooks), so the whole index is oracle-reproducible. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nlist: Int = 16, nprobe: Int = 4,
                m: Int = 8, ks: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, "dim must split evenly into m subspaces")
    val subDim = dim / m
    val boot: Array[Array[Double]] = corpus.orderBy("vec_id")
      .limit(math.max(nlist, ks))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(boot.length >= math.max(nlist, ks),
      s"IVF+PQ bootstrap needs ${math.max(nlist, ks)} corpus vectors")
    require(boot.forall(_.length >= dim),
      s"IVF+PQ bootstrap vectors must have >= $dim components")
    val cbFlat: Array[Double] = Array.tabulate(m * ks * subDim) { i =>
      val d = i % subDim; val j = (i / subDim) % ks; val s = i / (subDim * ks)
      boot(j)(s * subDim + d)
    }
    val centScores = centScoresFor(boot.take(nlist)) _
    val c = corpus
      .select(col("vec_id").as("cand_id"),
        centScores(col("embedding")).as("scores"),
        Native.pqEncode(col("embedding"), cbFlat, m, ks, subDim).as("code"))
      .select(col("cand_id"), col("code"), cellOf(col("scores")).as("cell"))
    val q = queries.select(col("vec_id").as("q_id"),
        Native.pqLut(col("embedding"), cbFlat, m, ks, subDim).as("lut"),
        probeCells(centScores(col("embedding")), nlist, nprobe).as("probes"))
      .select(col("q_id"), col("lut"), explode(col("probes")).as("cell"))
    val scored = c.join(broadcast(q), "cell")
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Native.pqAdc(col("lut"), col("code"), ks).as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF+PQ on RESIDUALS — the actual FAISS IVFADC default (Jégou et
    * al., TPAMI 2011 §IV-B): PQ encodes r = x − centroid(cell(x)),
    * not x itself, because residuals concentrate near the origin and
    * the same `m`-byte budget spends its codewords on a much smaller
    * ball (e9 is the "PQ on raw vectors" baseline this refines). The
    * LUT is therefore PER (query, probed cell) — built from the
    * query's residual against THAT cell's centroid — so the cell
    * equi-join pairs every candidate with the right LUT by
    * construction. Plan shape identical to e9 plus one broadcast join
    * against the `nlist`-row centroid table (the residual subtraction
    * is a narrow zip_with at the scan; codes stay m bytes); the
    * residual codebook bootstraps from the first `ks` vectors'
    * OWN residuals (deterministic, oracle-reproducible). */
  def ivfPqResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                        nlist: Int = 16, nprobe: Int = 4,
                        m: Int = 8, ks: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, "dim must split evenly into m subspaces")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val boot: Array[Array[Double]] = corpus.orderBy("vec_id")
      .limit(math.max(nlist, ks))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(boot.length >= math.max(nlist, ks),
      s"IVF+PQ bootstrap needs ${math.max(nlist, ks)} corpus vectors")
    require(boot.forall(_.length >= dim),
      s"IVF+PQ bootstrap vectors must have >= $dim components")
    val cents = boot.take(nlist)
    val centScores = centScoresFor(cents) _
    // 1-based cell -> centroid table (matches cellOf's array_position)
    val centDf = cents.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v.toSeq) }.toSeq
      .toDF("cell", "centv")
    def resid = zip_with(col("embedding").cast("array<double>"),
      col("centv"), (a, b) => a - b)
    // residual codebook: the first ks vectors' residuals against their
    // own cells — computed through the SAME expressions as the corpus
    // pass, so the bootstrap cannot fork from the assignment rule
    val rboot: Array[Array[Double]] = corpus.orderBy("vec_id").limit(ks)
      .select(col("vec_id"), col("embedding"),
        cellOf(centScores(col("embedding"))).as("cell"))
      .join(broadcast(centDf), "cell")
      .orderBy("vec_id")
      .select(resid.as("rv"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbFlat: Array[Double] = Array.tabulate(m * ks * subDim) { i =>
      val d = i % subDim; val j = (i / subDim) % ks; val s = i / (subDim * ks)
      rboot(j)(s * subDim + d)
    }
    val c = corpus
      .select(col("vec_id").as("cand_id"), col("embedding"),
        cellOf(centScores(col("embedding"))).as("cell"))
      .join(broadcast(centDf), "cell")
      .select(col("cand_id"), col("cell"),
        Native.pqEncode(resid, cbFlat, m, ks, subDim).as("code"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding"),
        explode(probeCells(centScores(col("embedding")), nlist, nprobe))
          .as("cell"))
      .join(broadcast(centDf), "cell")
      .select(col("q_id"), col("cell"),
        Native.pqLut(resid, cbFlat, m, ks, subDim).as("lut"))
    val scored = c.join(broadcast(q), "cell")
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Native.pqAdc(col("lut"), col("code"), ks).as("adc"))
    val w = Window.partitionBy("q_id").orderBy(col("adc").asc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** PQ approximation-error report (e36): mean |ADC − exact ‖q−x‖²|
    * over the SAME probed candidate set for the raw-vector codes (the
    * e9 layout) and the residual codes (the e35 layout) — the
    * measure-don't-guess diagnostic that justifies residual encoding
    * (Jégou et al. report exactly this gap). Per-pair errors are
    * doubles; the cross-row MEAN rides the fixed-point long-sum trick
    * (floor(err·2^20) summed exactly — the e5/e20 idiom), so the
    * report is bit-deterministic under any partitioning and fully
    * oracle-able. Exact distances need the float vectors at the
    * join — fine for a diagnostic run on a query sample, not a
    * per-query cost (the production answer path stays codes-only). */
  def pqErrorReport(corpus: DataFrame, queries: DataFrame,
                    nlist: Int = 16, nprobe: Int = 4,
                    m: Int = 8, ks: Int = 16, dim: Int = 64): DataFrame = {
    require(dim % m == 0, "dim must split evenly into m subspaces")
    val spark = corpus.sparkSession
    import spark.implicits._
    val subDim = dim / m
    val boot: Array[Array[Double]] = corpus.orderBy("vec_id")
      .limit(math.max(nlist, ks))
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))
    require(boot.length >= math.max(nlist, ks), "bootstrap too small")
    val cents = boot.take(nlist)
    val centScores = centScoresFor(cents) _
    val centDf = cents.zipWithIndex
      .map { case (v, i) => ((i + 1).toLong, v.toSeq) }.toSeq
      .toDF("cell", "centv")
    def resid = zip_with(col("embedding").cast("array<double>"),
      col("centv"), (a, b) => a - b)
    def cbFlatOf(src: Array[Array[Double]]): Array[Double] =
      Array.tabulate(m * ks * subDim) { i =>
        val d = i % subDim; val j = (i / subDim) % ks; val s = i / (subDim * ks)
        src(j)(s * subDim + d)
      }
    val cbRaw = cbFlatOf(boot.take(ks))
    val rboot: Array[Array[Double]] = corpus.orderBy("vec_id").limit(ks)
      .select(col("vec_id"), col("embedding"),
        cellOf(centScores(col("embedding"))).as("cell"))
      .join(broadcast(centDf), "cell")
      .orderBy("vec_id")
      .select(resid.as("rv"))
      .collect().map(_.getSeq[Double](0).toArray)
    val cbRes = cbFlatOf(rboot)
    val c = corpus
      .select(col("vec_id").as("cand_id"), col("embedding"),
        cellOf(centScores(col("embedding"))).as("cell"))
      .join(broadcast(centDf), "cell")
      .select(col("cand_id"), col("cell"), col("embedding").as("ce"),
        Native.pqEncode(col("embedding"), cbRaw, m, ks, subDim).as("code_raw"),
        Native.pqEncode(resid, cbRes, m, ks, subDim).as("code_res"))
    val q = queries.select(col("vec_id").as("q_id"), col("embedding"),
        explode(probeCells(centScores(col("embedding")), nlist, nprobe))
          .as("cell"))
      .join(broadcast(centDf), "cell")
      .select(col("q_id"), col("cell"), col("embedding").as("qe"),
        Native.pqLut(col("embedding"), cbRaw, m, ks, subDim).as("lut_raw"),
        Native.pqLut(resid, cbRes, m, ks, subDim).as("lut_res"))
    val exact = aggregate(
      zip_with(col("qe"), col("ce"),
        (a, b) => (a.cast("double") - b.cast("double")) *
          (a.cast("double") - b.cast("double"))),
      lit(0.0), (acc, x) => acc + x)
    def fp(adc: Column) =
      floor(abs(adc - col("exact")) * lit(1048576.0)).cast("long")
    c.join(broadcast(q), "cell")
      .filter(col("cand_id") =!= col("q_id"))
      .select(col("q_id"), col("cand_id"),
        Native.pqAdc(col("lut_raw"), col("code_raw"), ks).as("adc_raw"),
        Native.pqAdc(col("lut_res"), col("code_res"), ks).as("adc_res"),
        exact.as("exact"))
      .select(explode(array(
        struct(lit("raw").as("method"), fp(col("adc_raw")).as("err_fp")),
        struct(lit("residual").as("method"), fp(col("adc_res")).as("err_fp"))))
        .as("e"))
      .groupBy(col("e")("method").as("method"))
      .agg(count(lit(1)).as("n_pairs"), sum(col("e")("err_fp")).as("sum_fp"))
      .select(col("method"), col("n_pairs"),
        (col("sum_fp").cast("double") / col("n_pairs").cast("double") /
          lit(1048576.0)).as("mean_abs_err"))
      .orderBy("method")
  }

  /** IVF (inverted-file) ANN: the corpus is partitioned into `nlist`
    * cells by nearest coarse centroid — a narrow map over the scan, the
    * centroid table rides inside the expressions — and each query scores
    * only its `nprobe` nearest cells. Centroids are a deterministic
    * corpus sample (first `nlist` by id); at scale you'd refine them
    * with a couple of Lloyd iterations, which keeps the same shape:
    * tiny centroid broadcast + narrow assignment + one keyed join.
    * The `.collect()` gathers `nlist` vectors (bounded, small) — this
    * is the centroid bootstrap, not data movement.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centScores = centScoresFor(bootCentroids(corpus, nlist)) _
    cellCosTopK(cellAssign(corpus, centScores),
      ivfQueries(queries, centScores, nlist, nprobe), k)
  }

  /** IVF radius (range) search — the threshold-retrieval twin of
    * [[ivfTopK]]: every candidate in the query's `nprobe` nearest
    * cells with cosine ≥ `minCos`. Near-dup screens and recall-bounded
    * retrieval want "everything this close", not a fixed k — and the
    * shape is strictly cheaper at scale: same broadcast-query + cell
    * equi-join, but the threshold filter replaces the per-query
    * row_number window, so there is NO per-query sort state at all.
    * Each candidate lives in exactly one cell, so no dedup is needed
    * even when a query probes several cells. */
  def ivfRangeSearch(corpus: DataFrame, queries: DataFrame, minCos: Double,
                     nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val centScores = centScoresFor(bootCentroids(corpus, nlist)) _
    cellCosScored(cellAssign(corpus, centScores),
        ivfQueries(queries, centScores, nlist, nprobe))
      .filter(col("cos") >= minCos)
  }

  /** Hard-negative mining for contrastive/retrieval training (the DPR/
    * ANCE data-prep step): per query, the top-`k` HIGHEST-cosine
    * candidates strictly BELOW the `maxCos` near-dup ceiling — the
    * examples just outside the duplicate boundary are the ones a
    * contrastive loss learns the most from, while anything at or above
    * the ceiling is a probable positive/near-dup that would poison the
    * negative set (a "false negative" in the published sense).
    *
    * Shape: the proven [[ivfTopK]] cell equi-join nominates candidates
    * (broadcast query side, no all-pairs path), the ceiling filter runs
    * BEFORE the per-query window, so excluded near-dups never enter the
    * top-k sort state. At 100 TB this is the e3 plan plus one stateless
    * predicate. */
  def ivfHardNegatives(corpus: DataFrame, queries: DataFrame, k: Int,
                       maxCos: Double, nlist: Int = 16,
                       nprobe: Int = 4): DataFrame = {
    val centScores = centScoresFor(bootCentroids(corpus, nlist)) _
    val scored = cellCosScored(cellAssign(corpus, centScores),
        ivfQueries(queries, centScores, nlist, nprobe))
      .filter(col("cos") < maxCos)
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
  }

  /** The deterministic centroid bootstrap (first `nlist` vectors by
    * id) — bounded collect, not data movement. */
  private def bootCentroids(corpus: DataFrame, nlist: Int): Array[Array[Double]] =
    corpus.orderBy("vec_id").limit(nlist)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(_.toDouble))

  /** Index-health report — the rebuild trigger every production ANN
    * deployment monitors: per cell, how many vectors it holds (share
    * of the corpus) and how far the cell's TRUE mean has drifted from
    * the centroid the index was built with (drift = 1 − cosine). A
    * fresh index reports near-zero drift; as the corpus grows via
    * [[appendToIvfIndex]]-style ingest without retraining, drift and
    * occupancy skew climb until a rebuild pays for itself.
    *
    * Scale shape: assignment is the narrow literal-centroid projection
    * shared with every IVF variant; the mean aggregation carries ONE
    * long of state per (cell, dim) (the [[lloydRefine]] fixed-point
    * trick, bit-deterministic under any partitioning — so the report
    * is fully oracle-verifiable); everything after the agg is `nlist`
    * rows. Cells that captured nothing report their seed unchanged
    * (drift 0). */
  def centroidDrift(corpus: DataFrame, nlist: Int = 16): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = bootCentroids(corpus, nlist)
    val assigned = cellAssign(corpus, centScoresFor(cents))
    val means = assigned
      .select(col("cell"), posexplode(col("ce")).as(Seq("pos", "val")))
      .select(col("cell"), col("pos"),
        floor(col("val").cast("double") * lit(MeanScale)).as("fx"))
      .groupBy("cell", "pos")
      .agg(count(lit(1)).as("n"),
        (sum(col("fx")).cast("double") / lit(MeanScale) /
          count(lit(1)).cast("double")).as("m"))
    val cellMeans = means.groupBy("cell")
      .agg(max(col("n")).as("n_assigned"),
        transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m")).as("mean_vec"))
    val centsDf = cents.zipWithIndex
      .map { case (c, i) => ((i + 1).toLong, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
    val total = corpus.agg(count(lit(1)).as("t"))
    centsDf.join(cellMeans, Seq("cell"), "left")
      .crossJoin(broadcast(total))
      .select(col("cell"),
        coalesce(col("n_assigned"), lit(0L)).as("n_assigned"),
        (coalesce(col("n_assigned"), lit(0L)).cast("double") /
          col("t").cast("double")).as("share"),
        when(col("n_assigned").isNull, lit(0.0))
          .otherwise(lit(1.0) - Vectors.cosine(col("mean_vec"), col("centroid")))
          .as("drift"))
      .orderBy("cell")
  }

  /** Persist the IVF index as TABLES — the Spark-native index
    * lifecycle: an index is data, not a sidecar file format.
    * `centroids/` holds (cid, centroid); `cells/` holds the corpus
    * with its cell assignment, hive-partitioned BY CELL, so a probe's
    * scan prunes to its nprobe directories — partition pruning IS the
    * inverted list. Rebuild = overwrite; any number of query jobs
    * read the index concurrently like any other table. Assignment
    * math is identical to [[ivfTopK]], so the persisted path returns
    * bit-identical results (spec-asserted). */
  def writeIvfIndex(corpus: DataFrame, path: String, nlist: Int = 16): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = bootCentroids(corpus, nlist)
    cents.zipWithIndex.map { case (c, i) => (i + 1L, c) }.toSeq
      .toDF("cid", "centroid")
      .repartition(1).write.mode("overwrite").parquet(s"$path/centroids")
    // cell written as INT: hive partition inference reads the column
    // back as IntegerType, so the probe join must not wrap the
    // partition column in a cast (a cast would block pruning).
    // Assignment rides cellRouteExpr — the SAME kernel the streaming
    // router mounts, so persisted cells and ingest routing cannot
    // drift at any nlist (and the build no longer hits the inlined-
    // literal Janino bound above ~128 centroids)
    corpus
      .select(col("vec_id"), col("embedding"),
        cellRouteExpr((1L to cents.length).toArray, cents)(col("embedding"))
          .cast("int").as("cell"))
      .repartition(col("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Incremental maintenance of a persisted IVF index: assign the
    * delta vectors to cells with the EXISTING centroids (read back
    * from the index — never recomputed, so base and delta agree on
    * geometry) and append into the hive cell layout. This is the
    * index-as-tables payoff: ingesting new vectors is a partitioned
    * parquet append — no rebuild, no file-format surgery — and every
    * concurrent reader sees a consistent cell directory. Centroids
    * drift as the corpus grows; when recall degrades (measure with
    * e12), a full [[writeIvfIndex]] rebuild re-clusters — the same
    * rebuild-on-drift loop FAISS/SCaNN deployments run. */
  def appendToIvfIndex(delta: DataFrame, path: String): Unit = {
    val spark = delta.sparkSession
    val withCids = spark.read.parquet(s"$path/centroids")
      .orderBy("cid").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    delta
      .select(col("vec_id"), col("embedding"),
        cellRouteExpr(withCids.map(_._1), withCids.map(_._2))(col("embedding"))
          .cast("int").as("cell"))
      .repartition(col("cell"))
      .write.mode("append").partitionBy("cell").parquet(s"$path/cells")
  }

  /** Query a persisted IVF index: centroids load as a (tiny) table,
    * probes select the top-nprobe cells, and the cell equi-join
    * against the hive-partitioned corpus lets Spark prune non-probed
    * cell directories. Same scoring chain as [[ivfTopK]]. */
  def ivfTopKFromIndex(spark: org.apache.spark.sql.SparkSession, path: String,
                       queries: DataFrame, k: Int, nprobe: Int = 4): DataFrame = {
    val cents: Array[Array[Double]] = spark.read.parquet(s"$path/centroids")
      .orderBy("cid").collect()
      .map(_.getSeq[Double](1).toArray)
    val nlist = cents.length
    val centScores = centScoresFor(cents) _
    val c = spark.read.parquet(s"$path/cells")
      .select(col("vec_id").as("cand_id"), col("embedding").as("ce"), col("cell"))
    // probe cells cast to the partition column's INT type — the cast
    // sits on the (tiny, broadcast) probe side, never on the partition
    // column, so cell-directory pruning stays available
    val q = ivfQueries(queries, centScores, nlist, nprobe)
      .withColumn("cell", col("cell").cast("int"))
    cellCosTopK(c, q, k)
  }

  /** λ for [[mmrSelect]] and its 1−λ companion. BOTH are literals:
    * 1.0 − 0.7 is 0.30000000000000004 in binary, so deriving one from
    * the other would break bit-parity with any oracle that writes 0.3. */
  val MmrLambda = 0.7
  val MmrOneMinusLambda = 0.3

  /** Maximal Marginal Relevance selection (Carbonell & Goldstein,
    * SIGIR'98): from the query's top-`poolK` candidate pool, pick
    * `selectK` results that trade relevance against redundancy —
    * round r picks argmax of λ·rel(c) − (1−λ)·max_{s∈selected}
    * sim(c, s). The DISTRIBUTED work is the retrieval (one corpus
    * pass, the e1 brute-force chain) and the pool's pairwise cosines
    * (poolK² rows, both sides broadcast); the greedy fold itself runs
    * on the driver over those ≤ poolK + poolK² collected rows —
    * bounded by query CONSTANTS, not data scale (the d45/centroid-
    * bootstrap precedent), because each round's argmax depends on the
    * previous pick and poolK is ~tens at 100 TB too. First pick has
    * no redundancy term: mmr = λ·rel. Ties break on vec_id ascending;
    * all arithmetic is two multiplies + one subtract on bit-identical
    * cosine folds, so every score is engine-reproducible. */
  def mmrSelect(corpus: DataFrame, queryId: Long, poolK: Int, selectK: Int): DataFrame = {
    val spark = corpus.sparkSession
    val pool = bruteForceTopK(corpus, corpus.filter(col("vec_id") === queryId), poolK)
      .select(col("cand_id"), col("cos").as("rel"))
    val pv = corpus.select(col("vec_id").as("cand_id"), col("embedding"))
      .join(broadcast(pool.select("cand_id")), "cand_id")
    val sims = pv.select(col("cand_id").as("a_id"), col("embedding").as("ae"))
      .join(broadcast(pv.select(col("cand_id").as("b_id"), col("embedding").as("be"))),
        col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        Vectors.cosine(col("ae"), col("be")).as("sim"))
    val rel: Map[Long, Double] =
      pool.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sim: Map[(Long, Long), Double] =
      sims.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Double, Double)]
    var selected = List.empty[Long]
    var remaining = rel.keySet
    var rank = 1
    while (rank <= selectK && remaining.nonEmpty) {
      // argmax with vec_id-ascending tie-break; iterate in sorted id
      // order so "first best wins" IS the tie-break
      var bestId = -1L
      var bestScore = Double.NegativeInfinity
      remaining.toSeq.sorted.foreach { c =>
        val score =
          if (selected.isEmpty) MmrLambda * rel(c)
          else MmrLambda * rel(c) -
            MmrOneMinusLambda * selected.map(s => sim((c, s))).max
        if (score > bestScore) { bestScore = score; bestId = c }
      }
      picked += ((rank, bestId, rel(bestId), bestScore))
      selected ::= bestId
      remaining -= bestId
      rank += 1
    }
    spark.createDataFrame(picked.toSeq)
      .toDF("rank", "vec_id", "rel", "mmr")
  }

  /** Rocchio α/β literals for [[prfExpand]] — literals for the same
    * reason as [[MmrLambda]]: the oracle must write the identical
    * constants. */
  val PrfAlpha = 1.0
  val PrfBeta = 0.75

  /** Pseudo-relevance feedback query expansion (Rocchio 1971, the
    * α·q + β·centroid(top-k) form every classic retrieval stack
    * ships): retrieve the query's top-`fbK` (the e1 brute pass),
    * fold their mean INTO the query vector, re-retrieve with the
    * expanded query. The feedback fold runs on the driver over the
    * collected top-`fbK` vectors in cand_id order (bounded by a query
    * CONSTANT — the e33/d45 precedent; ~tens of vectors at 100 TB
    * too), so the expanded query is a deterministic literal and the
    * second pass is exactly the e1 shape: one corpus scan, broadcast
    * query, TakeOrderedAndProject top-k. `was_feedback` marks which
    * results the expansion pulled from the feedback set itself. */
  def prfExpand(corpus: DataFrame, queryId: Long, fbK: Int, k: Int): DataFrame = {
    val qRows = corpus.filter(col("vec_id") === queryId)
      .select("embedding").collect()
    require(qRows.nonEmpty, s"prfExpand: query vector vec_id=$queryId not found in corpus")
    val q0 = qRows(0).getSeq[Float](0).toArray
    val fb = bruteForceTopK(corpus, corpus.filter(col("vec_id") === queryId), fbK)
      .select("cand_id").collect().map(_.getLong(0)).sorted
    val fbVecs = corpus.filter(col("vec_id").isin(fb: _*))
      .select("vec_id", "embedding").collect()
      .sortBy(_.getLong(0)).map(_.getSeq[Float](1).toArray)
    require(fbVecs.nonEmpty, s"prfExpand: no feedback neighbors retrieved for vec_id=$queryId")
    // Rocchio centroid over the vectors actually RETRIEVED — on a
    // corpus with fewer than fbK neighbors dividing by fbK would
    // silently scale the feedback term down
    val qExp = Array.tabulate(q0.length) { dd =>
      var s = 0.0
      fbVecs.foreach(v => s += v(dd).toDouble)
      PrfAlpha * q0(dd).toDouble + PrfBeta * (s / fbVecs.length.toDouble)
    }
    corpus.filter(col("vec_id") =!= queryId)
      .select(col("vec_id").as("cand_id"),
        Vectors.cosine(col("embedding"), array(qExp.map(lit): _*))
          .as("cos_expanded"),
        col("vec_id").isin(fb: _*).as("was_feedback"))
      .orderBy(col("cos_expanded").desc, col("cand_id"))
      .limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("cos_expanded").desc, col("cand_id"))))
      .select("rank", "cand_id", "cos_expanded", "was_feedback")
  }

  /** Farthest-first traversal (Gonzalez 1985, the classic k-center
    * 2-approximation) — the coverage-maximizing seeding that
    * initializes a quantizer (k-means++ without the randomness) or
    * picks a maximally-diverse evaluation panel: seed = the lowest
    * vec_id, then each round picks the vector FARTHEST from its
    * nearest already-selected center (cosine distance 1 − cos, ties
    * to the lowest vec_id), reporting the pick's distance — the
    * corpus coverage radius at that k. Each round is ONE corpus scan
    * with ZERO shuffles: the ≤ k selected embeddings ride as literals
    * inside a `least` fold (the streamCellRoute literal-centroid
    * pattern, Janino-fine at seeding-scale k), and the argmax is a
    * TakeOrderedAndProject (per-partition top-1 + driver merge of
    * numPartitions rows — never a global sort). k driver rounds of
    * k-passes is the honest, inherent cost of farthest-first (each
    * pick depends on all previous); state on the driver is k
    * (id, vector) pairs. Every distance is 1.0 − the shared cosine
    * fold on float-exact literals, so the whole trace is
    * engine-reproducible and the oracle unrolls the rounds as CTEs
    * (the e22/e33/d45 precedent). */
  def kcenterInit(corpus: DataFrame, k: Int): DataFrame = {
    val spark = corpus.sparkSession
    val seed = corpus.orderBy("vec_id").limit(1)
      .select(col("vec_id"), col("embedding")).collect()(0)
    def vecOf(r: org.apache.spark.sql.Row): Array[Double] =
      r.getSeq[Float](1).map(_.toDouble).toArray
    var selected = List((seed.getLong(0), vecOf(seed)))
    val picked = scala.collection.mutable.ArrayBuffer((1, seed.getLong(0), 0.0))
    var rank = 2
    while (rank <= k) {
      // min distance to the selected set as an in-row least fold over
      // literal centers (float → double literal is exact)
      val mind = selected.map { case (_, c) =>
        lit(1.0) - Native.cosineSim(col("embedding"), array(c.map(lit): _*))
      }.reduceLeft(least(_, _))
      val nxt = corpus
        .filter(!col("vec_id").isin(selected.map(_._1): _*))
        .select(col("vec_id"), col("embedding"), mind.as("radius"))
        .orderBy(col("radius").desc, col("vec_id"))
        .limit(1).collect()(0)
      picked += ((rank, nxt.getLong(0), nxt.getDouble(2)))
      selected ::= (nxt.getLong(0), vecOf(nxt))
      rank += 1
    }
    spark.createDataFrame(picked.toSeq).toDF("rank", "vec_id", "radius")
  }
}
