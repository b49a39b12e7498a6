package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.q
import graft.ScratchDirs
import graft.operators.Similarity
import graft.sources.Tables.table

/** §2c similarity search over the `embeddings` table. The cosine oracle
  * is bit-exact: both engines widen float→double and fold sequentially
  * (DuckDB's `list_cosine_similarity` computes in float32 and is NOT
  * used — the oracle spells out the double-precision fold).
  */
object VectorQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e1_cosine_topk" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // full oracle: the deterministic plane constants are embedded in the
    // generated SQL (recall vs brute force additionally in SimilaritySpec)
    "e2_ann_lsh" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // full oracle: centroids are the first nlist vectors, expressible in SQL
    "e3_ann_ivf" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // IVF radius search: ALL candidates within cosine ≥ τ of each query
    // (threshold retrieval, not top-k) — same broadcast-query + cell
    // equi-join as e3 but with NO per-query window state at all; full
    // oracle sharing e3's cell CTEs
    "e27_range_search" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfRangeSearch(emb, emb.filter(col("vec_id") < 5), minCos = 0.1)
        .orderBy("q_id", "cand_id")
    },

    // hard-negative mining for contrastive training: top-10 candidates
    // strictly BELOW the corpus near-dup ceiling (0.2 — the e4
    // threshold), so probable positives never poison the negative set;
    // the ceiling filter runs before the per-query window (no excluded
    // row ever enters top-k sort state); full oracle = e3's chain + the
    // ceiling predicate
    "e32_hard_negatives" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfHardNegatives(emb, emb.filter(col("vec_id") < 5),
          k = 10, maxCos = 0.2)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // IVF with one Lloyd refinement (deterministic sorted-fold means →
    // still a full oracle)
    "e5_ann_ivf_lloyd" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfLloydTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // embedding-cosine near-dup pairs: sign-LSH bucket blocking (the
    // 100 TB shape — one keyed self-equi-join, no label/corpus-wide
    // self-join), exact cosine on candidates only; full oracle with the
    // same embedded plane constants as e2
    "e4_cosine_neardup" -> q { (s, d) =>
      Similarity.lshNearDupPairs(table(s, d, "embeddings"), minCos = 0.2)
        .orderBy("a_id", "b_id")
    },

    // materialize the near-dup-pruned corpus (the embedding analog of
    // d11): drop the later vector of every near-dup pair via one
    // anti-join — keepers never chain-delete
    "e6_neardup_apply" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      val dropped = Similarity.lshNearDupPairs(emb, minCos = 0.35)
        .select(col("b_id").as("vec_id")).distinct()
      emb.join(dropped, Seq("vec_id"), "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    },

    // index-quality evaluation as a first-class query: recall@10 of
    // the LSH index (e2) against brute-force ground truth (e1), per
    // query vector — the measurement loop every production ANN
    // deployment runs before/after (re)building an index. Left join +
    // conditional count; both sides are the existing operators.
    "e12_recall_report" -> q { (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 10)
        .select(col("q_id"), col("cand_id"))
      val approx = Similarity.lshTopK(emb, qs, k = 10)
        .select(col("q_id").as("aq"), col("cand_id").as("ac"))
      exact.join(approx,
          col("q_id") === col("aq") && col("cand_id") === col("ac"), "left_outer")
        .groupBy("q_id")
        .agg((sum(when(col("ac").isNotNull, 1L).otherwise(0L))
          .cast(DoubleType) / lit(10.0)).as("recall_at_10"))
        .orderBy("q_id")
    },

    // IVF tuning curve — recall@10 per (nprobe, query) for nprobe ∈
    // {1, 2, 4, 8} against brute-force ground truth: THE
    // accuracy/latency knob every IVF deployment sweeps before fixing
    // its production nprobe (e12 measures the LSH index; this sweeps
    // the IVF probe depth). Composed from the two proven operators per
    // point; the evaluation query set is the bounded 5-vector probe
    // side, so the sweep costs 4 bounded searches + one brute pass —
    // at 100 TB a recall evaluation runs over a sampled query set
    // exactly like this, never the corpus as queries.
    "e30_nprobe_recall" -> q { (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 10)
        .select(col("q_id"), col("cand_id"))
      Seq(1, 2, 4, 8).map { np =>
        val approx = Similarity.ivfTopK(emb, qs, k = 10, nlist = 16, nprobe = np)
          .select(col("q_id").as("aq"), col("cand_id").as("ac"))
        exact.join(approx,
            col("q_id") === col("aq") && col("cand_id") === col("ac"),
            "left_outer")
          .groupBy("q_id")
          .agg((sum(when(col("ac").isNotNull, 1L).otherwise(0L))
            .cast(DoubleType) / lit(10.0)).as("recall_at_10"))
          .select(lit(np).as("nprobe"), col("q_id"), col("recall_at_10"))
      }.reduce(_ unionAll _)
        .orderBy("nprobe", "q_id")
    },

    // FILTERED vector search — the metadata-predicate ANN every vector
    // store ships (and the classic pre- vs post-filter trap): top-10
    // among the IVF candidates whose DOCUMENT is lang='en', with the
    // predicate applied to the candidate set BEFORE ranking (PRE-
    // filter: a post-filtered top-10 returns < 10 rows whenever the
    // unfiltered top-10 contains other-language hits — the recall bug
    // this operator exists to avoid). Candidates come from the proven
    // e27 cell equi-join with NO per-query window state; the metadata
    // join ships (cand_id, lang) 16-byte rows keyed by id; rank ≤ 10
    // plans as WindowGroupLimit after the filter.
    "e31_filtered_search" -> q { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val langs = table(s, d, "documents")
        .select(col("doc_id").as("cand_id"), col("lang"))
      Similarity.ivfRangeSearch(emb, qs, minCos = -1.0)
        .join(langs, Seq("cand_id"))
        .filter(col("lang") === "en")
        .withColumn("rank", row_number().over(
          Window.partitionBy("q_id").orderBy(col("cos").desc, col("cand_id"))))
        .filter(col("rank") <= 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // maximum-inner-product top-k + the norm-augmentation reduction
    // (what plugs MIPS into any cosine index at scale), with per-row
    // machine-checked rank agreement between the two scores
    "e10_mips_topk" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.mipsTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "ip", "aug_agrees")
        .orderBy("q_id", "rank")
    },

    // IVF+PQ (FAISS IVFADC shape): coarse cells bound the candidate
    // set, PQ codes compress the scan side to m bytes/vector, ADC
    // scores candidates with LUT lookups — the billion-vector index
    // layout; full oracle (SQL-derived centroids AND codebooks)
    "e9_ivf_pq" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfPqTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "adc")
        .orderBy("q_id", "rank")
    },

    // corpus-wide k-NN graph: every node's 5 nearest LSH bucket-mates
    // (directed) — the substrate for semantic clustering and
    // graph-based dedup; same banded candidate shape as e4, per-node
    // WindowGroupLimit top-k, full oracle with the embedded plane
    // constants
    "e8_knn_graph" -> q { (s, d) =>
      Similarity.knnGraph(table(s, d, "embeddings"), k = 5)
        .select("src", "rank", "dst", "cos")
        .orderBy("src", "rank")
    },

    // two-hop expansion over the e8 graph: per node, the 1-hop
    // out-degree, the distinct nodes FIRST reached at hop 2, and the
    // expansion factor — the neighbor-of-neighbor candidate
    // generation graph retrieval runs, and the graph-health metric
    // that predicts whether greedy search escapes local buckets.
    // Edge-edge equi-join + distinct + left-anti on narrow (src,dst)
    // keys; the e8 chain runs once (localCheckpoint); full oracle
    // splicing the shared knn CTEs
    "e21_knn_expand" -> q { (s, d) =>
      Similarity.knnExpand(table(s, d, "embeddings"), k = 5)
    },

    // greedy beam search over the e8 graph — the SEARCH half of
    // graph-based ANN (HNSW/NSG navigation as fixed expand-score-
    // prune rounds): frontier starts at the entry node, 3 rounds of
    // union-with-out-neighbors → exact-cosine score → top-4 keep.
    // The frontier is queries×beam rows, broadcast on BOTH per-round
    // joins, so no round shuffles edges or vectors; full oracle with
    // the 3 rounds unrolled over the shared knn CTEs
    "e22_graph_search" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.graphSearch(emb, emb.filter(col("vec_id") < 5),
        beam = 4, rounds = 3)
    },

    // Matryoshka truncation evaluation (e24): retrieve with the FIRST
    // 16 of 64 dimensions (4× narrower scan side) and report truncated
    // + full cosines and full-top-10 membership per truncated top-10
    // row — the measurement that decides how far an index can truncate
    // before recall pays. One corpus pass, both folds; full oracle
    // with list slicing
    "e24_matryoshka" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.truncatedTopK(emb, emb.filter(col("vec_id") < 5),
        dims = 16, k = 10)
    },

    // binary quantization retrieval (e25): sign-bit signatures — ONE
    // 64-bit word per 64-dim vector (64× narrower than floats, the
    // far end of the e15/e24 compression ladder), Hamming ranking via
    // a single XOR+popcount per pair, full-cosine + full-top-10
    // membership columns measuring what 1-bit quantization costs;
    // full oracle (bit arithmetic is exact in both engines)
    "e25_binary_quant" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.binaryQuantTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
    },

    // recall@4 of the beam search against brute force, REPORTED PER
    // ENTRY COUNT — the e12 measurement loop closed for the graph
    // index, now also measuring the multi-entry escape hatch: a
    // single entry walks only its own neighborhood (round-7 measured
    // recall 0.5/0/0/0/0 on random-isometry embeddings — the honest
    // local-bucket floor), while 8 spread entries cover 8
    // neighborhoods for the same per-round cost. The kNN graph builds
    // ONCE (localCheckpoint) and both searches navigate it; self-
    // occupancy in the beam costs recall honestly since the exact set
    // excludes self.
    // e22/e23's PRODUCTION shape (the d47/d50 lifecycle on the graph
    // side): multi-entry beam search against the PERSISTED kNN graph —
    // the LSH + scoring + top-k build runs once per corpus generation
    // (memoized behind the parquet _SUCCESS marker), every search is a
    // scan of the narrow edge table + 3 broadcast beam rounds; full
    // oracle (the graph is a deterministic corpus derivation, so the
    // e22 CTE chain proves the indexed path too)
    "e28_graph_indexed" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      val dir = ScratchDirs.stable("e28_knn_graph", d)
      val edges = Similarity.ensureKnnGraph(emb, s"$dir/edges")
      Similarity.graphSearchFrom(edges, emb, emb.filter(col("vec_id") < 5),
        beam = 4, rounds = 3, entryIds = 0L until 8L)
    },

    "e23_graph_recall" -> q { (s, d) =>
      import org.apache.spark.sql.types.DoubleType
      val emb = table(s, d, "embeddings")
      val qs = emb.filter(col("vec_id") < 5)
      val exact = Similarity.bruteForceTopK(emb, qs, k = 4)
        .select(col("q_id"), col("cand_id"))
      val edges = Similarity.knnGraph(emb, k = 5)
        .select(col("src"), col("dst"))
        .localCheckpoint()
      def recallAt(nEntries: Int): org.apache.spark.sql.DataFrame = {
        val g = Similarity.graphSearchFrom(edges, emb, qs, beam = 4,
            rounds = 3, entryIds = 0L until nEntries.toLong)
          .select(col("q_id").as("gq"), col("node").as("gn"))
        exact.join(g,
            col("q_id") === col("gq") && col("cand_id") === col("gn"), "left_outer")
          .groupBy("q_id")
          .agg((sum(when(col("gn").isNotNull, 1L).otherwise(0L))
            .cast(DoubleType) / lit(4.0)).as("recall_at_4"))
          .select(col("q_id"), lit(nEntries).as("n_entries"), col("recall_at_4"))
      }
      recallAt(1).union(recallAt(8)).orderBy("q_id", "n_entries")
    },

    // product-quantization ANN with asymmetric-distance scoring: the
    // memory-compression scale path (8 one-byte codes per vector
    // instead of 64 floats on the scan side); full oracle — codebooks
    // are SQL-derived from the same deterministic bootstrap, every
    // code and ADC score reproduced exactly
    "e7_pq_adc" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.pqTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "adc")
        .orderBy("q_id", "rank")
    },

    // e7's PRODUCTION shape (the d50/e28 lifecycle on the quantization
    // side): ADC top-k against the PERSISTED codes + codebook tables —
    // the encode pass (the only corpus-sized float work) runs once per
    // corpus generation; the query reads 8-byte codes, never corpus
    // embeddings (plan-gated). Same oracle as e7; spec pins e29 ≡ e7.
    "e29_pq_indexed" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      val dir = ScratchDirs.stable("e29_pq_index", d)
      Similarity.ensurePqIndex(emb, dir)
      Similarity.pqTopKFromIndex(s, dir, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "adc")
        .orderBy("q_id", "rank")
    },

    // incremental maintenance of the persisted IVF index: build from a
    // base corpus, append the delta with the EXISTING centroids (a
    // hive-partition parquet append — no rebuild), query the maintained
    // index. The base keeps the first-nlist bootstrap vectors, so the
    // geometry matches a full-corpus build and the same SQL derivation
    // as e3 oracles this path bit-exactly: append+query ≡ rebuild+query.
    "e11_ivf_delta" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      val dir = ScratchDirs.fresh("e11_idx", d)
      val base = emb.filter(col("vec_id") < 16 || col("vec_id") % 2 === 0)
      val delta = emb.filter(col("vec_id") >= 16 && col("vec_id") % 2 === 1)
      Similarity.writeIvfIndex(base, s"$dir/idx")
      Similarity.appendToIvfIndex(delta, s"$dir/idx")
      Similarity.ivfTopKFromIndex(s, s"$dir/idx", emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // SemDeDup (arXiv:2303.09540): cluster-then-prune semantic dedup —
    // the published LLM-corpus curation pipeline; candidates only ever
    // come from within a coarse cell (narrow (vec_id, cell) rows through
    // the self-join), exact-cosine verify, higher-id member drops. The
    // cluster count is occupancy-held (Similarity.autoNlist — the
    // paper's own posture: clusters grow with the corpus), which keeps
    // within-cell pairs linear in n; full oracle deriving the identical
    // nlist from count(*)
    "e13_semdedup" -> q { (s, d) =>
      Similarity.semDedup(table(s, d, "embeddings"), minCos = 0.35)
        .select("vec_id")
        .orderBy("vec_id")
    },

    // IVF + scalar quantization (FAISS IVF-SQ8): cells bound candidates,
    // the scan side carries one byte per dimension (4× narrower than
    // floats; higher recall than PQ's subspace codes), scoring is the
    // midpoint reconstruction inner product — full oracle (SQL-derived
    // per-dim min/max stats, codes, and d-ascending score folds)
    "e15_ivf_sq8" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfSq8TopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "sq_ip")
        .orderBy("q_id", "rank")
    },

    // two-stage ANN cascade (the FAISS search-then-refine deployment
    // shape): the SQ8 index generates top-30 candidates from codes,
    // exact cosine re-ranks them to top-10 with float vectors joined
    // back by id — full precision touches 30 rows per query, never the
    // corpus; full oracle (the e15 chain spliced + the e1 cosine fold)
    "e17_ann_rerank" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.annRerankTopK(emb, emb.filter(col("vec_id") < 5), k = 10, c = 30)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // hybrid retrieval via reciprocal-rank fusion (RRF, Cormack et al.
    // SIGIR'09 — what Elasticsearch/Vespa/OpenSearch run for
    // lexical+vector search): the d29 BM25 top-10 and the e1 cosine
    // top-10 for query vector 0 fuse by Σ 1/(60+rank). The fusion is a
    // k-row full-outer join + re-rank — constant work after the two
    // retrieval chains, so the hybrid costs what its branches cost.
    // Fixed fold order (lexical + vector) keeps the double sum exact.
    "e16_hybrid_rrf" -> q { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val lex = DocQueries.queries("d29_bm25")(s, d)
        .select(col("doc_id"),
          row_number().over(Window.orderBy(col("score").desc, col("doc_id")))
            .cast("long").as("rank_lex"))
      val vec = Similarity.bruteForceTopK(
          table(s, d, "embeddings"),
          table(s, d, "embeddings").filter(col("vec_id") === 0), k = 10)
        .select(col("cand_id").as("doc_id"), col("rank").cast("long").as("rank_vec"))
      lex.join(vec, Seq("doc_id"), "full_outer")
        .select(col("doc_id"), col("rank_lex"), col("rank_vec"),
          (coalesce(lit(1.0) / (lit(60L) + col("rank_lex")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60L) + col("rank_vec")), lit(0.0))).as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    },

    // semantic clusters: the e4 LSH-blocked near-dup pairs closed into
    // connected components (the d20 pointer-jumping loop) — cluster ids
    // over the embedding-similarity graph, the grouping that semantic
    // curation (diversity sampling, cluster-level pruning) keys on.
    // Two proven chains composed; FULL oracle (recursive CTE closure)
    "e14_semantic_clusters" -> q { (s, d) =>
      Similarity.semanticClusterMap(table(s, d, "embeddings"))
        .orderBy("vec_id")
    },

    // SemDeDup's KEEP step (arXiv:2303.09540) composed with a
    // PERSISTED semantic cluster map (the d47 lifecycle on the
    // embedding side): within each duplicate cluster keep the member
    // with the LOWEST cosine to the fixed-point cluster centroid —
    // built once per input generation, then this consumer is one
    // keyed join + one narrow mean pass + a WindowGroupLimit argmin.
    // minCos 0.4 (vs e14's 0.2 exploratory graph): the DUPLICATE
    // threshold — at 0.2 this corpus chains into one giant component
    // (measured: 1 cluster at both graded SFs), at 0.4 it yields
    // dozens of tight duplicate groups, which is the structure the
    // keep rule exists to prune. FULL oracle: the e14 recursive-CTE
    // closure (tightened WHERE cos >= 0.4) + the lloydRefine
    // exact-mean arithmetic + the shared cosine fold.
    "e26_semdedup_keep" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      val dir = ScratchDirs.stable("e26_sem_map", d)
      Similarity.semDedupKeep(emb,
        Similarity.ensureSemanticClusterMap(emb, s"$dir/map", minCos = 0.4))
    },

    // cluster-level diversity sampling (e18): keep ≤ k vectors per
    // SemDeDup cell, chosen by the d15 portable hash — the cluster-
    // balanced pruning semantic curation runs AFTER near-dup removal
    // (a cell of thousands of routine variants contributes k
    // representatives; rare cells keep everything). rank ≤ literal k
    // plans as WindowGroupLimit: each task keeps ≤ k rows per cell
    // BEFORE the cell exchange. Full oracle on the shared occupancy-
    // held cell derivation (autoNlist from count(*)).
    "e18_cell_diversity_sample" -> q { (s, d) =>
      Similarity.diversitySample(table(s, d, "embeddings"), k = 8)
        .orderBy("cell", "rank")
    },

    // two-level (IMI-style) hierarchical cell assignment (e19): the
    // coarse quantizer that carries occupancy-held cell counts past
    // Similarity.FlatAssignCap, where a flat n·nlist broadcast argmax
    // stops being the right plan. e13/e18 only reach that path above
    // 262144 vectors, so this query FORCES the hierarchy at
    // nlist = 256 (16 supers) — the full rule (super argmax, centroid
    // branching, within-branch argmax, all ties to the lowest id) is
    // driver-hash-oracled at every SF instead of only spec-verified
    "e19_two_level_cells" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.semCellsTwoLevel(emb,
          Similarity.bootCentroidCols(emb, 256), 256)
        .orderBy("vec_id")
    },

    // the SAME two-level rule through the production ROUTER kernel
    // (e38): plans.CellRoute — the codegen reference-object expression
    // the persisted index build (writeIvfIndex/appendToIvfIndex) and
    // the streaming router (streamCellRoute) assign cells with — run
    // ABOVE its flat cap, so the hierarchical in-expression branch
    // (super argmax then within-branch argmax, ties to the lowest
    // sid/cid) sits on a driver hash-checked oracle instead of only
    // the spec pin against semCellsTwoLevel. flatCap = 16 forces the
    // two-level path at nlist = 256 exactly the way e19 forces the
    // DataFrame twin; the oracle is the SHARED e19 SQL text (one
    // spelling, the two cannot drift). Plan-gated: the projection
    // contains a multi-branch cell_route, no join, no shuffle — the
    // router is one stateless expression over the scan
    "e38_route_two_level" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      val withCids = Similarity.bootCentroidCols(emb, 256)
        .orderBy("cid").collect()
        .map(r => (r.getLong(0),
          r.getSeq[Float](1).map(_.toDouble).toArray))
      // d1's range-partition-first shape: the multi-branch router
      // expression runs once, parallel, above the one exchange (the
      // sort's sampling pass otherwise re-runs it over the whole scan)
      emb.select(col("vec_id"), col("embedding"))
        .repartitionByRange(s.sparkContext.defaultParallelism, col("vec_id"))
        .select(col("vec_id"),
          Similarity.cellRouteExpr(withCids.map(_._1), withCids.map(_._2),
            flatCap = 16)(col("embedding")).as("cell"))
        .orderBy("vec_id")
    },

    // index-health report (e20): per-cell occupancy share + drift of
    // the true cell mean away from the built centroid (1 − cosine) —
    // the rebuild trigger monitored over an index maintained by e11-
    // style appends without retraining. Means ride the e5 fixed-point
    // long-sum trick (O(1) state per (cell, dim), bit-deterministic
    // under any partitioning), so the whole report is a FULL oracle.
    "e20_centroid_drift" -> q { (s, d) =>
      Similarity.centroidDrift(table(s, d, "embeddings"))
    },

    // Maximal Marginal Relevance selection (Carbonell & Goldstein,
    // SIGIR'98 — the diversity re-rank between retrieval and a RAG
    // context window): from the query's top-20 pool, 5 greedy picks of
    // argmax λ·rel − (1−λ)·max-sim-to-selected. The corpus work is the
    // e1 retrieval pass + pool-only pairwise cosines (both sides
    // broadcast, poolK² = 400 rows); the greedy fold is driver-side
    // over those CONSTANT-bounded rows (the d45 precedent — each pick
    // depends on the last, and the pool stays ~tens at 100 TB). FULL
    // oracle: 5 unrolled argmax rounds over the same pool/sims CTEs
    "e33_mmr_select" -> q { (s, d) =>
      Similarity.mmrSelect(table(s, d, "embeddings"),
          queryId = 0L, poolK = 20, selectK = 5)
        .orderBy("rank")
    },

    // residual IVF+PQ (e35): the true FAISS IVFADC default — PQ codes
    // the residual x − centroid(cell(x)), not x, so the m-byte budget
    // spends its codewords on the small residual ball (e9 is the
    // raw-vector baseline this refines). The LUT becomes PER (query,
    // probed cell); the cell equi-join pairs each candidate with the
    // right LUT by construction. One extra broadcast join against the
    // nlist-row centroid table; codes stay m bytes on the scan side.
    // FULL oracle splicing e9's chains with residual CTEs.
    "e35_residual_pq" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfPqResidualTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "adc")
        .orderBy("q_id", "rank")
    },

    // Rocchio pseudo-relevance feedback (e37): retrieve top-10, fold
    // their mean into the query (α=1.0, β=0.75 — the classic PRF
    // constants), re-retrieve with the expanded query. The feedback
    // fold is driver-side over the collected CONSTANT-bounded top-k
    // in cand_id order (the e33 pattern), so the expanded query is a
    // deterministic literal and the second pass is the e1 shape.
    // FULL oracle (both passes + the per-dim expansion in SQL).
    "e37_prf_expand" -> q { (s, d) =>
      Similarity.prfExpand(table(s, d, "embeddings"),
          queryId = 0L, fbK = 10, k = 10)
        .orderBy("rank")
    },

    // PQ approximation-error report (e36): mean |ADC − exact ‖q−x‖²|
    // over the SAME probed candidates for raw codes (e9) vs residual
    // codes (e35) — the measured justification for residual encoding.
    // Cross-row means ride the fixed-point long-sum trick (e5/e20
    // idiom) so the report is bit-deterministic and FULLY oracled.
    "e36_pq_error_report" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.pqErrorReport(emb, emb.filter(col("vec_id") < 5))
    },

    // farthest-first traversal (e34): Gonzalez's k-center seeding —
    // the deterministic k-means++ stand-in that picks maximally-
    // spread quantizer seeds (or a maximally-diverse eval panel) and
    // reports the corpus coverage radius at each k. Each round is one
    // ZERO-SHUFFLE corpus scan (selected centers ride as literals in
    // a least fold; argmax = TakeOrderedAndProject) — the honest
    // k-pass cost of the greedy 2-approximation. FULL oracle: the
    // rounds unroll as CTEs (the e22/e33/d45 precedent).
    "e34_kcenter_init" -> q { (s, d) =>
      Similarity.kcenterInit(table(s, d, "embeddings"), k = 5)
        .orderBy("rank")
    }
  )

  private def sumSq(l: String) =
    s"list_aggregate(list_transform($l, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')"

  /** DuckDB SQL for the multi-table sign-LSH bucket array: the same
    * deterministic plane constants the Spark expression carries are
    * embedded as double literals (Double.toString round-trips exactly
    * through strtod), and the projections fold sequentially in double —
    * bit-identical bucketing, so the LSH query gets a FULL oracle. */
  /** Bucket-width mask CTE: the same occupancy-held p the Spark side
    * derives (Similarity.autoPlanes — smallest p ∈ [4,16] with
    * 32·2^p ≥ count(*)) as a one-row msk = 2^p − 1, so
    * `bks[i] & pp.msk` reproduces the Spark bucket masking at ANY
    * corpus size. Pure integer arithmetic on both engines, so the
    * oracle stays full-fidelity at every SF, not just the one the
    * driver happens to verify at. */
  private val lshMaskSql: String =
    s"""pp AS (SELECT (1::BIGINT << COALESCE((SELECT MIN(g.j)
      |    FROM generate_series(4, ${Similarity.MaxPlanesPerTable}) g(j)
      |    WHERE (32::BIGINT << g.j) >= (SELECT count(*) FROM embeddings)),
      |    ${Similarity.MaxPlanesPerTable})) - 1
      |  AS msk)""".stripMargin

  private def lshBucketsSql(vec: String, nTables: Int, planesPerTable: Int): String = {
    val planes = graft.functions.Vectors.randomPlanes(nTables * planesPerTable, 64)
    def proj(p: Array[Double]) =
      s"list_aggregate(list_transform(list_zip($vec, [${p.mkString(", ")}]), " +
        "s -> CAST(s[1] AS DOUBLE) * s[2]), 'sum')"
    val buckets = (0 until nTables).map { t =>
      (0 until planesPerTable).map { p =>
        s"(CASE WHEN ${proj(planes(t * planesPerTable + p))} >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
    }
    buckets.map(b => s"($b)").mkString("[", ", ", "]")
  }

  /** Cosine between two list columns, folding sequentially in double —
    * bit-identical to the native CosineSim fold. */
  private def cosSql(a: String, b: String): String =
    s"""list_aggregate(list_transform(list_zip($a, $b),
       |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
       |      / (sqrt(list_aggregate(list_transform($a, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum'))
       |       * sqrt(list_aggregate(list_transform($b, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')))""".stripMargin

  private lazy val cellCosInSql: String = cosSql("e.embedding", "cc.ce")

  /** The IVF cell derivation (bootstrap centroids → per-vector cosine
    * scores → argmax cell), shared by the ANN oracles (e3/e11) — the
    * probe-query geometry, fixed nlist=16. */
  private lazy val ivfCellCtes: String =
    s"""cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
       |cscore AS (
       |  SELECT e.vec_id, cc.cid, $cellCosInSql AS cs
       |  FROM embeddings e CROSS JOIN cents cc),
       |cell AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |  FROM cscore) t WHERE rn = 1)""".stripMargin

  /** The SemDeDup cell derivation (e13): same bootstrap-centroid
    * geometry, but nlist is OCCUPANCY-HELD — the smallest power of two
    * with nlist·64 ≥ count(*) (Similarity.autoNlist; the exponent
    * bounds interpolate the Scala constants so the two derivations
    * cannot fork, property-checked in SimilaritySpec). This flat
    * Voronoi rule matches the engine while the derived nlist stays at
    * or below Similarity.FlatAssignCap — i.e. up to 4096·64 = 262144
    * vectors, far above every oracle-graded SF; beyond that the
    * engine's cells are the two-level hierarchical composition
    * (semCellsTwoLevel), spec-verified rather than SQL-oracled. A
    * fixed nlist makes within-cell pairs n²/(2·nlist) — the quadratic
    * trap the sf0.1→sf1 decade bench measured at 13.5×. */
  private lazy val semCellCtes: String =
    s"""nl AS (SELECT (1::BIGINT << COALESCE((SELECT MIN(g.j)
       |    FROM generate_series(${Similarity.AutoNlistMinExp}, ${Similarity.AutoNlistMaxExp}) g(j)
       |    WHERE (64::BIGINT << g.j) >= (SELECT count(*) FROM embeddings)),
       |    ${Similarity.AutoNlistMaxExp})) AS nlist),
       |cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings
       |  WHERE vec_id < (SELECT nlist FROM nl)),
       |cscore AS (
       |  SELECT e.vec_id, cc.cid, $cellCosInSql AS cs
       |  FROM embeddings e CROSS JOIN cents cc),
       |cell AS (SELECT vec_id, cid AS cell FROM (
       |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |  FROM cscore) t WHERE rn = 1)""".stripMargin

  /** The e8 k-NN-graph derivation (banded LSH candidates → exact
    * cosine → per-src top-5), shared by e8 and e21. Ends in the `knn`
    * CTE with columns (src, rank, dst, cos). */
  private lazy val knnGraphCtes: String = {
    val tbls = (0 until 8).map(t => s"($t)").mkString(", ")
    s"""$lshMaskSql,
       |base AS (SELECT vec_id, embedding, ${lshBucketsSql("embedding", 8, 16)} AS bks FROM embeddings),
       |b AS (SELECT vec_id, embedding, t.tbl AS tbl, bks[t.tbl + 1] & pp.msk AS bucket
       |      FROM base CROSS JOIN (VALUES $tbls) t(tbl) CROSS JOIN pp),
       |cand AS (SELECT DISTINCT x.vec_id AS src, y.vec_id AS dst,
       |    x.embedding AS ae, y.embedding AS be
       |  FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket
       |    AND x.vec_id <> y.vec_id),
       |scored AS (
       |  SELECT src, dst,
       |    list_aggregate(list_transform(list_zip(ae, be),
       |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
       |      / (sqrt(${sumSq("ae")}) * sqrt(${sumSq("be")})) AS cos
       |  FROM cand),
       |knn AS (SELECT src, rank, dst, cos FROM (
       |  SELECT src, dst, cos,
       |    ROW_NUMBER() OVER (PARTITION BY src ORDER BY cos DESC, dst) AS rank
       |  FROM scored) t
       |WHERE rank <= 5)""".stripMargin
  }

  /** The e22 beam rounds (3 × expand/score/prune over the `knn` CTE,
    * beam 4), shared by e22 and e23. Expects `qs` (q_id, qe) and
    * `f${tag}0` (q_id, node) upstream; ends in `f${tag}3` (q_id, node,
    * cos, rn). The tag keeps CTE names disjoint when one oracle
    * unrolls SEVERAL chains (e23's per-entry-count comparison). */
  private def beamRoundsSql(tag: String = ""): String = {
    def cosf(a: String, b: String) =
      s"list_aggregate(list_transform(list_zip($a, $b), " +
        s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum') " +
        s"/ (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))"
    (1 to 3).map { r =>
      s"""c$tag$r AS (SELECT DISTINCT q_id, node FROM (
         |  SELECT p.q_id, k.dst AS node FROM f$tag${r - 1} p JOIN knn k ON k.src = p.node
         |  UNION ALL SELECT q_id, node FROM f$tag${r - 1}) t),
         |s$tag$r AS (SELECT c.q_id, c.node, ${cosf("qs.qe", "e.embedding")} AS cos
         |  FROM c$tag$r c JOIN embeddings e ON e.vec_id = c.node
         |  JOIN qs ON qs.q_id = c.q_id),
         |f$tag$r AS (SELECT q_id, node, cos, rn FROM (
         |  SELECT q_id, node, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, node) AS rn
         |  FROM s$tag$r) t WHERE rn <= 4)""".stripMargin
    }.mkString(",\n")
  }

  /** The IVF-SQ8 derivation (cells → probes → per-dim min/max stats →
    * 8-bit codes → midpoint-reconstruction inner products), shared by
    * e15 (top-k over quantized scores) and e17 (top-c candidates +
    * exact re-rank). Ends in the `scored` CTE. */
  /** e7's oracle — PQ/ADC with the deterministic codebooks (first 16
    * vectors, 8 subspaces × 8 dims), d-ascending double folds; shared
    * by e7 (from-scratch) and e29 (persisted index), one oracle for
    * both execution strategies. */
  private lazy val pqAdcOracle: String = {
    // squared L2 between subspace s (0-based lambda var) of vector v
    // and codeword j (1-based lambda var) — d ascending
    def dist(v: String) =
      s"""list_aggregate(list_transform(generate_series(1, 8), d ->
         |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d]) *
         |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d])), 'sum')""".stripMargin
    s"""WITH cbv AS (SELECT list(list_transform(embedding, x -> CAST(x AS DOUBLE))
       |    ORDER BY vec_id) AS cbs
       |  FROM embeddings WHERE vec_id < 16),
       |enc0 AS (
       |  SELECT e.vec_id AS cand_id,
       |    list_transform(generate_series(0, 7), s ->
       |      list_transform(generate_series(1, 16), j -> ${dist("e.embedding")})) AS dls
       |  FROM embeddings e CROSS JOIN cbv),
       |enc AS (SELECT cand_id,
       |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS code
       |  FROM enc0),
       |lut AS (
       |  SELECT qv.vec_id AS q_id,
       |    list_transform(generate_series(0, 127), i ->
       |      ${dist("qv.embedding")
             .replace("s*8", "(i // 16)*8")
             .replace("cbs[j]", "cbs[(i % 16) + 1]")}) AS lutv
       |  FROM embeddings qv CROSS JOIN cbv WHERE qv.vec_id < 5),
       |scored AS (
       |  SELECT q_id, cand_id,
       |    list_aggregate(list_transform(generate_series(0, 7), s ->
       |      lutv[s*16 + code[s+1] + 1]), 'sum') AS adc
       |  FROM enc CROSS JOIN lut WHERE cand_id <> q_id)
       |SELECT q_id, rank, cand_id, adc FROM (
       |  SELECT q_id, cand_id, adc,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  }

  private lazy val sq8ScoredCtes: String =
    s"""$ivfCellCtes,
       |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
       |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
       |dims AS (SELECT u.i AS i,
       |    min(CAST(e.embedding[u.i] AS DOUBLE)) AS mn,
       |    max(CAST(e.embedding[u.i] AS DOUBLE)) AS mx
       |  FROM embeddings e, generate_series(1, 64) u(i) GROUP BY u.i),
       |stats AS (SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs FROM dims),
       |enc AS (SELECT e.vec_id AS cand_id,
       |    list_transform(generate_series(1, 64), i ->
       |      CASE WHEN mxs[i] = mns[i] THEN 0
       |        ELSE CAST(least(floor((CAST(e.embedding[i] AS DOUBLE) - mns[i]) * 255 / (mxs[i] - mns[i])), 255) AS INTEGER) END) AS code
       |  FROM embeddings e CROSS JOIN stats),
       |cand AS (
       |  SELECT p.q_id, c.vec_id AS cand_id
       |  FROM probes p JOIN cell c ON p.cell = c.cell
       |  WHERE c.vec_id <> p.q_id),
       |scored AS (
       |  SELECT cand.q_id, cand.cand_id,
       |    list_aggregate(list_transform(generate_series(1, 64), i ->
       |      CAST(qv.embedding[i] AS DOUBLE) *
       |        (mns[i] + (CAST(code[i] AS DOUBLE) + 0.5) * ((mxs[i] - mns[i]) / 255))), 'sum') AS sq_ip
       |  FROM cand
       |  JOIN embeddings qv ON qv.vec_id = cand.q_id
       |  JOIN enc ON enc.cand_id = cand.cand_id
       |  CROSS JOIN stats)""".stripMargin

  /** The IVF query derivation (cells → probe selection → candidate
    * scoring → top-k), shared by e3 (in-memory) and e11 (persisted
    * base + appended delta): both compute the same geometry, so one
    * SQL derivation oracles both bit-exactly. */
  private lazy val ivfSql: String = {
    s"""WITH $ivfCellCtes,
       |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
       |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
       |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
       |cand AS (
       |  SELECT p.q_id, c.vec_id AS cand_id
       |  FROM probes p JOIN cell c ON p.cell = c.cell
       |  WHERE c.vec_id <> p.q_id),
       |scored AS (
       |  SELECT cand.q_id, cand.cand_id,
       |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
       |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
       |      / (sqrt(${sumSq("a.embedding")}) * sqrt(${sumSq("b.embedding")})) AS cos
       |  FROM cand
       |  JOIN embeddings a ON a.vec_id = cand.q_id
       |  JOIN embeddings b ON b.vec_id = cand.cand_id)
       |SELECT q_id, rank, cand_id, cos FROM (
       |  SELECT q_id, cand_id, cos,
       |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
       |  FROM scored) t
       |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
  }

  /** e33's oracle: the greedy MMR fold unrolled as 5 argmax rounds
    * (the e22/d45 unrolling precedent) over the same top-20 pool and
    * pool-only pairwise cosine CTEs; λ and 1−λ are the SAME
    * [[Similarity.MmrLambda]]/[[Similarity.MmrOneMinusLambda]]
    * literals the Scala fold multiplies with. */
  private def mmrOracle: String = {
    val lam = s"CAST(${Similarity.MmrLambda} AS DOUBLE)"
    val om = s"CAST(${Similarity.MmrOneMinusLambda} AS DOUBLE)"
    val rounds = (2 to 5).map { r =>
      s"""c$r AS (SELECT p.cand_id, p.rel, $lam * p.rel - $om * MAX(s.sim) AS mmr
         |  FROM pool p JOIN sims s ON s.a_id = p.cand_id
         |    AND s.b_id IN (SELECT cand_id FROM sel${r - 1})
         |  WHERE p.cand_id NOT IN (SELECT cand_id FROM sel${r - 1})
         |  GROUP BY p.cand_id, p.rel),
         |s$r AS (SELECT cand_id, rel, mmr FROM c$r ORDER BY mmr DESC, cand_id LIMIT 1),
         |sel$r AS (SELECT cand_id FROM sel${r - 1} UNION ALL SELECT cand_id FROM s$r)""".stripMargin
    }.mkString(",\n")
    val out = (1 to 5)
      .map(r => s"SELECT $r AS rank, cand_id AS vec_id, rel, mmr FROM s$r")
      .mkString("\nUNION ALL ")
    s"""WITH qs AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
       |scored AS (SELECT e.vec_id AS cand_id, ${cosSql("qe", "e.embedding")} AS cos
       |  FROM embeddings e CROSS JOIN qs WHERE e.vec_id <> 0),
       |pool AS (SELECT cand_id, cos AS rel FROM (
       |  SELECT cand_id, cos, ROW_NUMBER() OVER (ORDER BY cos DESC, cand_id) AS rnk
       |  FROM scored) t WHERE rnk <= 20),
       |pv AS (SELECT p.cand_id, e.embedding AS ce FROM pool p
       |  JOIN embeddings e ON e.vec_id = p.cand_id),
       |sims AS (SELECT a.cand_id AS a_id, b.cand_id AS b_id,
       |    ${cosSql("a.ce", "b.ce")} AS sim
       |  FROM pv a JOIN pv b ON a.cand_id <> b.cand_id),
       |s1 AS (SELECT cand_id, rel, $lam * rel AS mmr
       |  FROM pool ORDER BY rel DESC, cand_id LIMIT 1),
       |sel1 AS (SELECT cand_id FROM s1),
       |$rounds
       |$out
       |ORDER BY rank""".stripMargin
  }

  /** e34's oracle: the farthest-first rounds unrolled as CTEs — each
    * round cross-joins the (1-row) previous picks, takes the least of
    * the 1−cos terms (the same exact-min the Scala least fold
    * computes) and argmaxes with the same DESC, vec_id tie-break. */
  private def kcenterOracle(k: Int): String = {
    val rounds = (2 to k).map { r =>
      val crosses = (1 until r).map(i => s"p$i").mkString(" CROSS JOIN ")
      val notSel = (1 until r).map(i => s"e.vec_id <> p$i.vec_id").mkString(" AND ")
      val terms = (1 until r)
        .map(i => s"1.0 - ${cosSql("e.embedding", s"p$i.em")}")
        .mkString(",\n      ")
      val minD = if (r == 2) terms else s"least($terms)"
      s"""d$r AS (SELECT e.vec_id, $minD AS r
         |  FROM embeddings e CROSS JOIN $crosses
         |  WHERE $notSel),
         |p$r AS (SELECT e2.vec_id, e2.embedding AS em, t.r FROM (
         |    SELECT vec_id, r FROM d$r ORDER BY r DESC, vec_id LIMIT 1) t
         |  JOIN embeddings e2 USING (vec_id))""".stripMargin
    }.mkString(",\n")
    val out = (2 to k)
      .map(r => s"SELECT CAST($r AS INTEGER) AS rank, vec_id, r AS radius FROM p$r")
      .mkString("\nUNION ALL ")
    s"""WITH p1 AS (SELECT vec_id, embedding AS em FROM embeddings ORDER BY vec_id LIMIT 1),
       |$rounds
       |SELECT CAST(1 AS INTEGER) AS rank, vec_id, 0.0 AS radius FROM p1
       |UNION ALL $out
       |ORDER BY rank""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "e33_mmr_select" -> mmrOracle,
    "e34_kcenter_init" -> kcenterOracle(5),

    // both retrieval passes + the per-dim Rocchio expansion: the
    // feedback vectors fold in cand_id order (list(... ORDER BY
    // vec_id)), the same order the driver sums in
    "e37_prf_expand" -> {
      val a = Similarity.PrfAlpha
      val b = Similarity.PrfBeta
      s"""WITH q0 AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0),
         |scored0 AS (SELECT e.vec_id AS cand_id, ${cosSql("qe", "e.embedding")} AS cos
         |  FROM embeddings e CROSS JOIN q0 WHERE e.vec_id <> 0),
         |fb AS (SELECT cand_id FROM (
         |  SELECT cand_id, ROW_NUMBER() OVER (ORDER BY cos DESC, cand_id) AS rnk
         |  FROM scored0) t WHERE rnk <= 10),
         |fbv AS (SELECT list(list_transform(e.embedding, x -> CAST(x AS DOUBLE))
         |    ORDER BY e.vec_id) AS vs
         |  FROM embeddings e JOIN fb ON fb.cand_id = e.vec_id),
         |qx AS (SELECT list_transform(generate_series(1, 64), d ->
         |    CAST($a AS DOUBLE) * CAST(qe[d] AS DOUBLE) +
         |    CAST($b AS DOUBLE) * (list_aggregate(list_transform(vs, v -> v[d]), 'sum') / CAST(len(vs) AS DOUBLE))) AS qv
         |  FROM q0 CROSS JOIN fbv),
         |scored AS (SELECT e.vec_id AS cand_id,
         |    ${cosSql("qv", "e.embedding")} AS cos_expanded,
         |    e.vec_id IN (SELECT cand_id FROM fb) AS was_feedback
         |  FROM embeddings e CROSS JOIN qx WHERE e.vec_id <> 0)
         |SELECT rank, cand_id, cos_expanded, was_feedback FROM (
         |  SELECT cand_id, cos_expanded, was_feedback,
         |    ROW_NUMBER() OVER (ORDER BY cos_expanded DESC, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY rank""".stripMargin
    },

    // the e9 raw chain + the e35 residual chain + the exact L2² fold,
    // unpivoted to one (method, fixed-point error) stream — raw LUTs
    // are cell-independent so the oracle computes them once per query
    "e36_pq_error_report" -> {
      def dist(v: String) =
        s"""list_aggregate(list_transform(generate_series(1, 8), d ->
           |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d]) *
           |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d])), 'sum')""".stripMargin
      def cosM(a: String, b: String) =
        s"""list_aggregate(list_transform(list_zip($a, $b),
           |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
           |      / (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))""".stripMargin
      def rv(e: String) =
        s"list_transform(list_zip($e, cc.ce), s -> CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))"
      def lutBody(v: String) = dist(v)
        .replace("s*8", "(i // 16)*8")
        .replace("cbs[j]", "cbs[(i % 16) + 1]")
      s"""WITH cbv AS (SELECT list(list_transform(embedding, x -> CAST(x AS DOUBLE))
         |    ORDER BY vec_id) AS cbs
         |  FROM embeddings WHERE vec_id < 16),
         |cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |cscore AS (SELECT e.vec_id, cc.cid, ${cosM("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cents cc),
         |cell AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore) t WHERE rn = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
         |res AS (SELECT e.vec_id, ${rv("e.embedding")} AS rv
         |  FROM embeddings e JOIN cell ON cell.vec_id = e.vec_id
         |  JOIN cents cc ON cc.cid = cell.cell),
         |rcbv AS (SELECT list(rv ORDER BY vec_id) AS cbs FROM res WHERE vec_id < 16),
         |enc0 AS (SELECT e.vec_id AS cand_id,
         |    list_transform(generate_series(0, 7), s ->
         |      list_transform(generate_series(1, 16), j -> ${dist("e.embedding")})) AS dls
         |  FROM embeddings e CROSS JOIN cbv),
         |enc AS (SELECT cand_id,
         |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS code
         |  FROM enc0),
         |encr0 AS (SELECT res.vec_id AS cand_id,
         |    list_transform(generate_series(0, 7), s ->
         |      list_transform(generate_series(1, 16), j -> ${dist("res.rv")})) AS dls
         |  FROM res CROSS JOIN rcbv),
         |encr AS (SELECT cand_id,
         |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS code
         |  FROM encr0),
         |lut AS (SELECT qv.vec_id AS q_id,
         |    list_transform(generate_series(0, 127), i -> ${lutBody("qv.embedding")}) AS lutv
         |  FROM embeddings qv CROSS JOIN cbv WHERE qv.vec_id < 5),
         |qres AS (SELECT p.q_id, p.cell, ${rv("qv.embedding")} AS rv
         |  FROM probes p JOIN embeddings qv ON qv.vec_id = p.q_id
         |  JOIN cents cc ON cc.cid = p.cell),
         |lutr AS (SELECT qres.q_id, qres.cell,
         |    list_transform(generate_series(0, 127), i -> ${lutBody("qres.rv")}) AS lutv
         |  FROM qres CROSS JOIN rcbv),
         |cand AS (SELECT p.q_id, p.cell, c.vec_id AS cand_id
         |  FROM probes p JOIN cell c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |scored AS (SELECT cand.q_id, cand.cand_id,
         |    list_aggregate(list_transform(generate_series(0, 7), s ->
         |      lut.lutv[s*16 + enc.code[s+1] + 1]), 'sum') AS adc_raw,
         |    list_aggregate(list_transform(generate_series(0, 7), s ->
         |      lutr.lutv[s*16 + encr.code[s+1] + 1]), 'sum') AS adc_res,
         |    list_aggregate(list_transform(list_zip(qv.embedding, ev.embedding),
         |      s -> (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE)) *
         |           (CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))), 'sum') AS exact
         |  FROM cand
         |  JOIN enc ON enc.cand_id = cand.cand_id
         |  JOIN encr ON encr.cand_id = cand.cand_id
         |  JOIN lut ON lut.q_id = cand.q_id
         |  JOIN lutr ON lutr.q_id = cand.q_id AND lutr.cell = cand.cell
         |  JOIN embeddings qv ON qv.vec_id = cand.q_id
         |  JOIN embeddings ev ON ev.vec_id = cand.cand_id),
         |errs AS (
         |  SELECT 'raw' AS method,
         |    CAST(floor(abs(adc_raw - exact) * 1048576.0) AS BIGINT) AS fp
         |  FROM scored
         |  UNION ALL SELECT 'residual',
         |    CAST(floor(abs(adc_res - exact) * 1048576.0) AS BIGINT)
         |  FROM scored)
         |SELECT method, COUNT(*) AS n_pairs,
         |  CAST(SUM(fp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1048576.0
         |    AS mean_abs_err
         |FROM errs GROUP BY method ORDER BY method""".stripMargin
    },

    // e9's chains with residual CTEs spliced in: res carries every
    // vector's x − centroid(cell(x)), the codebook is the first 16
    // vectors' OWN residuals, and the LUT keys on (query, probed
    // cell) — the join pairs candidates with the right LUT exactly as
    // the Spark cell equi-join does
    "e35_residual_pq" -> {
      def dist(v: String) =
        s"""list_aggregate(list_transform(generate_series(1, 8), d ->
           |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d]) *
           |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d])), 'sum')""".stripMargin
      def cosM(a: String, b: String) =
        s"""list_aggregate(list_transform(list_zip($a, $b),
           |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
           |      / (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))""".stripMargin
      def rv(e: String) =
        s"list_transform(list_zip($e, cc.ce), s -> CAST(s[1] AS DOUBLE) - CAST(s[2] AS DOUBLE))"
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |cscore AS (SELECT e.vec_id, cc.cid, ${cosM("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cents cc),
         |cell AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore) t WHERE rn = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
         |res AS (SELECT e.vec_id, ${rv("e.embedding")} AS rv
         |  FROM embeddings e JOIN cell ON cell.vec_id = e.vec_id
         |  JOIN cents cc ON cc.cid = cell.cell),
         |rcbv AS (SELECT list(rv ORDER BY vec_id) AS cbs FROM res WHERE vec_id < 16),
         |enc0 AS (SELECT res.vec_id AS cand_id,
         |    list_transform(generate_series(0, 7), s ->
         |      list_transform(generate_series(1, 16), j -> ${dist("res.rv")})) AS dls
         |  FROM res CROSS JOIN rcbv),
         |enc AS (SELECT cand_id,
         |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS code
         |  FROM enc0),
         |qres AS (SELECT p.q_id, p.cell, ${rv("qv.embedding")} AS rv
         |  FROM probes p JOIN embeddings qv ON qv.vec_id = p.q_id
         |  JOIN cents cc ON cc.cid = p.cell),
         |lut AS (SELECT qres.q_id, qres.cell,
         |    list_transform(generate_series(0, 127), i ->
         |      ${dist("qres.rv")
               .replace("s*8", "(i // 16)*8")
               .replace("cbs[j]", "cbs[(i % 16) + 1]")}) AS lutv
         |  FROM qres CROSS JOIN rcbv),
         |cand AS (SELECT p.q_id, p.cell, c.vec_id AS cand_id
         |  FROM probes p JOIN cell c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |scored AS (SELECT cand.q_id, cand.cand_id,
         |    list_aggregate(list_transform(generate_series(0, 7), s ->
         |      lutv[s*16 + code[s+1] + 1]), 'sum') AS adc
         |  FROM cand
         |  JOIN enc ON enc.cand_id = cand.cand_id
         |  JOIN lut ON lut.q_id = cand.q_id AND lut.cell = cand.cell)
         |SELECT q_id, rank, cand_id, adc FROM (
         |  SELECT q_id, cand_id, adc,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },
    "e1_cosine_topk" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |cs AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
         |scored AS (
         |  SELECT q_id, cand_id,
         |    list_aggregate(list_transform(list_zip(qe, ce),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("qe")}) * sqrt(${sumSq("ce")})) AS cos
         |  FROM cs, qs WHERE cand_id <> q_id)
         |SELECT q_id, rank, cand_id, cos FROM (
         |  SELECT q_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // both chains (brute-force + LSH) replayed as CTEs, joined the
    // same way — the recall number itself is what's being checked
    "e12_recall_report" -> {
      val tbls = (0 until 8).map(t => s"($t)").mkString(", ")
      val cosQC =
        s"""list_aggregate(list_transform(list_zip(qe, ce),
           |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
           |      / (sqrt(${sumSq("qe")}) * sqrt(${sumSq("ce")}))""".stripMargin
      s"""WITH qs0 AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |cs0 AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
         |exact AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |    FROM (SELECT q_id, cand_id, $cosQC AS cos
         |          FROM cs0, qs0 WHERE cand_id <> q_id) s) t
         |  WHERE rank <= 10),
         |$lshMaskSql,
         |base AS (SELECT vec_id, embedding, ${lshBucketsSql("embedding", 8, 16)} AS bks FROM embeddings),
         |c AS (SELECT vec_id AS cand_id, embedding AS ce, t.tbl AS tbl, bks[t.tbl + 1] & pp.msk AS bucket
         |      FROM base CROSS JOIN (VALUES $tbls) t(tbl) CROSS JOIN pp),
         |qb AS (SELECT vec_id AS q_id, embedding AS qe, t.tbl AS tbl, bks[t.tbl + 1] & pp.msk AS bucket
         |      FROM base CROSS JOIN (VALUES $tbls) t(tbl) CROSS JOIN pp WHERE vec_id < 5),
         |cand AS (SELECT DISTINCT q_id, qe, cand_id, ce
         |         FROM c JOIN qb USING (tbl, bucket) WHERE cand_id <> q_id),
         |approx AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |    FROM (SELECT q_id, cand_id, $cosQC AS cos FROM cand) s) t
         |  WHERE rank <= 10)
         |SELECT e.q_id,
         |  CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |    / 10.0 AS recall_at_10
         |FROM exact e LEFT JOIN approx a
         |  ON e.q_id = a.q_id AND e.cand_id = a.cand_id
         |GROUP BY e.q_id ORDER BY e.q_id""".stripMargin
    },

    // the reduction equality is computed with the SAME double ops on
    // both engines, so the boolean matches Spark's bit-for-bit (it is
    // not asserted against a literal — if double rounding ever
    // collapsed two ips into one aug_cos, both sides would agree on 0)
    "e10_mips_topk" ->
      s"""WITH qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |cs AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
         |mx AS (SELECT MAX(sqrt(${sumSq("embedding")})) AS maxnorm FROM embeddings),
         |scored AS (
         |  SELECT q_id, cand_id,
         |    list_aggregate(list_transform(list_zip(qe, ce),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum') AS ip,
         |    list_aggregate(list_transform(list_zip(qe, ce),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("qe")}) * maxnorm) AS aug_cos
         |  FROM cs, qs, mx WHERE cand_id <> q_id),
         |r AS (SELECT q_id, cand_id, ip, aug_cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY ip DESC, cand_id) AS rank
         |  FROM scored)
         |SELECT q_id, rank, cand_id, ip,
         |  CAST(rank = ROW_NUMBER() OVER
         |    (PARTITION BY q_id ORDER BY aug_cos DESC, cand_id) AS INTEGER)
         |    AS aug_agrees
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    "e2_ann_lsh" -> {
      val tbls = (0 until 8).map(t => s"($t)").mkString(", ")
      s"""WITH $lshMaskSql,
         |base AS (SELECT vec_id, embedding, ${lshBucketsSql("embedding", 8, 16)} AS bks FROM embeddings),
         |c AS (SELECT vec_id AS cand_id, embedding AS ce, t.tbl AS tbl, bks[t.tbl + 1] & pp.msk AS bucket
         |      FROM base CROSS JOIN (VALUES $tbls) t(tbl) CROSS JOIN pp),
         |qs AS (SELECT vec_id AS q_id, embedding AS qe, t.tbl AS tbl, bks[t.tbl + 1] & pp.msk AS bucket
         |      FROM base CROSS JOIN (VALUES $tbls) t(tbl) CROSS JOIN pp WHERE vec_id < 5),
         |cand AS (SELECT DISTINCT q_id, qe, cand_id, ce
         |         FROM c JOIN qs USING (tbl, bucket) WHERE cand_id <> q_id),
         |scored AS (
         |  SELECT q_id, cand_id,
         |    list_aggregate(list_transform(list_zip(qe, ce),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("qe")}) * sqrt(${sumSq("ce")})) AS cos
         |  FROM cand)
         |SELECT q_id, rank, cand_id, cos FROM (
         |  SELECT q_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    "e3_ann_ivf" -> ivfSql,

    "e27_range_search" ->
      s"""WITH $ivfCellCtes,
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
         |cand AS (
         |  SELECT p.q_id, c.vec_id AS cand_id
         |  FROM probes p JOIN cell c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.cand_id,
         |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("a.embedding")}) * sqrt(${sumSq("b.embedding")})) AS cos
         |  FROM cand
         |  JOIN embeddings a ON a.vec_id = cand.q_id
         |  JOIN embeddings b ON b.vec_id = cand.cand_id)
         |SELECT q_id, cand_id, cos FROM scored WHERE cos >= 0.1
         |ORDER BY q_id, cand_id""".stripMargin,

    // e3's chain with the near-dup ceiling applied before the top-10
    // window — the hard-negative rule as one added predicate
    "e32_hard_negatives" ->
      s"""WITH $ivfCellCtes,
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
         |cand AS (
         |  SELECT p.q_id, c.vec_id AS cand_id
         |  FROM probes p JOIN cell c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.cand_id,
         |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("a.embedding")}) * sqrt(${sumSq("b.embedding")})) AS cos
         |  FROM cand
         |  JOIN embeddings a ON a.vec_id = cand.q_id
         |  JOIN embeddings b ON b.vec_id = cand.cand_id)
         |SELECT q_id, rank, cand_id, cos FROM (
         |  SELECT q_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored WHERE cos < 0.2) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // the maintained (base + appended delta) index reproduces the
    // full-corpus IVF answer exactly, so the same derivation oracles it
    "e11_ivf_delta" -> ivfSql,

    "e13_semdedup" ->
      s"""WITH $semCellCtes,
         |pairs AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id
         |  FROM cell a JOIN cell b ON a.cell = b.cell AND a.vec_id < b.vec_id),
         |dups AS (
         |  SELECT DISTINCT p.b_id AS vec_id
         |  FROM pairs p
         |  JOIN embeddings ea ON ea.vec_id = p.a_id
         |  JOIN embeddings eb ON eb.vec_id = p.b_id
         |  WHERE list_aggregate(list_transform(list_zip(ea.embedding, eb.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("ea.embedding")}) * sqrt(${sumSq("eb.embedding")})) >= 0.35)
         |SELECT vec_id FROM embeddings
         |WHERE vec_id NOT IN (SELECT vec_id FROM dups)
         |ORDER BY vec_id""".stripMargin,

    "e5_ann_ivf_lloyd" -> {
      def cosM(a: String, b: String) =
        s"""list_aggregate(list_transform(list_zip($a, $b),
           |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
           |      / (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))""".stripMargin
      s"""WITH cents0 AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |cs0 AS (SELECT e.vec_id, e.embedding, cc.cid, ${cosM("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cents0 cc),
         |cell0 AS (SELECT vec_id, embedding, cid AS cell FROM (
         |  SELECT vec_id, embedding, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cs0) t WHERE rn = 1),
         |means AS (
         |  SELECT cell, g.pos,
         |    CAST(SUM(CAST(floor(CAST(embedding[g.pos] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS m
         |  FROM cell0 CROSS JOIN range(1, 65) g(pos)
         |  GROUP BY cell, g.pos),
         |rcents0 AS (SELECT cell, list(m ORDER BY pos) AS rc FROM means GROUP BY cell),
         |rcents AS (SELECT cc.cid AS cell,
         |    COALESCE(r.rc, list_transform(cc.ce, x -> CAST(x AS DOUBLE))) AS rc
         |  FROM cents0 cc LEFT JOIN rcents0 r ON r.cell = cc.cid),
         |cs1 AS (SELECT e.vec_id, e.embedding, r.cell, ${cosM("e.embedding", "r.rc")} AS cs
         |  FROM embeddings e CROSS JOIN rcents r),
         |cell1 AS (SELECT vec_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |  FROM cs1) t WHERE rn = 1),
         |probes AS (SELECT vec_id AS q_id, cell FROM (
         |  SELECT vec_id, cell, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cell) AS rn
         |  FROM cs1 WHERE vec_id < 5) t WHERE rn <= 4),
         |cand AS (
         |  SELECT p.q_id, c.vec_id AS cand_id
         |  FROM probes p JOIN cell1 c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.cand_id, ${cosM("a.embedding", "b.embedding")} AS cos
         |  FROM cand
         |  JOIN embeddings a ON a.vec_id = cand.q_id
         |  JOIN embeddings b ON b.vec_id = cand.cand_id)
         |SELECT q_id, rank, cand_id, cos FROM (
         |  SELECT q_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    // IVFADC mirror: e3's cell/probe chain + e7's code/LUT chain,
    // candidates bounded by probed cells, scored by ADC
    "e9_ivf_pq" -> {
      def dist(v: String) =
        s"""list_aggregate(list_transform(generate_series(1, 8), d ->
           |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d]) *
           |        (CAST($v[s*8 + d] AS DOUBLE) - cbs[j][s*8 + d])), 'sum')""".stripMargin
      def cosM(a: String, b: String) =
        s"""list_aggregate(list_transform(list_zip($a, $b),
           |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
           |      / (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))""".stripMargin
      s"""WITH cbv AS (SELECT list(list_transform(embedding, x -> CAST(x AS DOUBLE))
         |    ORDER BY vec_id) AS cbs
         |  FROM embeddings WHERE vec_id < 16),
         |cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |cscore AS (SELECT e.vec_id, cc.cid, ${cosM("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cents cc),
         |cell AS (SELECT vec_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore) t WHERE rn = 1),
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
         |enc0 AS (
         |  SELECT e.vec_id AS cand_id,
         |    list_transform(generate_series(0, 7), s ->
         |      list_transform(generate_series(1, 16), j -> ${dist("e.embedding")})) AS dls
         |  FROM embeddings e CROSS JOIN cbv),
         |enc AS (SELECT cand_id,
         |    list_transform(dls, dl -> list_position(dl, list_min(dl)) - 1) AS code
         |  FROM enc0),
         |lut AS (
         |  SELECT qv.vec_id AS q_id,
         |    list_transform(generate_series(0, 127), i ->
         |      ${dist("qv.embedding")
               .replace("s*8", "(i // 16)*8")
               .replace("cbs[j]", "cbs[(i % 16) + 1]")}) AS lutv
         |  FROM embeddings qv CROSS JOIN cbv WHERE qv.vec_id < 5),
         |cand AS (
         |  SELECT p.q_id, c.vec_id AS cand_id
         |  FROM probes p JOIN cell c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |scored AS (
         |  SELECT cand.q_id, cand.cand_id,
         |    list_aggregate(list_transform(generate_series(0, 7), s ->
         |      lutv[s*16 + code[s+1] + 1]), 'sum') AS adc
         |  FROM cand
         |  JOIN enc ON enc.cand_id = cand.cand_id
         |  JOIN lut ON lut.q_id = cand.q_id)
         |SELECT q_id, rank, cand_id, adc FROM (
         |  SELECT q_id, cand_id, adc,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adc, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    "e8_knn_graph" ->
      s"""WITH $knnGraphCtes
         |SELECT src, rank, dst, cos FROM knn ORDER BY src, rank""".stripMargin,

    // the e3 cell/probe chain (nprobe 4) with the lang predicate
    // applied to candidates BEFORE the top-10 window — pre-filter
    // semantics exactly as the Spark plan
    "e31_filtered_search" ->
      s"""WITH $ivfCellCtes,
         |probes AS (SELECT vec_id AS q_id, cid AS cell FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 4),
         |cand AS (
         |  SELECT p.q_id, c.vec_id AS cand_id
         |  FROM probes p JOIN cell c ON p.cell = c.cell
         |  WHERE c.vec_id <> p.q_id),
         |fcand AS (
         |  SELECT cand.q_id, cand.cand_id
         |  FROM cand JOIN documents d ON d.doc_id = cand.cand_id
         |  WHERE d.lang = 'en'),
         |scored AS (
         |  SELECT fcand.q_id, fcand.cand_id,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM fcand
         |  JOIN embeddings a ON a.vec_id = fcand.q_id
         |  JOIN embeddings b ON b.vec_id = fcand.cand_id)
         |SELECT q_id, rank, cand_id, cos FROM (
         |  SELECT q_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // the e3 cell chain with the probe rank carried through scoring,
    // then one top-10 + recall chain per nprobe (mechanically unrolled
    // — the e23 per-entry-count precedent); cells partition the space,
    // so no DISTINCT is needed across probes
    "e30_nprobe_recall" -> {
      val chains = Seq(1, 2, 4, 8).map { np =>
        s"""a$np AS (SELECT q_id, cand_id FROM (
           |  SELECT q_id, cand_id,
           |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
           |  FROM pscored WHERE probe_rn <= $np) t WHERE rank <= 10),
           |r$np AS (SELECT $np AS nprobe, e.q_id,
           |    CAST(SUM(CASE WHEN a.cand_id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
           |      / 10.0 AS recall_at_10
           |  FROM exact e LEFT JOIN a$np a
           |    ON e.q_id = a.q_id AND e.cand_id = a.cand_id
           |  GROUP BY e.q_id)""".stripMargin
      }.mkString(",\n")
      s"""WITH $ivfCellCtes,
         |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |exact AS (SELECT q_id, cand_id FROM (
         |  SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM (SELECT q_id, e.vec_id AS cand_id, ${cosSql("qe", "e.embedding")} AS cos
         |        FROM embeddings e, qs WHERE e.vec_id <> q_id) s) t
         |  WHERE rank <= 10),
         |pr AS (SELECT vec_id AS q_id, cid AS cell, rn AS probe_rn FROM (
         |  SELECT vec_id, cid, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cscore WHERE vec_id < 5) t WHERE rn <= 8),
         |pscored AS (SELECT p.q_id, c.vec_id AS cand_id, p.probe_rn,
         |    ${cosSql("a.embedding", "b.embedding")} AS cos
         |  FROM pr p JOIN cell c ON p.cell = c.cell AND c.vec_id <> p.q_id
         |  JOIN embeddings a ON a.vec_id = p.q_id
         |  JOIN embeddings b ON b.vec_id = c.vec_id),
         |$chains
         |SELECT nprobe, q_id, recall_at_10 FROM (
         |  SELECT * FROM r1 UNION ALL SELECT * FROM r2
         |  UNION ALL SELECT * FROM r4 UNION ALL SELECT * FROM r8) u
         |ORDER BY nprobe, q_id""".stripMargin
    },

    // the e8 chain + the 3 beam rounds unrolled: candidates = frontier
    // ∪ out-neighbors, the e1 cosine fold, ROW_NUMBER top-4 — each
    // round a mechanical CTE triple
    "e22_graph_search" ->
      s"""WITH $knnGraphCtes,
         |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |f0 AS (SELECT q_id, CAST(0 AS BIGINT) AS node FROM qs),
         |${beamRoundsSql()}
         |SELECT q_id, rn AS rank, node, cos FROM f3 ORDER BY q_id, rank""".stripMargin,

    // the e22 chain with e23's 8-entry frontier: the persisted graph
    // is a deterministic corpus derivation, so the same CTEs prove the
    // index read path
    "e28_graph_indexed" ->
      s"""WITH $knnGraphCtes,
         |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |f0 AS (SELECT q_id, CAST(u.e AS BIGINT) AS node
         |  FROM qs, (SELECT unnest(generate_series(0, 7)) AS e) u),
         |${beamRoundsSql()}
         |SELECT q_id, rn AS rank, node, cos FROM f3 ORDER BY q_id, rank""".stripMargin,

    // sign signatures summed from disjoint bit terms, xor+bit_count
    // hamming, both ranks from one scored CTE
    "e25_binary_quant" -> {
      // DuckDB overflow-checks 1 << 63 on BIGINT: bit 63 is the
      // min-long literal (the simhash-oracle convention)
      val sig = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(0, 63), " +
        "i -> CASE WHEN embedding[i + 1] > 0 THEN " +
        "(CASE WHEN i = 63 THEN (-9223372036854775807 - 1) " +
        "ELSE (CAST(1 AS BIGINT) << i) END) " +
        "ELSE CAST(0 AS BIGINT) END)), (a, b) -> a + b)"
      def fold(a: String, b: String) =
        s"list_aggregate(list_transform(list_zip($a, $b), " +
          s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum') " +
          s"/ (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))"
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe, $sig AS sq
         |  FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS cand_id, embedding AS ce, $sig AS sc
         |  FROM embeddings),
         |s AS (SELECT q_id, cand_id, bit_count(xor(sq, sc)) AS hamming,
         |    ${fold("qe", "ce")} AS cos_full
         |  FROM c, q WHERE cand_id <> q_id),
         |r AS (SELECT q_id, cand_id, hamming, cos_full,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY hamming ASC, cand_id) AS rank,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_full DESC, cand_id) AS rank_full
         |  FROM s)
         |SELECT q_id, rank, cand_id, CAST(hamming AS INTEGER) AS hamming,
         |  cos_full, rank_full <= 10 AS in_full_topk
         |FROM r WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin
    },

    // the sliced and full folds over one candidate set; both ranks
    // from the same scored CTE
    "e24_matryoshka" -> {
      def fold(a: String, b: String) =
        s"list_aggregate(list_transform(list_zip($a, $b), " +
          s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum') " +
          s"/ (sqrt(${sumSq(a)}) * sqrt(${sumSq(b)}))"
      s"""WITH q AS (SELECT vec_id AS q_id, embedding AS qe,
         |    embedding[1:16] AS qet FROM embeddings WHERE vec_id < 5),
         |c AS (SELECT vec_id AS cand_id, embedding AS ce,
         |    embedding[1:16] AS cet FROM embeddings),
         |s AS (SELECT q_id, cand_id, ${fold("qet", "cet")} AS cos_t,
         |    ${fold("qe", "ce")} AS cos_full
         |  FROM c, q WHERE cand_id <> q_id),
         |r AS (SELECT q_id, cand_id, cos_t, cos_full,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_t DESC, cand_id) AS rank_t,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos_full DESC, cand_id) AS rank_full
         |  FROM s)
         |SELECT q_id, rank_t, cand_id, cos_t, cos_full,
         |  rank_full <= 10 AS in_full_topk
         |FROM r WHERE rank_t <= 10 ORDER BY q_id, rank_t""".stripMargin
    },

    // recall@4 of the e22 beam against the e1 brute force (self
    // excluded from the exact set — self-occupancy in the beam
    // honestly costs recall): the e12 measurement loop closed for the
    // graph index
    "e23_graph_recall" -> {
      val cosQC =
        s"list_aggregate(list_transform(list_zip(qe, ce), " +
          s"s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum') " +
          s"/ (sqrt(${sumSq("qe")}) * sqrt(${sumSq("ce")}))"
      s"""WITH $knnGraphCtes,
         |qs AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
         |fa0 AS (SELECT q_id, CAST(0 AS BIGINT) AS node FROM qs),
         |${beamRoundsSql("a")},
         |fb0 AS (SELECT q_id, CAST(u.e AS BIGINT) AS node
         |  FROM qs, (SELECT unnest(generate_series(0, 7)) AS e) u),
         |${beamRoundsSql("b")},
         |cs0 AS (SELECT vec_id AS cand_id, embedding AS ce FROM embeddings),
         |exact AS (
         |  SELECT q_id, cand_id FROM (
         |    SELECT q_id, cand_id,
         |      ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |    FROM (SELECT q_id, cand_id, $cosQC AS cos
         |          FROM cs0, qs WHERE cand_id <> q_id) s) t
         |  WHERE rank <= 4),
         |ra AS (SELECT e.q_id, CAST(1 AS INTEGER) AS n_entries,
         |    CAST(SUM(CASE WHEN g.node IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |      / 4.0 AS recall_at_4
         |  FROM exact e LEFT JOIN fa3 g
         |    ON g.q_id = e.q_id AND g.node = e.cand_id
         |  GROUP BY e.q_id),
         |rb AS (SELECT e.q_id, CAST(8 AS INTEGER) AS n_entries,
         |    CAST(SUM(CASE WHEN g.node IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
         |      / 4.0 AS recall_at_4
         |  FROM exact e LEFT JOIN fb3 g
         |    ON g.q_id = e.q_id AND g.node = e.cand_id
         |  GROUP BY e.q_id)
         |SELECT * FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb) u
         |ORDER BY q_id, n_entries""".stripMargin
    },

    // the e8 chain spliced verbatim, then pure set algebra on the
    // narrow edge list: 2-hop join, first-reached-at-2 anti-join,
    // per-src degree counts, one double division
    "e21_knn_expand" ->
      s"""WITH $knnGraphCtes,
         |hop1 AS (SELECT src, dst FROM knn),
         |hop2 AS (SELECT DISTINCT e1.src AS src, e2.dst AS dst
         |  FROM hop1 e1 JOIN hop1 e2 ON e1.dst = e2.src
         |  WHERE e1.src <> e2.dst),
         |new2 AS (SELECT h2.src, h2.dst FROM hop2 h2
         |  LEFT JOIN hop1 h1 ON h1.src = h2.src AND h1.dst = h2.dst
         |  WHERE h1.src IS NULL),
         |d1 AS (SELECT src, COUNT(*) AS n_hop1 FROM hop1 GROUP BY src),
         |d2 AS (SELECT src, COUNT(*) AS n_hop2_new FROM new2 GROUP BY src)
         |SELECT d1.src, d1.n_hop1,
         |  COALESCE(d2.n_hop2_new, 0) AS n_hop2_new,
         |  CAST(COALESCE(d2.n_hop2_new, 0) AS DOUBLE) / CAST(d1.n_hop1 AS DOUBLE) AS expansion
         |FROM d1 LEFT JOIN d2 ON d2.src = d1.src
         |ORDER BY d1.src""".stripMargin,

    "e4_cosine_neardup" ->
      s"""WITH $lshPairsSql
         |SELECT a_id, b_id, cos FROM pairs ORDER BY a_id, b_id""".stripMargin,

    "e6_neardup_apply" ->
      s"""WITH $lshPairsSql
         |SELECT vec_id, label FROM embeddings
         |WHERE vec_id NOT IN (SELECT b_id FROM pairs WHERE cos >= 0.35)
         |ORDER BY vec_id""".stripMargin,

    // same cell/probe chain as e3; per-dim min/max stats, SQ8 codes and
    // the midpoint-reconstruction scores all SQL-derived, d-ascending
    "e15_ivf_sq8" ->
      s"""WITH $sq8ScoredCtes
         |SELECT q_id, rank, cand_id, sq_ip FROM (
         |  SELECT q_id, cand_id, sq_ip,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sq_ip DESC, cand_id) AS rank
         |  FROM scored) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // the SQ8 chain ranks a top-30 candidate set; the exact cosine
    // (the e1/e3 fold) re-ranks those rows to the final top-10
    "e17_ann_rerank" ->
      s"""WITH $sq8ScoredCtes,
         |c30 AS (SELECT q_id, cand_id FROM (
         |  SELECT q_id, cand_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY sq_ip DESC, cand_id) AS rank
         |  FROM scored) t WHERE rank <= 30),
         |re AS (
         |  SELECT c30.q_id, c30.cand_id,
         |    list_aggregate(list_transform(list_zip(qv.embedding, cv.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("qv.embedding")}) * sqrt(${sumSq("cv.embedding")})) AS cos
         |  FROM c30
         |  JOIN embeddings qv ON qv.vec_id = c30.q_id
         |  JOIN embeddings cv ON cv.vec_id = c30.cand_id)
         |SELECT q_id, rank, cand_id, cos FROM (
         |  SELECT q_id, cand_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, cand_id) AS rank
         |  FROM re) t
         |WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin,

    // both retrieval branches replay as CTEs (the d29 oracle verbatim,
    // the e1 cosine fold restricted to query 0); CAST(1.0 AS DOUBLE)
    // per the d29 decimal-literal rule
    "e16_hybrid_rrf" -> {
      val cosSql =
        s"""list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
           |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
           |      / (sqrt(${sumSq("a.embedding")}) * sqrt(${sumSq("b.embedding")}))""".stripMargin
      s"""WITH bm AS (
         |  SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank_lex
         |  FROM (${DocQueries.oracles("d29_bm25")}) lx),
         |vec AS (
         |  SELECT cand_id AS doc_id,
         |    ROW_NUMBER() OVER (ORDER BY cos DESC, cand_id) AS rank_vec
         |  FROM (
         |    SELECT b.vec_id AS cand_id, $cosSql AS cos
         |    FROM embeddings a, embeddings b
         |    WHERE a.vec_id = 0 AND b.vec_id <> 0
         |    ORDER BY cos DESC, cand_id LIMIT 10) vx),
         |fused AS (
         |  SELECT COALESCE(bm.doc_id, vec.doc_id) AS doc_id, rank_lex, rank_vec,
         |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_lex), CAST(0.0 AS DOUBLE)) +
         |    COALESCE(CAST(1.0 AS DOUBLE) / (60 + rank_vec), CAST(0.0 AS DOUBLE)) AS rrf
         |  FROM bm FULL OUTER JOIN vec ON bm.doc_id = vec.doc_id)
         |SELECT doc_id, rank_lex, rank_vec, rrf FROM fused
         |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin
    },

    // transitive closure over the e4 pairs via a recursive CTE;
    // cluster id = min reachable vec_id (the d20 oracle shape)
    "e14_semantic_clusters" ->
      s"""WITH RECURSIVE $lshPairsSql,
         |e AS (SELECT a_id AS s, b_id AS t FROM pairs
         |      UNION SELECT b_id, a_id FROM pairs),
         |reach AS (SELECT s, t FROM e
         |  UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s)
         |SELECT s AS vec_id, least(s, MIN(t)) AS cluster
         |FROM reach GROUP BY s ORDER BY vec_id""".stripMargin,

    // the e14 closure + the lloydRefine exact fixed-point mean
    // (floor-to-µ-units long sums — the same left-associative
    // double divisions as Spark) + the shared cosine fold; keep =
    // ROW_NUMBER argmin (cos asc, vec_id asc) per cluster
    "e26_semdedup_keep" ->
      s"""WITH RECURSIVE $lshPairsSql,
         |e AS (SELECT a_id AS s, b_id AS t FROM pairs WHERE cos >= 0.4
         |      UNION SELECT b_id, a_id FROM pairs WHERE cos >= 0.4),
         |reach AS (SELECT s, t FROM e
         |  UNION SELECT r.s, e.t FROM reach r JOIN e ON r.t = e.s),
         |clu AS (SELECT s AS vec_id, least(s, MIN(t)) AS cluster
         |  FROM reach GROUP BY s),
         |mem AS (SELECT c.cluster, emb.vec_id, emb.embedding
         |  FROM clu c JOIN embeddings emb ON emb.vec_id = c.vec_id),
         |dims AS (SELECT cluster, u.i AS i,
         |    CAST(SUM(CAST(FLOOR(CAST(m.embedding[u.i] AS DOUBLE) * 1000000) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS m
         |  FROM mem m, generate_series(1, 64) u(i) GROUP BY cluster, u.i),
         |cents AS (SELECT cluster, list(m ORDER BY i) AS ctr FROM dims GROUP BY cluster),
         |scored AS (SELECT m.cluster, m.vec_id,
         |    ${cosSql("m.embedding", "c.ctr")} AS cos_centroid
         |  FROM mem m JOIN cents c ON c.cluster = m.cluster),
         |r AS (SELECT cluster, vec_id, cos_centroid,
         |    ROW_NUMBER() OVER (PARTITION BY cluster ORDER BY cos_centroid ASC, vec_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY cluster) AS n_members
         |  FROM scored)
         |SELECT cluster, vec_id AS kept_vec, cos_centroid AS kept_cos, n_members
         |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin,

    // PQ/ADC mirror: same deterministic codebooks (first 16 vectors,
    // 8 subspaces x 8 dims), same d-ascending double folds, so codes
    // and ADC scores match Spark's bit-for-bit
    "e7_pq_adc" -> pqAdcOracle,

    // the persisted index is the same deterministic derivation (first
    // 16 vectors as codebooks, identical encode), so the indexed query
    // proves against the SAME oracle
    "e29_pq_indexed" -> pqAdcOracle,

    "e18_cell_diversity_sample" ->
      s"""WITH $semCellCtes
         |SELECT vec_id, cell, CAST(rank AS INTEGER) AS rank FROM (
         |  SELECT vec_id, cell,
         |    ROW_NUMBER() OVER (PARTITION BY cell
         |      ORDER BY ((vec_id % 2147483647) * 2654435761) % 2147483647, vec_id) AS rank
         |  FROM cell) t
         |WHERE rank <= 8 ORDER BY cell, rank""".stripMargin,

    // the two-level hierarchical rule, stated in SQL: supers = first
    // 16 (= ceil(sqrt(256)) next power of two) of the 256 bootstrap
    // centroids; every centroid and every vector joins its argmax-
    // cosine super (ties to the lowest sid); cell = argmax centroid
    // WITHIN the vector's branch (ties to the lowest cid) — exactly
    // Similarity.semCellsTwoLevel's three stages
    "e19_two_level_cells" -> twoLevelCellsSql,

    // the router kernel implements the identical rule, so it proves
    // against the SAME oracle text — any drift between the expression
    // and the DataFrame derivation fails one of the two rows
    "e38_route_two_level" -> twoLevelCellsSql,

    // the e3 cell chain + the e5 fixed-point mean derivation, reported
    // per cell instead of refined: occupancy + 1 − cos(mean, centroid)
    "e20_centroid_drift" ->
      s"""WITH cents0 AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 16),
         |cs0 AS (SELECT e.vec_id, e.embedding, cc.cid, ${cosSql("e.embedding", "cc.ce")} AS cs
         |  FROM embeddings e CROSS JOIN cents0 cc),
         |cell0 AS (SELECT vec_id, embedding, cid AS cell FROM (
         |  SELECT vec_id, embedding, cid,
         |    ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
         |  FROM cs0) t WHERE rn = 1),
         |means AS (
         |  SELECT cell, g.pos, COUNT(*) AS n,
         |    CAST(SUM(CAST(floor(CAST(embedding[g.pos] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
         |      / 1000000.0 / CAST(COUNT(*) AS DOUBLE) AS m
         |  FROM cell0 CROSS JOIN range(1, 65) g(pos)
         |  GROUP BY cell, g.pos),
         |cm AS (SELECT cell, CAST(MAX(n) AS BIGINT) AS n_assigned,
         |    list(m ORDER BY pos) AS mv FROM means GROUP BY cell),
         |tot AS (SELECT COUNT(*) AS t FROM embeddings)
         |SELECT cc.cid + 1 AS cell,
         |  COALESCE(cm.n_assigned, 0) AS n_assigned,
         |  CAST(COALESCE(cm.n_assigned, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE) AS share,
         |  CASE WHEN cm.cell IS NULL THEN 0.0
         |       ELSE 1.0 - ${cosSql("cm.mv", "cc.ce")} END AS drift
         |FROM cents0 cc LEFT JOIN cm ON cm.cell = cc.cid CROSS JOIN tot
         |ORDER BY cell""".stripMargin
  )

  /** The two-level hierarchical rule, stated once in SQL: supers =
    * first 16 (= ceil(sqrt(256)) next power of two) of the 256
    * bootstrap centroids; every centroid and every vector joins its
    * argmax-cosine super (ties to the lowest sid); cell = argmax
    * centroid WITHIN the vector's branch (ties to the lowest cid) —
    * exactly Similarity.semCellsTwoLevel's three stages AND
    * plans.CellRoute's in-expression branch (e19/e38 share this
    * text). */
  private def twoLevelCellsSql: String =
      s"""WITH cents AS (SELECT vec_id AS cid, embedding AS ce
         |    FROM embeddings WHERE vec_id < 256),
         |sup AS (SELECT cid AS sid, ce AS sv FROM cents WHERE cid < 16),
         |cbr AS (SELECT cid, ce, sid AS branch FROM (
         |  SELECT cc.cid, cc.ce, sp.sid,
         |    ROW_NUMBER() OVER (PARTITION BY cc.cid
         |      ORDER BY ${cosSql("cc.ce", "sp.sv")} DESC, sp.sid) AS rn
         |  FROM cents cc CROSS JOIN sup sp) t WHERE rn = 1),
         |vbr AS (SELECT vec_id, embedding, sid AS branch FROM (
         |  SELECT e.vec_id, e.embedding, sp.sid,
         |    ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |      ORDER BY ${cosSql("e.embedding", "sp.sv")} DESC, sp.sid) AS rn
         |  FROM embeddings e CROSS JOIN sup sp) t WHERE rn = 1)
         |SELECT vec_id, cell FROM (
         |  SELECT v.vec_id, c.cid AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY v.vec_id
         |      ORDER BY ${cosSql("v.embedding", "c.ce")} DESC, c.cid) AS rn
         |  FROM vbr v JOIN cbr c ON v.branch = c.branch) t
         |WHERE rn = 1 ORDER BY vec_id""".stripMargin

  /** Shared CTE chain producing the LSH-blocked near-dup `pairs`
    * (mirrors Similarity.lshNearDupPairs with the e2 plane constants). */
  private def lshPairsSql: String = {
    val tbls = (0 until 8).map(t => s"($t)").mkString(", ")
    s"""$lshMaskSql,
       |base AS (SELECT vec_id, embedding, ${lshBucketsSql("embedding", 8, 16)} AS bks FROM embeddings),
       |b AS (SELECT vec_id, embedding, t.tbl AS tbl, bks[t.tbl + 1] & pp.msk AS bucket
       |      FROM base CROSS JOIN (VALUES $tbls) t(tbl) CROSS JOIN pp),
       |cand AS (SELECT DISTINCT x.vec_id AS a_id, y.vec_id AS b_id,
       |    x.embedding AS ae, y.embedding AS be
       |  FROM b x JOIN b y ON x.tbl = y.tbl AND x.bucket = y.bucket
       |    AND x.vec_id < y.vec_id),
       |pairs AS (SELECT a_id, b_id, cos FROM (
       |  SELECT a_id, b_id,
       |    list_aggregate(list_transform(list_zip(ae, be),
       |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
       |      / (sqrt(${sumSq("ae")}) * sqrt(${sumSq("be")})) AS cos
       |  FROM cand) t
       |WHERE cos >= 0.2)""".stripMargin
  }
}
