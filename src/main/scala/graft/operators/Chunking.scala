package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.{Native, Text}

/** Content-defined chunking (LBFS — Muthitacharoen et al. SOSP'01 /
  * FastCDC — Xia et al. ATC'16 — at token granularity): a chunk
  * boundary falls AFTER any token whose hash ≡ 0 mod `boundaryMod`
  * (gear-hash single-token rule, expected chunk ≈ boundaryMod
  * tokens). Boundaries depend on CONTENT, not position, so an
  * insertion re-aligns every later chunk — the insertion-robust
  * passage-dedup coordinate system (fixed windows shift globally
  * under one inserted word).
  *
  * The kernel is ONE pure per-row column expression — token hashes,
  * boundary positions, segment slicing and the order-sensitive
  * signature fold all happen inside the row, so chunking itself
  * shuffles NOTHING (no explode-then-window, no doc exchange) and
  * the same expression serves the batch report (d82) and the
  * streaming ingest screen (stateless, zero-shuffle) — one kernel,
  * the twins cannot drift. Only chunk signatures ever reach an
  * exchange, and only in the consumers.
  */
object Chunking {

  private val HashMod = 1000003L
  private val SigMod = 1000000000000000L

  /** Per-document chunk list as `array<struct<n_toks:bigint,
    * sig:bigint>>` in document order: `sig` is the order-sensitive
    * polynomial fold over the chunk's token hashes (with the chunk
    * length, the dedup identity — the fpSql convention), `n_toks`
    * the chunk's token count. Empty/whitespace text yields an empty
    * array.
    *
    * EVALUATION DISCIPLINE (measured, not theoretical): a free array
    * subexpression inside a higher-order-function lambda re-evaluates
    * on EVERY lambda invocation — naive `filter(sequence(1, n),
    * i => element_at(ths, i) …)` recomputes the whole token-hash
    * transform per position, turning the kernel O(n²) (pre-fix: the
    * d82 report measured 140 s at sf0.1 vs 1 s). Every derived array
    * (`ths`, `ends`) is therefore BOUND as a lambda variable via the
    * single-element-array trick (`element_at(transform(array(x),
    * v => …), 1)`): lambda-variable access is a slot read, so the
    * expensive arrays compute once per row and the kernel is O(n). */
  def chunkSigs(text: Column, boundaryMod: Int = 16): Column = {
    val ths = transform(Text.tokens(lower(text)),
      t => Native.polyHash(t, HashMod))
    val segs = element_at(transform(array(ths), a => {
      val n = size(a)
      // boundary positions (1-based); the final partial chunk closes at n
      val bounds = filter(sequence(lit(1), n),
        i => element_at(a, i) % boundaryMod === 0)
      val lastB = when(size(bounds) > 0, element_at(bounds, size(bounds)))
        .otherwise(lit(0))
      val ends = when(lastB === n, bounds).otherwise(concat(bounds, array(n)))
      element_at(transform(array(ends), e => {
        val starts = transform(sequence(lit(1), size(e)),
          j => when(j === 1, lit(1)).otherwise(element_at(e, j - 1) + 1))
        zip_with(starts, e, (s, en) => struct(
          (en - s + 1).cast("long").as("n_toks"),
          aggregate(slice(a, s, en - s + 1), lit(0L),
            (x, b) => (x * 31L + b) % SigMod).as("sig")))
      }), 1)
    }), 1)
    // split("") yields [""], not [] — and trim(NULL) === "" is NULL,
    // which would fall through to the kernel and fabricate one
    // garbage chunk (size(null) = -1). Coalesce so NULL, empty and
    // whitespace docs all chunk to NOTHING.
    when(coalesce(trim(text), lit("")) === "",
      array().cast("array<struct<n_toks:bigint,sig:bigint>>"))
      .otherwise(segs)
  }
}
