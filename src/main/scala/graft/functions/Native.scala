package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}

import graft.plans.{CosineSim, LshBuckets, MinHashSketch, SimHash64, WordShingles}

/** Column API over the engine's native Catalyst expressions. */
object Native {
  def simhash64(tokens: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(tokens)))

  def wordShingles(tokens: Column, k: Int): Column =
    GraftBridge.column(WordShingles(GraftBridge.expression(tokens), k))

  def cosineSim(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(GraftBridge.expression(a), GraftBridge.expression(b)))

  def lshBuckets(v: Column, planes: Array[Array[Double]], planesPerTable: Int): Column =
    GraftBridge.column(LshBuckets(GraftBridge.expression(v),
      planes.map(_.toSeq).toSeq, planesPerTable))

  def polyHash(s: Column, modulus: Long): Column =
    GraftBridge.column(graft.plans.PolyHash(GraftBridge.expression(s), modulus))

  /** One-pass Gopher quality signals (d36): struct(n_words, sum_wlen,
    * n_sym, n_alpha, n_req_stop) from the raw text. */
  def gopherStats(text: Column): Column =
    GraftBridge.column(graft.plans.GopherStats(GraftBridge.expression(text)))

  /** PQ codes of an embedding (codebook flat layout (s*ks+j)*subDim+d). */
  def pqEncode(v: Column, codebook: Array[Double], m: Int, ks: Int, subDim: Int): Column =
    GraftBridge.column(graft.plans.PqEncode(
      GraftBridge.expression(v), codebook.toSeq, m, ks, subDim))

  /** Per-query PQ lookup table of exact subvector distances. */
  def pqLut(v: Column, codebook: Array[Double], m: Int, ks: Int, subDim: Int): Column =
    GraftBridge.column(graft.plans.PqLut(
      GraftBridge.expression(v), codebook.toSeq, m, ks, subDim))

  /** ADC score: sum of code-selected LUT cells. */
  def pqAdc(lut: Column, code: Column, ks: Int): Column =
    GraftBridge.column(graft.plans.PqAdc(
      GraftBridge.expression(lut), GraftBridge.expression(code), ks))

  /** SQ8 codes under global per-dimension min/max quantization. */
  def sq8Encode(v: Column, mns: Array[Double], mxs: Array[Double]): Column =
    GraftBridge.column(graft.plans.Sq8Encode(
      GraftBridge.expression(v), mns.toSeq, mxs.toSeq))

  /** Query · midpoint-reconstruction inner product over SQ8 codes. */
  def sq8Score(q: Column, code: Column, mns: Array[Double], scales: Array[Double]): Column =
    GraftBridge.column(graft.plans.Sq8Score(
      GraftBridge.expression(q), GraftBridge.expression(code), mns.toSeq, scales.toSeq))

  /** Cell routing against a reference-object centroid table (flat or
    * two-level) — constant codegen size at any nlist. */
  def cellRoute(v: Column, superVs: Seq[Seq[Double]], branchCids: Seq[Seq[Long]],
                branchVs: Seq[Seq[Seq[Double]]]): Column =
    GraftBridge.column(graft.plans.CellRoute(
      GraftBridge.expression(v), superVs, branchCids, branchVs))

  /** One-pass winnowing fingerprints of a token array. */
  def winnowFingerprints(tokens: Column, k: Int, w: Int, modulus: Long): Column =
    GraftBridge.column(graft.plans.WinnowFingerprints(
      GraftBridge.expression(tokens), k, w, modulus))

  def simhashPortable(tokens: Column, permsA: Array[Long], permsB: Array[Long],
                      modulus: Long): Column =
    GraftBridge.column(graft.plans.SimHashPortable(
      GraftBridge.expression(tokens), permsA.toSeq, permsB.toSeq, modulus))

  /** MinHash signature aggregate over a pre-reduced Long hash column. */
  def minhashSketch(h: Column, permsA: Array[Long], permsB: Array[Long],
                    prime: Long): Column =
    GraftBridge.column(
      MinHashSketch(GraftBridge.expression(h), permsA.toSeq, permsB.toSeq, prime)
        .toAggregateExpression())
}
