package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector primitives over `array<float>` columns.
  *
  * All arithmetic is widened to double and folded sequentially
  * (`aggregate` evaluates left-to-right), which matches DuckDB's
  * `list_aggregate('sum')` fold exactly — the cosine oracle is
  * bit-exact, not approximately equal. Codegen-friendly: no UDFs.
  */
object Vectors {

  /** Sequential-fold sum of an array<double>. */
  private def fsum(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  def dot(a: Column, b: Column): Column =
    fsum(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")))

  def norm2(a: Column): Column =
    sqrt(fsum(transform(a, x => x.cast("double") * x.cast("double"))))

  /** Cosine similarity — native expression (same sequential double fold
    * as the composed form below; bit-identical, no lambda overhead). */
  def cosine(a: Column, b: Column): Column = Native.cosineSim(a, b)

  /** Composed-builtins cosine, kept to equivalence-test the native path. */
  private[graft] def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm2(a) * norm2(b))

  /** Sign-bit LSH bucket for a vector: one bit per pseudo-random
    * hyperplane. Planes are deterministic (seeded) and tiny — they live
    * as literal arrays inside the expression, broadcast with the plan,
    * so bucketing is a narrow map over the scan at any scale. */
  def lshBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val proj = fsum(zip_with(v, array(p.map(lit): _*),
        (x, w) => x.cast("double") * w))
      when(proj >= 0, lit(1L) * lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic pseudo-random hyperplanes (unit-free, sign-LSH only
    * needs direction). */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }
}
