package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.Text

/** BM25 inverted index as TABLES — the e11/d34/d47 "index is data"
  * lifecycle applied to text retrieval. The d29 query re-aggregates
  * term statistics from the raw corpus on every call; at 100 TB you
  * build the inverted index ONCE per corpus generation and every query
  * touches only the slice of postings its terms name:
  *
  *   postings/  (term, doc_id, dl, tf) — one row per (term, document)
  *   df/        (term, df)             — one row per vocabulary term
  *   stats/     (n_docs, sum_dl)       — exactly one row
  *
  * Query-time cost is a postings scan with the term predicate PUSHED
  * DOWN to parquet (the corpus text is never read), one broadcast join
  * against the terms' df rows, and the same sorted-fold scoring tail
  * as d29 — so the indexed score is bit-identical to the from-scratch
  * query (spec-pinned row-for-row).
  */
object Bm25 {

  def writeIndex(docs: DataFrame, path: String): Unit = {
    val toks = docs.select(col("doc_id"),
      Text.tokens(lower(col("text"))).as("ts"))
    val postings = toks
      .select(col("doc_id"), size(col("ts")).as("dl"),
        explode(col("ts")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
    postings.write.mode("overwrite").parquet(s"$path/postings")
    // df derives from the postings themselves: one row per (term, doc)
    postings.groupBy("term").agg(count(lit(1)).as("df"))
      .write.mode("overwrite").parquet(s"$path/df")
    toks.agg(count(lit(1)).as("n_docs"), sum(size(col("ts"))).as("sum_dl"))
      .write.mode("overwrite").parquet(s"$path/stats")
  }

  /** Memoized build behind the postings `_SUCCESS` marker (the shared
    * Materialize.ensure contract d47/e26 ride). */
  def ensureIndex(docs: DataFrame, path: String): Unit = {
    graft.sources.Materialize.ensure(docs.sparkSession, s"$path/postings") {
      writeIndex(docs, path)
    }
    ()
  }

  /** BM25 top-k from the persisted index — same Robertson weights and
    * term-ascending left-fold score as the from-scratch d29 chain
    * (plain SUM(double) adds in shuffle-arrival order; the fold makes
    * the doubles bit-portable). */
  def scoreFromIndex(spark: SparkSession, path: String,
                     terms: Seq[String], k: Int = 10): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val p = spark.read.parquet(s"$path/postings")
      .filter(col("term").isin(terms: _*))
    val df = spark.read.parquet(s"$path/df")
      .filter(col("term").isin(terms: _*))
    val stats = spark.read.parquet(s"$path/stats")
    p.join(broadcast(df), "term")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), col("term"),
        ((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) *
          (col("tf") * lit(2.2)) /
          (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") /
            (col("sum_dl").cast(DoubleType) / col("n_docs"))))).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"),
        array_sort(collect_list(struct(col("term"), col("w")))).as("tw"))
      .select(col("doc_id"), col("n_terms"),
        aggregate(col("tw"), lit(0.0),
          (acc, x) => acc + x.getField("w")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
}
