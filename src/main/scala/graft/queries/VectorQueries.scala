package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine.q
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

    // rows-only (recall vs brute force is asserted in SimilaritySpec)
    "e2_ann_lsh" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.lshTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // rows-only (recall vs brute force is asserted in SimilaritySpec)
    "e3_ann_ivf" -> q { (s, d) =>
      val emb = table(s, d, "embeddings")
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 5), k = 10)
        .select("q_id", "rank", "cand_id", "cos")
        .orderBy("q_id", "rank")
    },

    // embedding-cosine near-dup pairs; candidates blocked on `label`
    // here (at corpus scale the block key would be an LSH bucket — same
    // join shape, see Similarity.lshTopK)
    "e4_cosine_neardup" -> q { (s, d) =>
      val e = table(s, d, "embeddings")
        .select(col("vec_id"), col("label"), col("embedding"))
      e.as("a").join(e.as("b"),
          col("a.label") === col("b.label") && col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
          graft.functions.Vectors.cosine(col("a.embedding"), col("b.embedding")).as("cos"))
        .filter(col("cos") >= 0.2)
        .orderBy("a_id", "b_id")
    }
  )

  private def sumSq(l: String) =
    s"list_aggregate(list_transform($l, x -> CAST(x AS DOUBLE)*CAST(x AS DOUBLE)), 'sum')"

  val oracles: Map[String, String] = Map(
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

    "e4_cosine_neardup" ->
      s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings)
         |SELECT a_id, b_id, cos FROM (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    list_aggregate(list_transform(list_zip(a.embedding, b.embedding),
         |        s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), 'sum')
         |      / (sqrt(${sumSq("a.embedding")}) * sqrt(${sumSq("b.embedding")})) AS cos
         |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id) t
         |WHERE cos >= 0.2 ORDER BY a_id, b_id""".stripMargin
  )
}
