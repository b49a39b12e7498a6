package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level runtime configuration applied idempotently at the head
  * of every engine entry point. The driver owns SparkSession creation
  * (Verify/Bench), so anything the engine needs beyond defaults is set
  * here at runtime rather than at builder time.
  */
object Engine {
  def configure(spark: SparkSession): SparkSession = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark refuses
    // by default; read as Long (ns since epoch) and convert explicitly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    registerFunctions(spark)
    spark
  }

  /** Expose native expressions to the SQL surface (the reference's
    * users write SQL against `/api/execute`; `spark.sql` is the analog). */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    def ensure(name: String)(builder: Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression): Unit =
      if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
    ensure("simhash64")(exprs => graft.plans.SimHash64(exprs.head))
    ensure("cosine_sim")(exprs => graft.plans.CosineSim(exprs(0), exprs(1)))
    ensure("try_parse_timestamp") { exprs =>
      val fmt = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString
        case other => sys.error(s"try_parse_timestamp(s, fmt): fmt must be a literal, got $other")
      }
      graft.plans.TryParseTimestamp(exprs.head, fmt)
    }
    ensure("word_shingles") { exprs =>
      val k = exprs(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _) => v.toString.toInt
        case other => sys.error(s"word_shingles(arr, k): k must be a literal, got $other")
      }
      graft.plans.WordShingles(exprs.head, k)
    }
  }

  /** Wrap a query builder so Engine configuration always precedes it. */
  def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => f(configure(s), d)
}
