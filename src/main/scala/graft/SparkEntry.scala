package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2/§7. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_agg")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++ T24Queries.queries ++
      DocQueries.queries ++ VectorQueries.queries

  /** DuckDB-runnable oracle SQL per query (same parquet tables, same
    * aliases, deterministic ORDER BY). */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ T24Queries.oracles ++
      DocQueries.oracles ++ VectorQueries.oracles
}
