package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, Row}

/** The one `private[sql]` doorway a V1 streaming Source needs: the
  * engine asserts that `getBatch` returns a DataFrame with
  * `isStreaming=true`, and the only way to stamp that bit onto a
  * normally-planned batch DataFrame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)` —
  * which is `private[sql]`, hence this package-located shim (the
  * standard extension-point idiom for Spark connectors that reuse the
  * batch planner inside a source; the RDD is taken LAZILY from the
  * batch plan, so nothing executes until the micro-batch runs). */
object StreamShim {
  def asStreaming(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
  }

  /** The mirror image for a V1 Sink: `addBatch` receives an
    * INCREMENTALLY-planned Dataset whose logical plan still names
    * streaming sources — re-analyzing it as a batch query (e.g. via
    * `.rdd`) is rejected by the analyzer. Wrap the already-planned
    * physical RDD as a plain batch frame instead (what the built-in
    * V1 sinks do), so the sink body may persist and run multiple
    * actions freely. */
  def asBatch(df: DataFrame): DataFrame = {
    val cdf = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[Row]]
    cdf.sparkSession.internalCreateDataFrame(
      cdf.queryExecution.toRdd, cdf.schema, isStreaming = false)
  }
}
