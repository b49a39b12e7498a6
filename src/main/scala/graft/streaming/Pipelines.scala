package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.{FieldSpec, SchemaConverter}

/** Structured Streaming re-expression of the reference's streaming
  * pipelines (SURVEY §2d). The reference's RAW stage is a KSQL stream
  * over a Kafka topic (`/root/reference/src/controllers/index.js:573-583`);
  * here any streaming DataFrame with the same shape (`RECID` string +
  * `XMLRECORD map<string,string>`) plugs in — the environment has no
  * broker, so file/memory sources stand in, and a Kafka source would be
  * `spark.readStream.format("kafka")…` mapped to this schema at the
  * seam below. Every stage is stateless-narrow except the windowed
  * aggregations, which carry watermarked state.
  */
object Pipelines {

  /** RAW→MAPPED→(MULTIVALUE) as one streaming transform. The
    * SchemaConverter stages are projections + Generate — fully
    * streaming-safe, no state. */
  def t24Pipeline(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame =
    SchemaConverter.pipeline(raw, schema)

  /** File-based RAW source (the Kafka seam: swap for format("kafka") +
    * a value-deserialization select with the same output schema). */
  def fileSource(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Watermarked tumbling-window aggregate over an event stream. */
  def windowedCounts(events: DataFrame, tsCol: String, keyCol: String,
                     windowLen: String = "5 minutes",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowLen), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))

  /** Streaming exact dedup on key columns, state bounded by the
    * watermark (late duplicates beyond the delay age out of state). */
  def statefulDedup(df: DataFrame, tsCol: String, keyCols: Seq[String],
                    watermarkDelay: String = "10 minutes"): DataFrame =
    df.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(keyCols :+ tsCol)

  /** SINK stage: continuous parquet append with checkpointing — the
    * analog of the reference's SINK/DDL statement pair (target schema =
    * the DataFrame schema). */
  def parquetSink(df: DataFrame, path: String, checkpoint: String,
                  trigger: Trigger = Trigger.AvailableNow()): DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream.format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
}
