package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider}
import org.apache.spark.sql.streaming.OutputMode

/** The CDC apply as a REGISTERED STREAMING SINK (`mergetable-apply`),
  * so table-to-table replication is a two-format one-liner:
  *
  * {{{
  *   MergeTable.changeStream(spark, src, "id", startingVersion = 0)
  *     .filter($"_change_type" =!= "update_preimage")
  *     .withColumn("op", when($"_change_type" === "delete", "D").otherwise("U"))
  *     .drop("_change_type")
  *     .writeStream.format("mergetable-apply")
  *     .option("path", dst).option("key", "id").option("ts", "_commit_version")
  *     .option("checkpointLocation", ckpt).start()
  * }}}
  *
  * Each micro-batch lands through the same epoch apply `foreachBatch`
  * consumers use (`Pipelines.mergeApplySink`): latest-per-key collapse,
  * delete markers via the op column, ONE `applyBatch` manifest commit.
  * Exactly-once is idempotence-in-state — a replayed epoch re-applies
  * the same collapsed rows to identical content (the StreamingSpec
  * crash-recovery contract), which is why the sink needs no batchId
  * ledger. Options: `path` (the target table), `key`, `ts` (per-key
  * ordering column), `op` (default "op"), `deleteOp` (default "D").
  */
class MergeTableApplySinkProvider extends StreamSinkProvider
    with DataSourceRegister {

  override def shortName(): String = "mergetable-apply"

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    def need(k: String) = parameters.getOrElse(k,
      throw new IllegalArgumentException(s"mergetable-apply needs a '$k' option"))
    val path = need("path")
    val key = need("key")
    val ts = need("ts")
    val op = parameters.getOrElse("op", "op")
    val deleteOp = parameters.getOrElse("deleteOp", "D")
    new Sink {
      private val apply =
        graft.streaming.Pipelines.mergeApplySink(path, key, ts, op, deleteOp)
      override def addBatch(batchId: Long,
                            data: org.apache.spark.sql.Dataset[Row]): Unit = {
        // the engine hands an incrementally-planned Dataset; wrap its
        // already-planned physical RDD as a batch frame (StreamShim —
        // re-analyzing via .rdd is rejected) so the apply's persist +
        // multiple actions are safe
        val batch = org.apache.spark.sql.graft.StreamShim.asBatch(data.toDF())
        apply(batch, batchId)
      }
      override def toString: String = s"MergeTableApplySink[$path]"
    }
  }
}
