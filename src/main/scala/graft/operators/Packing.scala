package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing (concat-and-chunk): documents laid head-to-tail
  * into fixed `seqLen`-token training sequences — the step between
  * curation and the trainer.
  *
  * The global order is the portable multiplicative hash (a
  * deterministic, engine-reproducible epoch shuffle), SHARDED so the
  * running token offset is a window sum PARTITIONED BY shard: shards
  * pack independently, one hash exchange total, `nShards`-way parallel
  * at any corpus size (an un-partitioned running sum would serialize
  * the corpus through one task). Chunk math is all-integer (`div`/`%`)
  * — bit-reproducible across engines and replays, which is what lets
  * the streaming twin feed the idempotent exactly-once sink.
  */
object Packing {

  /** Pack `docs` (needs `doc_id` long + `text` string) into
    * `seqLen`-token sequences over `nShards` independent shards.
    * Output per doc: shard, token count, running token offset within
    * the shard, the sequence it starts in, its offset inside that
    * sequence, and how many sequences it straddles. Deterministic in
    * the input CONTENT alone. */
  def sequencePack(docs: DataFrame, seqLen: Long = 512L,
                   nShards: Long = 8L): DataFrame = {
    require(seqLen > 0 && nShards > 0,
      s"seqLen and nShards must be positive, got $seqLen/$nShards")
    val w = Window.partitionBy("shard").orderBy("h", "doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col("doc_id"), graft.functions.Text.tokenCount(col("text")).as("n_tokens"),
        graft.functions.Text.portableHash(col("doc_id")).as("h"))
      .select(col("doc_id"), col("n_tokens"), col("h"),
        pmod(col("h"), lit(nShards)).as("shard"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        coalesce(sum(col("n_tokens")).over(w), lit(0L)).as("tok_offset"))
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("tok_offset"),
        expr(s"tok_offset div $seqLen").as("seq_id"),
        pmod(col("tok_offset"), lit(seqLen)).as("seq_off"),
        (expr(s"(tok_offset + n_tokens - 1) div $seqLen") -
          expr(s"tok_offset div $seqLen") + lit(1L)).as("n_seqs"))
  }
}
