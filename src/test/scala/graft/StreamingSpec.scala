package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FieldSpec
import graft.streaming.{FunnelEvent, LineItem, Pipelines, TimedLineItem}

class StreamingSpec extends AnyFunSuite {
  import SparkTest._

  test("t24 pipeline runs RAW→MAPPED over a stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Map[String, String])]
    val raw = in.toDF().toDF("RECID", "XMLRECORD")
    val schema = Seq(
      FieldSpec("NAME"),
      FieldSpec("D", dataType = "date", transformation = "parse_date"),
      FieldSpec("MV", transformation = "string-join('|')"))
    val q = Pipelines.t24Pipeline(raw, schema)
      .writeStream.format("memory").queryName("t24_out")
      .outputMode("append").start()
    in.addData(
      ("1", Map("NAME" -> "A", "D" -> "20240131", "MV" -> "1:x#2:y")),
      ("2", Map("NAME" -> "B", "D" -> "20230601", "MV" -> "1:z")))
    q.processAllAvailable()
    val out = spark.table("t24_out").orderBy("RECID").collect()
    q.stop()
    assert(out.map(_.getString(1)).toSeq == Seq("A", "B"))
    assert(out.map(_.getString(3)).toSeq == Seq("x|y", "z"))
  }

  test("t24 BLOB pipeline decodes packed FE/FD records over a stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def hexOf(s: String) = s.getBytes("UTF-8").map("%02X".format(_)).mkString
    val in = MemoryStream[(String, String)]
    val raw = in.toDF().toDF("RECID", "BLOB")
    val schema = Seq(
      FieldSpec("STATUS"),
      FieldSpec("DTS", dataType = "date", transformation = "parse_date",
        parseSv = false, parseVm = true))
    val q = Pipelines.t24BlobPipeline(raw, schema)
      .writeStream.format("memory").queryName("blob_out")
      .outputMode("append").start()
    in.addData(
      ("1", hexOf("OK") + "FE" + hexOf("20240131") + "FD" + hexOf("20240301")))
    q.processAllAvailable()
    val out = spark.table("blob_out").orderBy("MV_POS").collect()
    q.stop()
    assert(out.length == 2)
    assert(out.map(_.getString(1)).toSeq == Seq("OK", "OK"))
    assert(out.map(_.getDate(3).toString).toSeq == Seq("2024-01-31", "2024-03-01"))
  }

  test("watermarked tumbling window aggregates a stream") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val ev = in.toDF().toDF("ts", "event_type", "value")
    val q = Pipelines.windowedCounts(ev, "ts", "event_type", "5 minutes", "1 minute")
      .writeStream.format("memory").queryName("win_out")
      .outputMode("complete").start()
    in.addData(
      (Timestamp.valueOf("2024-01-01 00:01:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:02:00"), "click", 2.0),
      (Timestamp.valueOf("2024-01-01 00:07:00"), "view", 5.0))
    q.processAllAvailable()
    val out = spark.table("win_out").collect()
    q.stop()
    assert(out.length == 2)
    val click = out.find(_.getString(1) == "click").get
    assert(click.getLong(2) == 2L && click.getDouble(3) == 3.0)
  }

  test("stateful dedup drops duplicate keys within the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long, String)]
    val df = in.toDF().toDF("ts", "id", "payload")
    val q = Pipelines.statefulDedup(df, "ts", Seq("id"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    in.addData((t, 1L, "a"), (t, 1L, "a-dup"), (t, 2L, "b"))
    q.processAllAvailable()
    in.addData((t, 2L, "b-dup"), (t, 3L, "c"))
    q.processAllAvailable()
    val out = spark.table("dedup_out").collect()
    q.stop()
    assert(out.map(_.getLong(1)).sorted.toSeq == Seq(1L, 2L, 3L))
  }

  test("session windows close on gap and carry counts/totals") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[graft.streaming.SessionEvent]
    val q = Pipelines.sessionWindows(in.toDS(), gapMs = 60_000, watermarkDelay = "0 seconds")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    def ev(u: Long, t: String, v: Double) =
      graft.streaming.SessionEvent(u, Timestamp.valueOf(t), v)
    // session 1: two events 30s apart; then a 5-minute gap starts session 2
    in.addData(
      ev(1, "2024-01-01 00:00:00", 1.0), ev(1, "2024-01-01 00:00:30", 2.0),
      ev(1, "2024-01-01 00:05:30", 5.0),
      ev(2, "2024-01-01 00:00:00", 9.0))
    q.processAllAvailable()
    // advance the watermark far past every open session's end + gap
    in.addData(ev(3, "2024-01-01 01:00:00", 0.0))
    q.processAllAvailable()
    in.addData(ev(3, "2024-01-01 02:00:00", 0.0))
    q.processAllAvailable()
    val out = spark.table("sess_out").as[graft.streaming.SessionWindow].collect()
    q.stop()
    val u1 = out.filter(_.userId == 1L).sortBy(_.startTs.getTime)
    // in-batch gap closed session 1; the watermark closed session 2
    assert(u1.length == 2, s"expected both user-1 sessions closed, got ${out.toSeq}")
    assert(u1.head.nEvents == 2 && u1.head.total == 3.0)
    assert(u1.head.endTs == Timestamp.valueOf("2024-01-01 00:00:30"))
    assert(u1(1).nEvents == 1 && u1(1).total == 5.0)
    val u2 = out.filter(_.userId == 2L)
    assert(u2.length == 1 && u2.head.total == 9.0)
  }

  test("stream-stream join WITHIN pairs events inside the interval only") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = Pipelines.streamStreamJoinWithin(
      clicks.toDF().toDF("c_user", "c_ts"), buys.toDF().toDF("b_user", "b_ts"),
      "c_user", "b_user", "c_ts", "b_ts", within = "10 minutes",
      watermarkDelay = "1 minute")
    val q = joined.writeStream.format("memory").queryName("ssj_out")
      .outputMode("append").start()
    clicks.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00")))
    buys.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:05:00")),  // within 10 min -> match
      (2L, Timestamp.valueOf("2024-01-01 01:00:00")))  // outside -> no match
    q.processAllAvailable()
    val out = spark.table("ssj_out").collect()
    q.stop()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L), s"got ${out.toSeq}")
  }

  test("stream-stream LEFT OUTER join WITHIN null-pads unmatched lefts at watermark expiry") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = Pipelines.streamStreamJoinWithin(
      clicks.toDF().toDF("c_user", "c_ts"), buys.toDF().toDF("b_user", "b_ts"),
      "c_user", "b_user", "c_ts", "b_ts", within = "10 minutes",
      watermarkDelay = "1 minute", joinType = "left_outer")
    val q = joined.writeStream.format("memory").queryName("ssloj_out")
      .outputMode("append").start()
    clicks.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, Timestamp.valueOf("2024-01-01 00:00:00")))
    buys.addData(
      (1L, Timestamp.valueOf("2024-01-01 00:05:00")))  // match for 1; none for 2
    q.processAllAvailable()
    val early = spark.table("ssloj_out").collect()
    assert(early.map(_.getLong(0)).toSeq == Seq(1L),
      s"before the watermark clears user 2's band, only the inner match may emit: ${early.toSeq}")
    // advance BOTH watermarks far past 00:00 + within + delay so user 2's
    // band can never match again ...
    clicks.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
    buys.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
    q.processAllAvailable()
    // ... and run one more batch: Spark emits evicted null-padded rows in
    // the batch AFTER the watermark update (correctness over latency)
    clicks.addData((10L, Timestamp.valueOf("2024-01-01 02:00:30")))
    buys.addData((10L, Timestamp.valueOf("2024-01-01 02:00:30")))
    q.processAllAvailable()
    val out = spark.table("ssloj_out").collect()
    q.stop()
    val unmatched = out.filter(r => r.getLong(0) == 2L)
    assert(unmatched.length == 1, s"user 2 must emit exactly once: ${out.toSeq}")
    assert(unmatched.head.isNullAt(2) && unmatched.head.isNullAt(3),
      "the unmatched left row must carry a null-padded right side")
    assert(out.filter(r => r.getLong(0) == 9L)
      .forall(r => !r.isNullAt(2)), "in-band rows still inner-match")
  }

  test("stream-stream FULL OUTER join WITHIN also null-pads unmatched rights") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp)]
    val buys = MemoryStream[(Long, Timestamp)]
    val joined = Pipelines.streamStreamJoinWithin(
      clicks.toDF().toDF("c_user", "c_ts"), buys.toDF().toDF("b_user", "b_ts"),
      "c_user", "b_user", "c_ts", "b_ts", within = "10 minutes",
      watermarkDelay = "1 minute", joinType = "full_outer")
    val q = joined.writeStream.format("memory").queryName("ssfoj_out")
      .outputMode("append").start()
    clicks.addData((1L, Timestamp.valueOf("2024-01-01 00:00:00")))  // no buy
    buys.addData((2L, Timestamp.valueOf("2024-01-01 00:00:00")))    // no click
    q.processAllAvailable()
    clicks.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
    buys.addData((9L, Timestamp.valueOf("2024-01-01 02:00:00")))
    q.processAllAvailable()
    clicks.addData((10L, Timestamp.valueOf("2024-01-01 02:00:30")))
    buys.addData((10L, Timestamp.valueOf("2024-01-01 02:00:30")))
    q.processAllAvailable()
    val out = spark.table("ssfoj_out").collect()
    q.stop()
    val lonelyClick = out.filter(r => !r.isNullAt(0) && r.getLong(0) == 1L)
    val lonelyBuy = out.filter(r => !r.isNullAt(2) && r.getLong(2) == 2L)
    assert(lonelyClick.length == 1 && lonelyClick.head.isNullAt(2),
      s"the buy-less click must emit null-padded once: ${out.toSeq}")
    assert(lonelyBuy.length == 1 && lonelyBuy.head.isNullAt(0),
      s"the click-less buy must emit null-padded once: ${out.toSeq}")
  }

  test("sliding (hopping) window aggregates count events in overlapping windows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Double)]
    val agg = in.toDF().toDF("ts", "value")
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.format("memory").queryName("hop_out")
      .outputMode("complete").start()
    in.addData((Timestamp.valueOf("2024-01-01 00:07:00"), 1.0))
    q.processAllAvailable()
    val out = spark.table("hop_out").collect()
    q.stop()
    // one event at :07 falls in windows [:00,:10) and [:05,:15)
    assert(out.length == 2 && out.forall(_.getLong(1) == 1L))
  }

  test("stream near-dup screen flags arrivals matching the static corpus once") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (200L, "completely different content about catalyst optimizer rules and codegen"))
      .toDF("doc_id", "text")
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    // the static side is pre-banded + cached by the caller (the
    // contract: Spark re-runs the static plan every micro-batch)
    val bands = graft.operators.Dedup.simhashBands(corpus).cache()
    val q = Pipelines.streamNearDupScreen(stream, bands)
      .writeStream.format("memory").queryName("screen_out")
      .outputMode("append").start()
    in.addData(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "entirely unrelated text mentioning parquet pushdown and shuffle partitions"))
    q.processAllAvailable()
    val out = spark.table("screen_out").collect()
    q.stop()
    // doc 1 is an exact dup of corpus 100 → exactly ONE (1,100) row
    // (per-row band dedup, no stateful dropDuplicates); doc 2 clean
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 100L)))
    assert(out.head.getLong(2) == 0L)
  }

  test("crash recovery: kill after a torn epoch, restart from checkpoint, equal the uninterrupted run") {
    import java.nio.file.{Files => JF, Paths => JP}
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    // The exactly-once claim is: deterministic transform + per-epoch
    // overwrite sink + checkpoint = a crash anywhere between the sink
    // write and the epoch commit is invisible in the final output.
    // This test manufactures exactly that crash state instead of
    // hoping a timed kill lands inside the window: stop the query,
    // delete the epoch's commit marker (crash BEFORE commit), and
    // tear the epoch's sink output (crash MID-write), then restart.
    val base = JF.createTempDirectory("graft_crash").toString
    val inDir = s"$base/in"; JF.createDirectories(JP.get(inDir))
    def addFile(n: Int, rows: Seq[(Long, String, String)]): Unit =
      JF.write(JP.get(s"$inDir/f$n.csv"),
        rows.map { case (i, l, s) => s"$i,$l,$s" }.mkString("\n").getBytes)
    val rates = Seq(("en", "src0", 3L, 1L))
      .toDF("lang", "source", "cnt", "mincnt").cache()
    val schema = new StructType()
      .add("doc_id", "long").add("lang", "string").add("source", "string")
    def start(out: String, ckpt: String) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).csv(inDir)
      Pipelines.streamStratifiedSample(stream, rates)
        .writeStream.foreachBatch(Pipelines.idempotentParquetSink(out))
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    def snapshot(out: String): Seq[(Long, String, String, Int)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
          r.getAs[String]("source"), r.getAs[Int]("batch"))).sorted.toSeq
    // one file per epoch (maxFilesPerTrigger=1): f0, f1 now, f2 later
    addFile(0, (1L to 30L).map(i => (i, "en", "src0")))
    addFile(1, (31L to 60L).map(i => (i, "en", "src0")))
    // ---- crashed run: epochs 0-1, then the manufactured crash ----
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val q1 = start(out, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(JF.exists(JP.get(s"$ckpt/commits/1")), "precondition: epoch 1 committed")
    // crash state A: epoch 1 wrote its output but never committed.
    // The local-fs CheckpointFileManager renames (marker, .crc sibling)
    // as one unit, so a crash loses both — delete both; leaving the
    // stale .crc behind would manufacture a state no crash produces
    // (and Spark rightly rejects it as concurrent checkpoint use).
    JF.delete(JP.get(s"$ckpt/commits/1"))
    JF.deleteIfExists(JP.get(s"$ckpt/commits/.1.crc"))
    // crash state B: the write itself was torn — drop one part file
    val batch1 = JP.get(s"$out/batch=1")
    val part = JF.list(batch1).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).next()
    JF.delete(part)
    // more input arrives while "down"
    addFile(2, (61L to 90L).map(i => (i, "en", "src0")))
    // ---- restart from the same checkpoint ----
    val q2 = start(out, ckpt)
    q2.processAllAvailable(); q2.stop()
    // ---- reference: the same 3 files, never interrupted ----
    val qr = start(s"$base/ref_out", s"$base/ref_ckpt")
    qr.processAllAvailable(); qr.stop()
    val recovered = snapshot(out)
    assert(recovered == snapshot(s"$base/ref_out"),
      "recovered output must equal the uninterrupted run exactly")
    // the replay really did re-execute epoch 1 (not just skip it)
    assert(recovered.exists(_._4 == 1) && recovered.exists(_._4 == 2))
  }

  test("idempotent sink: replaying an epoch overwrites, never duplicates") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_eo_sink").toString
    val sink = Pipelines.idempotentParquetSink(dir)
    val in = MemoryStream[Int]
    val q = in.toDF().writeStream.foreachBatch(sink)
      .outputMode("append").start()
    in.addData(1, 2, 3)
    q.processAllAvailable()
    q.stop()
    val n1 = spark.read.parquet(dir).count()
    assert(n1 == 3)
    // simulate failure-recovery redelivery of epoch 0 with the same data
    sink(Seq(1, 2, 3).toDF("value"), 0L)
    assert(spark.read.parquet(dir).count() == 3, "replay must not duplicate")
    // a genuinely new epoch appends its own partition
    sink(Seq(4).toDF("value"), 1L)
    val all = spark.read.parquet(dir)
    assert(all.count() == 4)
    // the epoch rides as a partition column readers can prune on
    assert(all.filter(col("batch") === 1).count() == 1)
  }

  test("stream passage screen flags shared 20-token blocks against the reference") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // 20+ shared tokens guarantee a shared block at block size 20
    val passage = (1 to 20).map(i => s"tok$i").mkString(" ")
    val ref = Seq((900L, s"$passage trailing reference words here"))
      .toDF("doc_id", "text")
    val refBlocks = graft.operators.Dedup.passageBlocks(ref).cache()
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val q = Pipelines.streamPassageScreen(stream, refBlocks)
      .writeStream.format("memory").queryName("passage_out")
      .outputMode("append").start()
    in.addData(
      (1L, passage), // leads with the reference's first block → alert
      (2L, "no overlap with anything in the reference corpus at all"),
      // a sub-unit fragment must NOT flag even though the reference's
      // trailing partial block hashes the same tokens
      (3L, "trailing reference words here"))
    q.processAllAvailable()
    val out = spark.table("passage_out").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    q.stop()
    assert(out.toSeq == Seq((1L, 0, 900L)), s"got ${out.toSeq}")
  }

  test("bloom span screen merges duplicated token ranges in-row, statelessly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val K = 5
    // two corpus docs share a 6-token phrase → its two 5-shingles are
    // the corpus's duplicated grams (min doc ≠ max doc)
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta unique tail one"),
      (200L, "prefix words alpha beta gamma delta epsilon zeta other"))
      .toDF("doc_id", "text")
    val dup = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), K)).as("g"))
      .select(col("doc_id"), Dedup.shingleHash(col("g")).as("h"))
      .groupBy("h").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx")).select("h")
    val numBits = 8192
    val bits = Dedup.bloomBuild(dup, "h", numBits, 3)
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamSpanScreen(
        in.toDF().toDF("doc_id", "text"), bits, numBits, 3, K)
      .writeStream.format("memory").queryName("span_screen_out")
      .outputMode("append").start()
    in.addData(
      // leads with the shared phrase: shingle starts 1,2 chain → [1, 6]
      (1L, "alpha beta gamma delta epsilon zeta closing words here now"),
      (2L, "totally fresh content with no duplicated phrases at all ok"))
    q.processAllAvailable()
    val out = spark.table("span_screen_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    q.stop()
    assert(out.toSeq.sortBy(_._1) == Seq((1L, 1L, 6L, 2L)), s"got ${out.toSeq}")
  }

  test("bloom span cut excises the marked ranges in-row, statelessly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    val K = 5
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta unique tail one"),
      (200L, "prefix words alpha beta gamma delta epsilon zeta other"))
      .toDF("doc_id", "text")
    val dup = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), K)).as("g"))
      .select(col("doc_id"), Dedup.shingleHash(col("g")).as("h"))
      .groupBy("h").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx")).select("h")
    val numBits = 8192
    val bits = Dedup.bloomBuild(dup, "h", numBits, 3)
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamSpanCut(
        in.toDF().toDF("doc_id", "text"), bits, numBits, 3, K)
      .writeStream.format("memory").queryName("span_cut_out")
      .outputMode("append").start()
    in.addData(
      // shared phrase leads: shingle starts 1,2 chain → tokens 1..6 cut
      (1L, "alpha beta gamma delta epsilon zeta closing words here now"),
      (2L, "totally fresh content with no duplicated phrases at all ok"))
    q.processAllAvailable()
    val out = spark.table("span_cut_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .sortBy(_._1)
    q.stop()
    assert(out.toSeq == Seq(
      (1L, 10L, 6L, "closing words here now"),
      (2L, 10L, 0L, "totally fresh content with no duplicated phrases at all ok")),
      s"got ${out.toSeq}")
  }

  test("span cut -> idempotent sink: a torn, replayed epoch lands identical cut text") {
    import java.nio.file.{Files => JF, Paths => JP}
    import org.apache.spark.sql.types.StructType
    import scala.jdk.CollectionConverters._
    import graft.operators.Dedup
    import spark.implicits._
    // the last ExactSubstr piece without an exactly-once proof: the
    // ingest-time cut is stateless and deterministic in the row alone
    // (bloom probe + in-row fold), so the crash-recovery contract of
    // the stratified-sample test must hold verbatim — a crash between
    // the epoch's sink write and its commit replays to BYTE-IDENTICAL
    // cleaned text, never duplicates, never divergent cuts.
    val K = 5
    val corpus = Seq(
      (100L, "alpha beta gamma delta epsilon zeta unique tail one"),
      (200L, "prefix words alpha beta gamma delta epsilon zeta other"))
      .toDF("doc_id", "text")
    val dup = corpus
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), K)).as("g"))
      .select(col("doc_id"), Dedup.shingleHash(col("g")).as("h"))
      .groupBy("h").agg(min("doc_id").as("mn"), max("doc_id").as("mx"))
      .filter(col("mn") =!= col("mx")).select("h")
    val numBits = 8192
    val bits = Dedup.bloomBuild(dup, "h", numBits, 3)
    val base = JF.createTempDirectory("graft_spancut_crash").toString
    val inDir = s"$base/in"; JF.createDirectories(JP.get(inDir))
    def addFile(n: Int, rows: Seq[(Long, String)]): Unit =
      JF.write(JP.get(s"$inDir/f$n.csv"),
        rows.map { case (i, t) => s"$i,$t" }.mkString("\n").getBytes)
    val schema = new StructType().add("doc_id", "long").add("text", "string")
    def start(out: String, ckpt: String) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).csv(inDir)
      Pipelines.streamSpanCut(stream, bits, numBits, 3, K)
        .writeStream.foreachBatch(Pipelines.idempotentParquetSink(out))
        .option("checkpointLocation", ckpt).outputMode("append").start()
    }
    def snapshot(out: String): Seq[(Long, Long, Long, String, Int)] =
      spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("in_id"), r.getAs[Long]("n_toks"),
          r.getAs[Long]("n_cut"), r.getAs[String]("cleaned_text"),
          r.getAs[Int]("batch"))).sorted.toSeq
    // epoch 0: one dup-leading doc; epoch 1: one clean + one dup doc
    addFile(0, Seq(
      (1L, "alpha beta gamma delta epsilon zeta closing words here now")))
    addFile(1, Seq(
      (2L, "totally fresh content with no duplicated phrases at all ok"),
      (3L, "alpha beta gamma delta epsilon zeta trailing remainder text here")))
    val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val q1 = start(out, ckpt)
    q1.processAllAvailable(); q1.stop()
    assert(JF.exists(JP.get(s"$ckpt/commits/1")), "precondition: epoch 1 committed")
    // crash state A: epoch 1 wrote but never committed (marker + .crc
    // sibling go together — the local CheckpointFileManager renames
    // them as one unit)
    JF.delete(JP.get(s"$ckpt/commits/1"))
    JF.deleteIfExists(JP.get(s"$ckpt/commits/.1.crc"))
    // crash state B: the epoch's sink write itself was torn
    val batch1 = JP.get(s"$out/batch=1")
    val part = JF.list(batch1).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).next()
    JF.delete(part)
    // more input arrives while "down"
    addFile(2, Seq(
      (4L, "words alpha beta gamma delta epsilon zeta and a unique coda")))
    val q2 = start(out, ckpt)
    q2.processAllAvailable(); q2.stop()
    // reference: the same three files, never interrupted
    val qr = start(s"$base/ref_out", s"$base/ref_ckpt")
    qr.processAllAvailable(); qr.stop()
    val recovered = snapshot(out)
    assert(recovered == snapshot(s"$base/ref_out"),
      "recovered cut output must equal the uninterrupted run byte for byte")
    // the replay re-executed the torn epoch AND the cut really cut
    assert(recovered.exists(r => r._5 == 1 && r._3 > 0L),
      "epoch 1's dup-leading doc must re-land with its span excised")
    assert(recovered.count(_._1 == 3L) == 1, "replay must not duplicate doc 3")
    assert(recovered.exists(r => r._1 == 2L && r._3 == 0L),
      "the clean doc survives untouched")
  }

  test("stream decontamination screen flags eval-overlapping docs at ingest") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Dedup
    // eval doc: 13+ tokens so it carries 13-grams; the contaminated
    // arrival repeats them verbatim, the clean one shares nothing
    val evalText = (1 to 15).map(i => s"ev$i").mkString(" ")
    val evalGrams = Seq((0L, evalText)).toDF("doc_id", "text")
      .select(explode(array_distinct(transform(
        graft.functions.Native.wordShingles(
          graft.functions.Text.tokens(lower(col("text"))), 13),
        sh => graft.functions.Native.polyHash(sh, 1000003L)))).as("h"))
      .distinct()
    val numBits = 8192
    val bits = Dedup.bloomBuild(evalGrams, "h", numBits, 3)
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamDecontaminate(
        in.toDF().toDF("doc_id", "text"), bits, numBits, 3)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode("append").start()
    in.addData(
      (1L, evalText), // verbatim eval copy: every gram hits
      (2L, (1 to 15).map(i => s"fresh$i").mkString(" ")), // clean
      (3L, "too short for grams")) // < 13 tokens: single whole-doc gram
    q.processAllAvailable()
    val out = spark.table("decon_out").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(4))).toMap
    q.stop()
    assert(out(1L)._1 == 3L && out(1L)._2 == 3L && out(1L)._3 == 1,
      s"verbatim eval copy must flag drop_doc, got ${out(1L)}")
    assert(out(2L)._2 == 0L && out(2L)._3 == 0, "clean doc must pass")
    assert(out(3L)._1 == 1L && out(3L)._2 == 0L,
      "a short doc carries one whole-doc gram and passes")
  }

  test("stream gopher screen verdicts equal the batch d36 gate doc-for-doc") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // drive the REAL corpus through the ingest screen and require the
    // survivor set to equal the batch report's pass=1 set — the
    // shared-kernel claim as an executable fact
    val batch = SparkEntry.queries("d36_gopher_rules")(spark, sf).collect()
      .filter(_.getAs[Int]("pass") == 1).map(_.getLong(0)).toSet
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // the synthetic corpus may pass or fail wholesale, so two crafted
    // docs pin both branches regardless: one satisfying every rule
    // (60 words, short alphabetic words, stopwords present, no
    // symbols), one failing the word-count floor
    val passing = (900001L,
      ("the cat and the dog have gone out to see that " +
        "fine market with all of our good old friends again today ") * 3)
    val failing = (900002L, "too short to pass the gate")
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamGopherScreen(in.toDF().toDF("doc_id", "text"))
      .select("doc_id")
      .writeStream.format("memory").queryName("gopher_out")
      .outputMode("append").start()
    in.addData(docs :+ passing :+ failing)
    q.processAllAvailable()
    val survived = spark.table("gopher_out").collect().map(_.getLong(0)).toSet
    q.stop()
    assert(survived - passing._1 == batch,
      s"ingest survivors must equal batch pass set (${survived.size} vs ${batch.size})")
    assert(survived(passing._1), "the rule-satisfying doc must land")
    assert(!survived(failing._1), "the under-length doc must be gated")
  }

  test("stream domain cap admits at most N docs per domain across epochs") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val q = Pipelines.streamDomainCap(
        in.toDF().toDF("domain", "doc_id"), cap = 3L)
      .writeStream.format("memory").queryName("cap_out")
      .outputMode("append").start()
    // epoch 0: a.com sends 2, b.com sends 1 (out of id order — the
    // within-batch sort must admit 10 before 20)
    in.addData(("a.com", 20L), ("a.com", 10L), ("b.com", 5L))
    q.processAllAvailable()
    // epoch 1: a.com sends 2 more (only ONE seat left), b.com 1 more
    in.addData(("a.com", 30L), ("a.com", 40L), ("b.com", 6L))
    q.processAllAvailable()
    // epoch 2: a.com is full — nothing lands
    in.addData(("a.com", 50L))
    q.processAllAvailable()
    val out = spark.table("cap_out").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    q.stop()
    assert(out == Seq(
      ("a.com", 1L, 10L), ("a.com", 2L, 20L), ("a.com", 3L, 30L),
      ("b.com", 1L, 5L), ("b.com", 2L, 6L)),
      s"cap must hold across epochs with rank continuity, got $out")
  }

  test("stream-static PQ/ADC screen scores arriving vectors against corpus codes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // tiny 8-dim space: m=2 subspaces of 4 dims, ks=2 codewords
    val cb = Array( // (s*ks + j)*subDim + d layout
      1.0, 0.0, 0.0, 0.0, /* s0 j0 */ 0.0, 1.0, 0.0, 0.0, /* s0 j1 */
      0.0, 0.0, 1.0, 0.0, /* s1 j0 */ 0.0, 0.0, 0.0, 1.0 /* s1 j1 */)
    val corpus = Seq(
      (100L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 1.0f, 0f)),
      (200L, Array(0f, 1.0f, 0f, 0f, 0f, 0f, 0f, 1.0f))
    ).toDF("cand_id", "embedding")
    val codes = corpus.select(col("cand_id"),
      graft.functions.Native.pqEncode(col("embedding"), cb, 2, 2, 4).as("code")).cache()
    val in = MemoryStream[(Long, Array[Float])]
    val stream = in.toDF().toDF("vec_id", "embedding")
    val q = Pipelines.streamPqScreen(stream, codes, cb, maxAdc = 1.0,
        m = 2, ks = 2, subDim = 4)
      .writeStream.format("memory").queryName("pq_screen_out")
      .outputMode("append").start()
    // query 1 sits on corpus 100's codewords (adc 0); query 2 is far
    in.addData((1L, Array(1.0f, 0f, 0f, 0f, 0f, 0f, 1.0f, 0f)),
      (2L, Array(0f, 0f, 5f, 5f, 5f, 5f, 0f, 0f)))
    q.processAllAvailable()
    val out = spark.table("pq_screen_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    q.stop()
    assert(out.exists { case (q1, c, adc) => q1 == 1L && c == 100L && adc == 0.0 })
    assert(!out.exists(_._1 == 2L), s"far vector must not pass the screen: ${out.toSeq}")
  }

  test("stream-static image phash screen flags re-brightened uploads, drops undecodable") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.{Multimodal, PpmCodec}
    val (w, h) = (16, 8)
    def enc(px: Int => Int) =
      PpmCodec.encode(w, h, Array.tabulate[Byte](w * h * 3)(i => px(i).toByte))
    val base: Int => Int = i => (i * 7 + 3) % 200
    val far: Int => Int = i => ((i / 24) * 90 + 10) % 200
    val corpus = Seq(100L -> enc(base), 200L -> enc(far)).toDS()
    val corpusBands = graft.operators.Dedup.bandChunks(
      Multimodal.hashImages(corpus).toDF().select(col("id"), col("dhash")),
      "id", "dhash").cache()
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Pipelines.streamImagePhashScreen(in.toDS().map(identity), corpusBands)
      .writeStream.format("memory").queryName("phash_screen_out")
      .outputMode("append").start()
    in.addData(
      (1L, enc(i => base(i) + 9)),            // re-brightened corpus 100
      (2L, enc(i => (i * 13 + 101) % 197)),   // unrelated gradient
      (3L, "not a ppm".getBytes("US-ASCII"))) // undecodable
    q.processAllAvailable()
    val out = spark.table("phash_screen_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    q.stop()
    assert(out.contains((1L, 100L, 0L)),
      s"brightness-shifted image must match its corpus original: ${out.toSeq}")
    assert(!out.exists(_._1 == 3L), "undecodable payloads must drop silently")
  }

  test("stream-static stratified sampler makes the batch d25 decisions, replay-stable") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // rates: stratum (en, src0) keeps ~1/3, (fr, src1) keeps all
    val rates = Seq(("en", "src0", 3L, 1L), ("fr", "src1", 1L, 1L))
      .toDF("lang", "source", "cnt", "mincnt").cache()
    def gate(id: Long, cnt: Long, mincnt: Long): Boolean =
      ((id * 2654435761L) % 2147483647L) % 1000003L * cnt < mincnt * 1000003L
    val in = MemoryStream[(Long, String, String)]
    val stream = in.toDF().toDF("doc_id", "lang", "source")
    val q = Pipelines.streamStratifiedSample(stream, rates)
      .writeStream.format("memory").queryName("strat_out")
      .outputMode("append").start()
    val batch = (1L to 30L).map(i => (i, "en", "src0")) :+ (99L, "fr", "src1")
    in.addData(batch: _*)
    q.processAllAvailable()
    // replaying the same rows must make the SAME decisions (the
    // determinism the idempotent sink relies on), not re-roll
    in.addData(batch: _*)
    q.processAllAvailable()
    val out = spark.table("strat_out").collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    q.stop()
    val expected = batch.filter { case (id, l, _) =>
      gate(id, if (l == "en") 3L else 1L, 1L)
    }.map(_._1)
    assert(out.sorted == (expected ++ expected).sorted,
      s"stream decisions must equal the batch gate on both plays: got $out")
    assert(out.contains(99L), "the keep-all stratum must pass its row")
    assert(expected.size < batch.size, "the downsampled stratum must drop rows")
  }

  test("stream-static temperature mix makes the batch d38 decisions, replay-stable") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // targets as d38 derives them: crawl has 9 docs, curated 1 →
    // mincnt=1, crawl target = floor(sqrt(1*9)) = 3 (~1/3 kept),
    // curated target = 1 (keep-all)
    val targets = Seq(("crawl", 9L, 3L), ("curated", 1L, 1L))
      .toDF("source", "cnt", "target").cache()
    def gate(id: Long, cnt: Long, target: Long): Boolean =
      ((id * 2654435761L) % 2147483647L) % 1000003L * cnt < target * 1000003L
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "source")
    val q = Pipelines.streamTemperatureMix(stream, targets)
      .writeStream.format("memory").queryName("tmix_out")
      .outputMode("append").start()
    val batch = (1L to 30L).map(i => (i, "crawl")) ++
      Seq((98L, "curated"), (99L, "srcNew"))
    in.addData(batch: _*)
    q.processAllAvailable()
    in.addData(batch: _*) // replay must not re-roll
    q.processAllAvailable()
    val out = spark.table("tmix_out").collect()
      .map(_.getAs[Long]("doc_id")).toSeq
    q.stop()
    val expected = batch.filter {
      case (id, "crawl") => gate(id, 9L, 3L)
      case (id, "curated") => gate(id, 1L, 1L)
      case _ => true // unknown source passes unsampled
    }.map(_._1)
    assert(out.sorted == (expected ++ expected).sorted,
      s"stream decisions must equal the batch gate on both plays: got $out")
    assert(out.contains(98L) && out.contains(99L))
    assert(expected.size < batch.size, "the flattened source must drop rows")
  }

  test("stream curriculum route tags the batch d58 phases at fixed thresholds") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // thresholds from the batch d58 percentile pass over sf0.001
    val batchRows = SparkEntry.queries("d58_curriculum_order")(spark, sf)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Int]("phase"),
          r.getAs[Long]("shuffle_key")))).toMap
    val p1 = batchRows.values.filter(_._2 == 1).map(_._1)
    val p2 = batchRows.values.filter(_._2 == 2).map(_._1)
    assert(p1.nonEmpty && p2.nonEmpty,
      "fixture corpus must populate phases 1 and 2 to derive thresholds")
    val (t2, t1) = (p1.min, p2.min)
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamCurriculumRoute(
        in.toDF().toDF("doc_id", "text"), t1, t2)
      .writeStream.format("memory").queryName("curr_out")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable()
    val out = spark.table("curr_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("score"), r.getAs[Int]("phase"),
          r.getAs[Long]("shuffle_key")))).toMap
    q.stop()
    assert(out == batchRows,
      "stream phases/scores/keys must equal the batch d58 rows at the same thresholds")
  }

  test("stream DSIR screen equals the batch d61 selection at its threshold") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val batch = SparkEntry.queries("d61_dsir_select")(spark, sf).collect()
    val selected = batch.filter(_.getAs[Int]("selected") == 1)
    val minScore = selected.map(_.getAs[Double]("score")).min
    // rebuild the two models exactly as d61 does (they are corpus
    // artifacts; the stream consumes them, never recomputes them)
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val bg = docs.select(col("lang"),
      explode(graft.functions.Text.dsirBuckets(col("text"))).as("bkt"))
    def model(df: org.apache.spark.sql.DataFrame): Array[Long] = {
      val a = new Array[Long](1024)
      df.groupBy("bkt").agg(count(lit(1)).as("c")).collect()
        .foreach(r => a(r.getInt(0)) = r.getLong(1))
      a
    }
    val tArr = model(bg.filter(col("lang") === "en"))
    val rArr = model(bg)
    val rows = docs.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamDsirSelect(
        in.toDF().toDF("doc_id", "text"), tArr, rArr, minScore)
      .writeStream.format("memory").queryName("dsir_out")
      .outputMode("append").start()
    in.addData(rows: _*)
    q.processAllAvailable()
    val out = spark.table("dsir_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("t_sum"),
        r.getAs[Long]("r_sum"))).toSet
    q.stop()
    val expected = selected.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("t_sum"), r.getAs[Long]("r_sum"))).toSet
    assert(out == expected,
      "the stream screen must pass exactly the batch-selected documents")
  }

  test("stream line dedup keeps first occurrences across micro-batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[LineItem]
    val q = Pipelines.streamLineDedup(in.toDS())
      .writeStream.format("memory").queryName("linededup_out")
      .outputMode("append").start()
    // batch 1: two docs sharing a boilerplate line
    in.addData(
      LineItem(1L, 0, "unique alpha"), LineItem(1L, 1, "terms apply"),
      LineItem(2L, 0, "unique beta"), LineItem(2L, 1, "terms apply"))
    q.processAllAvailable()
    // batch 2: a later doc re-sends the boilerplate AND an old unique
    // line; only its fresh line survives
    in.addData(
      LineItem(3L, 0, "terms apply"), LineItem(3L, 1, "unique alpha"),
      LineItem(3L, 2, "unique gamma"))
    q.processAllAvailable()
    val out = spark.table("linededup_out").collect()
      .map(r => (r.getAs[String]("line"), r.getAs[Long]("docId"),
        r.getAs[Int]("lineIdx"))).toSet
    q.stop()
    assert(out == Set(
      ("unique alpha", 1L, 0), ("terms apply", 1L, 1),
      ("unique beta", 2L, 0), ("unique gamma", 3L, 2)),
      "every line keeps exactly its first (doc, idx) occurrence")
  }

  test("stream line dedup TTL evicts aged markers, re-admits the line, bounds state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    val in = MemoryStream[TimedLineItem]
    // event-time TTL 1 hour, watermark delay 1 minute
    val q = Pipelines.streamLineDedupTtl(in.toDS(),
        watermarkDelay = "1 minute", stateTtlMs = 3600000L)
      .writeStream.format("memory").queryName("linettl_out")
      .outputMode("append").start()
    in.addData(TimedLineItem(1L, 0, "terms apply", t("2024-01-01 00:00:00")),
      TimedLineItem(1L, 1, "unique alpha", t("2024-01-01 00:00:00")))
    q.processAllAvailable()
    // a re-send inside the TTL window is still deduped (and refreshes
    // the marker's timeout to 01:10)
    in.addData(TimedLineItem(2L, 0, "terms apply", t("2024-01-01 00:10:00")))
    q.processAllAvailable()
    // push the watermark past every armed timeout (03:00 - 1min >> 01:10)
    in.addData(TimedLineItem(4L, 0, "fresh delta", t("2024-01-01 03:00:00")))
    q.processAllAvailable()
    // timeouts FIRE in the next batch (watermark updates at batch end):
    // this batch evicts the aged "terms apply"/"unique alpha" markers
    in.addData(TimedLineItem(5L, 0, "watermark pusher", t("2024-01-01 03:01:00")))
    q.processAllAvailable()
    // the aged line re-admits as a FRESH keeper (the generation reset)
    in.addData(TimedLineItem(3L, 0, "terms apply", t("2024-01-01 03:02:00")))
    q.processAllAvailable()
    val out = spark.table("linettl_out").collect()
      .map(r => (r.getAs[String]("line"), r.getAs[Long]("docId"),
        r.getAs[Int]("lineIdx"))).toSet
    val stateRows = q.recentProgress.reverse
      .find(_.stateOperators.nonEmpty).map(_.stateOperators.head.numRowsTotal)
    q.stop()
    assert(out == Set(
      ("terms apply", 1L, 0), ("unique alpha", 1L, 1),
      ("fresh delta", 4L, 0), ("watermark pusher", 5L, 0),
      ("terms apply", 3L, 0)),
      s"TTL must dedup within a generation and re-admit across them: $out")
    // 4 distinct lines entered over the stream's lifetime but evicted
    // markers LEFT state: survivors are bounded by one TTL window's
    // lines (fresh delta, watermark pusher, re-admitted terms apply),
    // not corpus lifetime
    assert(stateRows.exists(_ <= 3L),
      s"aged markers must leave the state store, saw $stateRows rows")
  }

  test("stream epoch upsample makes the batch d59 copies, replay-stable") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // targets as d59 derives them: en has 9 docs (majority), de 4 →
    // maxcnt=9, en target = 9 (1 copy each), de target =
    // floor(sqrt(9*4)) = 6 → base 1 copy + 2 residual extras
    val targets = Seq(("en", 9L, 9L), ("de", 4L, 6L))
      .toDF("lang", "cnt", "target").cache()
    def copies(id: Long, cnt: Long, target: Long): Long =
      target / cnt +
        (if (((id * 2654435761L) % 2147483647L) % cnt < target % cnt) 1L else 0L)
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "lang")
    val q = Pipelines.streamEpochUpsample(stream, targets)
      .writeStream.format("memory").queryName("epoch_out")
      .outputMode("append").start()
    val batch = (1L to 9L).map(i => (i, "en")) ++
      (10L to 13L).map(i => (i, "de")) ++ Seq((99L, "xx"))
    in.addData(batch: _*)
    q.processAllAvailable()
    in.addData(batch: _*) // replay must not re-roll the residual
    q.processAllAvailable()
    val out = spark.table("epoch_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("copy"))).toSeq
    q.stop()
    val expected = batch.flatMap {
      case (id, "en") => (1L to copies(id, 9L, 9L)).map(k => (id, k))
      case (id, "de") => (1L to copies(id, 4L, 6L)).map(k => (id, k))
      case (id, _)    => Seq((id, 1L)) // unknown language: one copy
    }
    assert(out.sorted == (expected ++ expected).sorted,
      "stream epoch rows must equal the batch mixture on both plays")
    assert(expected.groupBy(_._1).values.exists(_.size > 1),
      "the rare language must carry a second copy for some doc")
    assert(out.map(_._1).contains(99L), "unknown language passes through")
  }

  test("sampler passes unknown strata through unsampled (keep-all contract)") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // rates know only (en, src0); a (de, srcNew) stratum arrives mid-stream
    val rates = Seq(("en", "src0", 3L, 1L))
      .toDF("lang", "source", "cnt", "mincnt").cache()
    val in = MemoryStream[(Long, String, String)]
    val stream = in.toDF().toDF("doc_id", "lang", "source")
    val q = Pipelines.streamStratifiedSample(stream, rates)
      .writeStream.format("memory").queryName("strat_unknown_out")
      .outputMode("append").start()
    in.addData((1L to 10L).map(i => (i, "de", "srcNew")): _*)
    q.processAllAvailable()
    val out = spark.table("strat_unknown_out").collect()
    q.stop()
    assert(out.length == 10,
      "a stratum absent from the rates table must pass through keep-all, not vanish")
    assert(out.map(_.getAs[Long]("doc_id")).sorted.toSeq == (1L to 10L))
  }

  test("sampler → idempotent sink composition: a replayed epoch is identical") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the two pieces were designed to compose: deterministic keep/drop
    // decisions + per-epoch overwrite = exactly-once sampling output
    // under failure-recovery redelivery
    val dir = java.nio.file.Files.createTempDirectory("graft_strat_eo").toString
    val rates = Seq(("en", "src0", 3L, 1L))
      .toDF("lang", "source", "cnt", "mincnt").cache()
    val sink = Pipelines.idempotentParquetSink(dir)
    val in = MemoryStream[(Long, String, String)]
    val stream = in.toDF().toDF("doc_id", "lang", "source")
    val q = Pipelines.streamStratifiedSample(stream, rates)
      .writeStream.foreachBatch(sink).outputMode("append").start()
    val batch = (1L to 30L).map(i => (i, "en", "src0"))
    in.addData(batch: _*)
    q.processAllAvailable()
    q.stop()
    def rows() = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[String]("source"), r.getAs[Int]("batch"))).sorted.toSeq
    val first = rows()
    assert(first.nonEmpty && first.size < batch.size,
      "the sampled epoch must keep a strict subset")
    // failure-recovery redelivery: epoch 0's INPUT rows re-run the same
    // sampler logic (the gate re-decides — this is where rand() would
    // diverge) and the sink overwrites its own batch=0 partition
    sink(Pipelines.streamStratifiedSample(
      batch.toDF("doc_id", "lang", "source"), rates), 0L)
    assert(rows() == first,
      "replayed epoch output must be identical — same decisions, no duplicates")
  }

  test("keyword screen keeps term-bearing docs, drops the rest, stateless") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val screened = Pipelines.streamKeywordScreen(stream,
      termDfs = Seq("spark" -> 3L, "join" -> 2L),
      nDocs = 10L, avgdl = 5.0, minScore = 0.1)
    val q = screened.writeStream.format("memory").queryName("kw_screen_out")
      .outputMode("append").start()
    in.addData(
      (1L, "spark join spark row"),      // both terms
      (2L, "the quick brown fox"),       // neither — must drop
      (3L, "join the table"),            // one term
      (4L, "SPARK loves Spark"))         // case-normalized tf=2
    q.processAllAvailable()
    val out = spark.table("kw_screen_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    q.stop()
    assert(out.keySet == Set(1L, 3L, 4L),
      s"docs without query terms must drop, got ${out.keySet}")
    assert(out(1L) > out(3L), "two matching terms must outscore one")
    assert(out.values.forall(_ > 0.0))
    // the screen is a pure per-row expression: recomputing the same
    // rows as a batch yields the identical scores (replay stability)
    val replay = Pipelines.streamKeywordScreen(
      Seq((1L, "spark join spark row"), (3L, "join the table"),
        (4L, "SPARK loves Spark")).toDF("doc_id", "text"),
      Seq("spark" -> 3L, "join" -> 2L), 10L, 5.0, 0.1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25")).toMap
    assert(replay == out, "replayed rows must score bit-identically")
  }

  test("stream chunker emits the d54 batch chunks row-for-row") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").limit(40).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamRagChunks(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("rag_chunks_out")
      .outputMode("append").start()
    in.addData(docs.toSeq: _*)
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_idx"),
        r.getAs[Int]("start_tok"), r.getAs[Int]("n_tok"),
        r.getAs[String]("chunk_text"))
    val streamed = spark.table("rag_chunks_out").collect().map(key).toSet
    q.stop()
    val batch = SparkEntry.queries("d54_rag_chunks")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .collect().map(key).toSet
    assert(streamed == batch,
      "shared-kernel chunking must make stream and batch chunks identical")
    assert(streamed.nonEmpty)
  }

  test("stream FIM rewrite emits the d70 batch rows row-for-row") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").limit(40).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamFimTransform(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("fim_out")
      .outputMode("append").start()
    in.addData(docs.toSeq: _*)
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("doc_id"), r.getAs[Boolean]("fim_applied"),
        r.getAs[Int]("n_prefix"), r.getAs[Int]("n_middle"),
        r.getAs[Int]("n_suffix"), r.getAs[String]("psm_text"))
    val streamed = spark.table("fim_out").collect().map(key).toSet
    q.stop()
    val batch = SparkEntry.queries("d70_fim_transform")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .collect().map(key).toSet
    assert(streamed == batch,
      "shared-kernel FIM must make stream and batch PSM rows identical")
    // both branches of the gate are exercised
    assert(streamed.exists(_._2) && streamed.exists(!_._2))
  }

  test("stream shard route agrees with the d69 batch shard/sort-key map") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id").limit(60).collect()
      .map(r => (r.getAs[Long]("doc_id"), "x"))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamShardRoute(in.toDF().toDF("doc_id", "text"),
        nShards = 32L)
      .writeStream.format("memory").queryName("shard_route_out")
      .outputMode("append").start()
    in.addData(docs.toSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("shard_route_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Long]("sort_key"))).toSet
    q.stop()
    // batch d69 at this SF derives the same 32-shard layout; its pos
    // column is the per-shard sort the stream defers to file-close
    val batch = SparkEntry.queries("d69_shuffle_shard")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"))).toSet
    assert(streamed.map(t => (t._1, t._2)) == batch,
      "stream shard assignment must equal the batch shard map")
    // the sort key induces the batch's within-shard order on this slice
    val bySortKey = streamed.groupBy(_._2).view.mapValues(
      _.toSeq.sortBy(t => (t._3, t._1)).map(_._1)).toMap
    val batchOrder = SparkEntry.queries("d69_shuffle_shard")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .orderBy("shard", "pos").collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id")))
      .groupBy(_._1).view.mapValues(_.toSeq.map(_._2)).toMap
    assert(bySortKey == batchOrder,
      "the shipped sort key must reproduce the batch permutation")
  }

  test("stream robots screen agrees with the d72 batch gate row-for-row") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("lang")).limit(80).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        "/" + r.getAs[String]("lang") + "/p" + (r.getAs[Long]("doc_id") % 50)))
    // the rule table the batch side implies, shipped PRE-GROUPED
    val domainRules = graft.sources.Tables.table(spark, sf, "documents")
      .select(col("source").as("domain")).distinct()
      .select(col("domain"),
        graft.functions.Text.robotsRuleArray(col("domain")).as("rules"))
    val in = MemoryStream[(Long, String, String)]
    val q = Pipelines.streamRobotsScreen(
        in.toDF().toDF("doc_id", "domain", "path"), domainRules)
      .writeStream.format("memory").queryName("robots_out")
      .outputMode("append").start()
    in.addData(docs.toSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("robots_out").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("matched_rule"),
        r.getAs[Boolean]("allowed"))).toSet
    q.stop()
    val batch = SparkEntry.queries("d72_robots_filter")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*)).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("matched_rule"),
        r.getAs[Boolean]("allowed"))).toSet
    assert(streamed == batch,
      "the in-row rule fold must equal the batch argmax aggregation")
    // all three decision branches appear in the slice
    assert(streamed.exists(!_._3) && streamed.exists(t => t._3 && t._2 == null)
      && streamed.exists(t => t._3 && t._2 != null))
  }

  test("stream WARC ingest splits records exactly like the batch parser") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the m21 container synthesis for a handful of ids, plus one
    // malformed payload to exercise the null-row branch mid-stream
    def container(id: Long): Array[Byte] = {
      val recs = (0 until (2 + id % 3).toInt).map { r =>
        val k = (5 + (id + r) % 4).toInt
        val toks = (0 until k).map(j => s"tok${(id * 7 + r * 13 + j) % 50}")
        val body = toks.take(3).mkString(" ") + "\r\n\r\n" +
          toks.drop(3).mkString(" ")
        (s"http://site$id.example/p$r", body)
      }
      graft.operators.WarcCodec.encode(recs)
    }
    val payloads = (1L to 6L).map(id => (id, container(id))) :+
      (99L, "not a warc at all".getBytes("US-ASCII"))
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Pipelines.streamWarcIngest(in.toDF().toDF("doc_id", "payload"))
      .writeStream.format("memory").queryName("warc_out")
      .outputMode("append").start()
    in.addData(payloads: _*)
    q.processAllAvailable()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id"), Option(r.getAs[Integer]("rec_idx")),
        Option(r.getAs[String]("uri")),
        Option(r.getAs[Integer]("content_length")),
        Option(r.getAs[String]("body")))
    val streamed = spark.table("warc_out").collect().map(key).toSet
    q.stop()
    val batch = graft.operators.Multimodal.decodeWarcRecords(
        spark.createDataset(payloads)).toDF().collect().map(key).toSet
    assert(streamed == batch,
      "stream and batch record splits must be identical")
    assert(streamed.exists(t => t._1 == 99L && t._2.isEmpty),
      "the malformed container must surface as the null row, not an error")
    assert(streamed.count(_._2.nonEmpty) ==
      (1L to 6L).map(id => 2 + id % 3).sum)
  }

  test("stream soft-dedup weights agree with the d74 batch reweighting") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").limit(60).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val commonness = graft.sources.Tables.table(spark, sf, "documents")
      .select(md5(lower(col("text"))).as("h"))
      .groupBy("h").agg(count(lit(1)).as("n_copies"))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamSoftDedupWeights(
        in.toDF().toDF("doc_id", "text"), commonness)
      .writeStream.format("memory").queryName("softdedup_out")
      .outputMode("append").start()
    // real corpus rows PLUS one novel doc exercising the unseen branch
    in.addData(docs.toSeq :+ (999999L, "a brand new never seen text"): _*)
    q.processAllAvailable()
    val streamed = spark.table("softdedup_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_copies"), r.getAs[Double]("sample_weight")))).toMap
    q.stop()
    val batch = SparkEntry.queries("d74_soft_dedup_weights")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*)).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_copies"), r.getAs[Double]("sample_weight")))).toMap
    assert(docs.forall { case (id, _) => streamed(id) == batch(id) },
      "stream weights must equal the batch reweighting on historical content")
    assert(streamed(999999L) == ((1L, 1.0)),
      "novel content must pass through at weight 1.0")
  }

  test("quality screen agrees with the d33 batch gate on real corpus rows") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // real documents rows so the parity check exercises real text
    val docs = graft.sources.Tables.table(spark, sf, "documents")
      .select("doc_id", "text").limit(50).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("text")))
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val q = Pipelines.streamQualityScreen(stream, minLogit = 0.0)
      .writeStream.format("memory").queryName("quality_screen_out")
      .outputMode("append").start()
    in.addData(docs.toSeq: _*)
    q.processAllAvailable()
    val screened = spark.table("quality_screen_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("logit")).toMap
    q.stop()
    // the batch gate over the same rows: keep=1 iff logit >= 0 — the
    // stream screen must keep exactly those docs with identical logits
    val batch = SparkEntry.queries("d33_quality_classifier")(spark, sf)
      .filter(col("doc_id").isin(docs.map(_._1): _*))
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("logit"),
        r.getAs[Int]("keep")))
    val expected = batch.filter(_._3 == 1).map(t => t._1 -> t._2).toMap
    assert(screened == expected,
      "stream screen must keep exactly the batch gate's keepers, logits bit-equal")
    assert(screened.nonEmpty && screened.size < docs.length,
      "parity fixture should exercise both keep and drop paths")
  }

  test("epoch sequence packing: offsets cover each shard gaplessly; replay is identical") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_pack_eo").toString
    // tiny seqLen so docs straddle sequence boundaries in-test
    val sink = Pipelines.epochSequencePackSink(dir, seqLen = 16L, nShards = 4L)
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val q = stream.writeStream.foreachBatch(sink).outputMode("append").start()
    val batch = (1L to 40L).map(i =>
      (i, Seq.fill((3 + i % 9).toInt)("tok").mkString(" ")))
    in.addData(batch: _*)
    q.processAllAvailable()
    q.stop()
    def rows() = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("shard"),
        r.getAs[Int]("n_tokens"), r.getAs[Long]("tok_offset"),
        r.getAs[Long]("seq_id"), r.getAs[Long]("n_seqs"))).sorted.toSeq
    val first = rows()
    assert(first.map(_._1) == (1L to 40L), "every doc must be packed exactly once")
    // within each shard the offsets are gapless: sorted offsets tile
    // head-to-tail with the token counts (the packing invariant)
    first.groupBy(_._2).foreach { case (_, docs) =>
      val byOff = docs.sortBy(_._4)
      byOff.foldLeft(0L) { case (expect, (_, _, n, off, _, _)) =>
        assert(off == expect, s"offset gap: expected $expect got $off")
        expect + n
      }
    }
    assert(first.exists(_._6 > 1), "some doc must straddle a sequence boundary")
    // failure-recovery redelivery: same input, same epoch id → the
    // deterministic pack + idempotent overwrite must reproduce the
    // output byte-for-byte
    sink(batch.toDF("doc_id", "text"), 0L)
    assert(rows() == first, "replayed epoch must pack identically")
  }

  test("latest-per-key table materialization updates across batches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, Long, String)]
    val cdc = in.toDF().toDF("RECID", "cdc_ts", "STATUS")
    val q = Pipelines.latestPerKey(cdc, "RECID", "cdc_ts", Seq("STATUS"))
      .writeStream.format("memory").queryName("latest_out")
      .outputMode("update").start()
    in.addData(("1", 1L, "NEW"), ("2", 1L, "NEW"))
    q.processAllAvailable()
    in.addData(("1", 2L, "AUTH")) // second batch updates key 1 only
    q.processAllAvailable()
    // update-mode memory sink appends updated rows: take last per key
    val out = spark.table("latest_out").collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) => k -> rows.maxBy(_.getLong(1)) }
    q.stop()
    assert(out("1").getString(2) == "AUTH" && out("1").getLong(1) == 2L)
    assert(out("2").getString(2) == "NEW")
  }

  test("parquet sink writes a streaming t24 pipeline end-to-end") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val in = MemoryStream[(String, Map[String, String])]
    val raw = in.toDF().toDF("RECID", "XMLRECORD")
    in.addData(("1", Map("F" -> "v1")), ("2", Map("F" -> "v2")))
    val q = Pipelines.parquetSink(
      Pipelines.t24Pipeline(raw, Seq(FieldSpec("F"))),
      s"$dir/out", s"$dir/ckpt").start()
    q.processAllAvailable()
    q.stop()
    val back = spark.read.parquet(s"$dir/out").orderBy("RECID").collect()
    assert(back.map(_.getString(1)).toSeq == Seq("v1", "v2"))
  }

  test("stream cell route matches the persisted index assignment exactly") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val emb = graft.sources.Tables.table(spark, sf, "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_route").toString
    graft.operators.Similarity.writeIvfIndex(emb, s"$dir/idx")
    // ground truth: the cells table the index build itself wrote
    val want = spark.read.parquet(s"$dir/idx/cells")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val rows = emb.select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val in = MemoryStream[(Long, Array[Float])]
    val q = Pipelines.streamCellRoute(
        in.toDS().toDF("vec_id", "embedding"), s"$dir/idx")
      .writeStream.format("memory").queryName("cell_route_out")
      .outputMode("append").start()
    in.addData(rows.take(40).toIndexedSeq)
    q.processAllAvailable()
    // replay the same epoch content in a later batch: stateless router
    // must produce the identical decisions
    in.addData(rows.take(10).toIndexedSeq)
    q.processAllAvailable()
    val got = spark.table("cell_route_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    q.stop()
    assert(got.length == 50)
    got.foreach { case (id, cell) =>
      assert(cell == want(id), s"vec $id routed to $cell, index says ${want(id)}")
    }
  }

  test("stream cell route at nlist 1024 matches the persisted cells, replay-identical") {
    // the regime the old inlined-literal router could not reach (~128
    // centroid Janino bound): 1024 centroids ride a codegen reference
    // object, and the route agrees with the index build's own cells
    // because both mount the same cellRouteExpr kernel
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dim = 16
    def vec(i: Long): Array[Float] = Array.tabulate(dim)(d =>
      (((i * 2654435761L + d * 40503L) % 1000L).toFloat - 500f) / 500f)
    val corpus = (0L until 1200L).map(i => (i, vec(i))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_route1k").toString
    graft.operators.Similarity.writeIvfIndex(corpus, s"$dir/idx", nlist = 1024)
    val want = spark.read.parquet(s"$dir/idx/cells")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val in = MemoryStream[(Long, Array[Float])]
    val q = Pipelines.streamCellRoute(
        in.toDS().toDF("vec_id", "embedding"), s"$dir/idx")
      .writeStream.format("memory").queryName("cell_route_1k")
      .outputMode("append").start()
    val rows = (0L until 60L).map(i => (i, vec(i)))
    in.addData(rows)
    q.processAllAvailable()
    in.addData(rows.take(10)) // replayed epoch content: identical routing
    q.processAllAvailable()
    val got = spark.table("cell_route_1k").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    q.stop()
    assert(got.length == 70)
    got.foreach { case (id, cell) =>
      assert(cell == want(id), s"vec $id routed to $cell, index says ${want(id)}")
    }
  }

  test("streamTurnValidate: drops each structural defect, keeps valid conversations, replays identically") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val convs = Seq(
      // (id, roles, bodies, expect-keep)
      (1L, Seq("user", "assistant"), Seq("hi", "hello"), true),
      (2L, Seq("user", "assistant", "user", "assistant"),
        Seq("q1", "a1", "q2", "a2"), true),
      (3L, Seq("assistant", "user"), Seq("hello", "hi"), false),        // wrong opener
      (4L, Seq("user", "user", "assistant"), Seq("a", "b", "c"), false), // broken alternation
      (5L, Seq("user", "assistant"), Seq("hi", ""), false),              // empty turn
      (6L, Seq("user", "assistant", "user"), Seq("q", "a", "q2"), false),// trailing user
      (7L, Seq("user"), Seq("alone"), false))                            // no exchange
    val in = MemoryStream[(Long, Seq[String], Seq[String])]
    val stream = in.toDF().toDF("conv_id", "roles", "bodies")
    val q = Pipelines.streamTurnValidate(stream)
      .writeStream.format("memory").queryName("turn_validate_out")
      .outputMode("append").start()
    in.addData(convs.map(c => (c._1, c._2, c._3)): _*)
    q.processAllAvailable()
    val kept1 = spark.table("turn_validate_out").collect()
      .map(_.getAs[Long]("conv_id")).toSeq
    assert(kept1.sorted == convs.filter(_._4).map(_._1),
      s"stream gate kept $kept1")
    // batch gate over the same rows through the SAME shared definition
    val batchKept = convs.map(c => (c._1, c._2, c._3))
      .toDF("conv_id", "roles", "bodies")
      .filter(graft.functions.Chat.valid(org.apache.spark.sql.functions.col("roles"),
        org.apache.spark.sql.functions.col("bodies")) === 1L)
      .collect().map(_.getAs[Long]("conv_id")).toSeq
    assert(kept1.sorted == batchKept.sorted, "stream and batch gates agree")
    // replay the same rows: a stateless deterministic gate makes the
    // identical decisions (what idempotent sink recovery requires)
    in.addData(convs.map(c => (c._1, c._2, c._3)): _*)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("turn_validate_out").collect()
      .map(_.getAs[Long]("conv_id")).toSeq
    assert(all.sorted == (kept1 ++ kept1).sorted, "replayed epoch decided identically")
  }

  test("streamPromptScreen: flags exactly the arrivals whose prompt the corpus already answers") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ref = SparkEntry.queries("d42_prompt_dedup")(spark, sf)
    val corpusDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    // arrivals: two with prompts lifted from real corpus docs (one
    // verbatim, one with a changed TAIL — same first 8 tokens, so the
    // prompt still matches), one genuinely novel
    val dup = corpusDocs.head
    val tailEdit = corpusDocs(1)
    val arrivals = Seq(
      (9001L, dup._2),
      (9002L, tailEdit._2 + " entirely different continuation of the answer"),
      (9003L, "completely novel question nobody in the corpus ever asked before today"))
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val q = Pipelines.streamPromptScreen(stream, ref)
      .writeStream.format("memory").queryName("prompt_screen_out")
      .outputMode("append").start()
    in.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val flagged = spark.table("prompt_screen_out").collect()
      .map(r => r.getAs[Long]("in_id") -> r.getAs[Long]("ref_id")).toMap
    assert(flagged.keySet == Set(9001L, 9002L),
      s"verbatim and tail-edited prompts flag, the novel one passes: $flagged")
    // the ref id is the group keeper d42 chose for that prompt
    val keepers = ref.collect()
      .map(r => r.getAs[Long]("prompt_fp") -> r.getAs[Long]("keep_id")).toMap
    flagged.values.foreach(rid => assert(keepers.values.exists(_ == rid)))
  }

  test("cmsSketchSink: merged epoch sketches equal the one-shot sketch; replay is a no-op") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.Cms
    val dir = java.nio.file.Files.createTempDirectory("graft_cms").toString
    val batch1 = Seq.tabulate(300)(i => s"k${i % 17}")
    val batch2 = Seq.tabulate(200)(i => s"k${i % 23}")
    val in = MemoryStream[String]
    val q = in.toDF().toDF("key")
      .writeStream.outputMode("append")
      .foreachBatch(Pipelines.cmsSketchSink(dir, "key"))
      .start()
    in.addData(batch1: _*)
    q.processAllAvailable()
    in.addData(batch2: _*)
    q.processAllAvailable()
    q.stop()
    // merged epochs == the sketch built in one shot over all the data
    val merged = Cms.readMergedSketch(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val oneShot = Cms.cells((batch1 ++ batch2).toDF("key"), "key")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == oneShot, "cell-wise merge must equal the one-shot sketch")
    // estimates from the merged sketch never undercount the true counts
    val exact = (batch1 ++ batch2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = Cms.estimates(Cms.readMergedSketch(spark, dir),
        exact.keys.toSeq.toDF("key"), "key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(est(k) >= n, s"$k estimated ${est(k)} < exact $n")
    }
    // replaying an epoch (same id, same content) leaves the merge unchanged
    Pipelines.cmsSketchSink(dir, "key")(batch1.toDF("key"), 0L)
    val again = Cms.readMergedSketch(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(again == merged, "epoch redelivery must be a no-op")
    // a never-inserted key must REPORT (est 0 over its empty cells via
    // the left join + coalesce), not silently vanish from the output
    val unseen = Cms.estimates(Cms.readMergedSketch(spark, dir),
        Seq("never-inserted-key-xyz").toDF("key"), "key")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(unseen.contains("never-inserted-key-xyz"),
      "unseen keys must not drop out of the estimate")
    assert(unseen("never-inserted-key-xyz") == 0L,
      "an unseen key with empty cells must estimate 0")
  }

  test("streamLangMix: the in-row stream report equals the batch d46 row-for-row") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val batch = SparkEntry.queries("d46_lang_mix")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_segments"), r.getAs[Long]("n_langs"),
          r.getAs[Boolean]("is_mixed"), r.getAs[String]("majority_lang")))).toMap
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamLangMix(in.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("lang_mix_out")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("lang_mix_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_segments"), r.getAs[Long]("n_langs"),
          r.getAs[Boolean]("is_mixed"), r.getAs[String]("majority_lang")))).toMap
    assert(got.size == batch.size)
    val diff = batch.keys.filter(k => got(k) != batch(k))
    assert(diff.isEmpty, s"stream/batch disagree on ${diff.take(3).map(k => (k, got(k), batch(k)))}")
  }

  test("streamEditVerify: verified pairs equal the batch band+Levenshtein derivation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(b.length + 1)(identity)
      for (i <- 1 to a.length) {
        var prev = dp(0); dp(0) = i
        for (j <- 1 to b.length) {
          val cur = dp(j)
          dp(j) = math.min(math.min(dp(j) + 1, dp(j - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = cur
        }
      }
      dp(b.length)
    }
    val maxDist = 64L
    val docsDf = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    val sigs = graft.operators.Dedup.minhashSignatures(docsDf).cache()
    // expected: ordered (in, match) pairs sharing >= 1 band, verified locally
    val prefix = docsDf.collect()
      .map(r => r.getLong(0) -> r.getString(1).take(256)).toMap
    val byBucket: Seq[Seq[Long]] = graft.operators.Dedup.minhashBands(sigs)
      .collect().toSeq
      .map(r => (r.getInt(1), r.getLong(2)) -> r.getLong(0))
      .groupBy(_._1).values.toSeq.map(_.map(_._2))
    val candPairs: Set[(Long, Long)] = byBucket.flatMap(ids =>
      for (a <- ids; b <- ids; if a != b) yield (a, b)).toSet
    val expected: Set[(Long, Long, Long)] = candPairs
      .map { case (a, b) => (a, b, lev(prefix(a), prefix(b)).toLong) }
      .filter(_._3 <= maxDist)
    assert(expected.nonEmpty, "test corpus should contain verified near-dups")
    val docs = docsDf.as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamEditVerify(
        in.toDF().toDF("doc_id", "text"), sigs, docsDf, maxDist)
      .writeStream.format("memory").queryName("edit_verify_out")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("edit_verify_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    sigs.unpersist()
    assert(got == expected,
      s"stream/batch disagree; stream-only=${(got -- expected).take(3)} " +
        s"batch-only=${(expected -- got).take(3)}")
  }

  test("streamPerplexityRoute: stream routing equals the batch fold; OOV floors at 1") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val docsDf = spark.read.parquet(s"$sf/documents.parquet").select("doc_id", "text")
    // the trained artifact: head vocab capped at 4096 (count desc, bigram asc)
    val vocab = docsDf
      .select(explode(graft.functions.Native.wordShingles(
        graft.functions.Text.tokens(lower(col("text"))), 2)).as("bg"))
      .groupBy("bg").count()
      .orderBy(col("count").desc, col("bg").asc).limit(4096)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val batch = Pipelines.streamPerplexityRoute(docsDf, vocab, t1 = 2.0, t2 = 5.0)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("mean_cf"), r.getAs[String]("bucket")))).toMap
    val docs = docsDf.as[(Long, String)].collect().toSeq
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamPerplexityRoute(
        in.toDF().toDF("doc_id", "text"), vocab, t1 = 2.0, t2 = 5.0)
      .writeStream.format("memory").queryName("ppl_route_out")
      .outputMode("append").start()
    in.addData(docs: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("ppl_route_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Double]("mean_cf"), r.getAs[String]("bucket")))).toMap
    assert(got.size == batch.size)
    val diff = batch.keys.filter(k => got(k) != batch(k))
    assert(diff.isEmpty, s"stream/batch disagree on ${diff.take(3).map(k => (k, got(k), batch(k)))}")
    assert(got.values.map(_._2).toSet.subsetOf(Set("tail", "middle", "head")))
    // an all-OOV document scores exactly the floor frequency 1 → tail
    val in2 = MemoryStream[(Long, String)]
    val q2 = Pipelines.streamPerplexityRoute(
        in2.toDF().toDF("doc_id", "text"), vocab, t1 = 2.0, t2 = 5.0)
      .writeStream.format("memory").queryName("ppl_route_oov")
      .outputMode("append").start()
    in2.addData((999L, "zzqx wvvk pqjm rrbn"))
    q2.processAllAvailable()
    q2.stop()
    val oov = spark.table("ppl_route_oov").collect().head
    assert(oov.getAs[Double]("mean_cf") == 1.0 && oov.getAs[String]("bucket") == "tail")
  }

  test("streamAudioScreen: loud clips pass, silence and garbage drop, stream stays up") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import graft.operators.WavCodec
    val loud = WavCodec.encode(8000,
      Array.tabulate[Short](200)(i => (if ((i / 4) % 2 == 0) 5000 else -5000).toShort))
    val silent = WavCodec.encodeUlaw(8000, Array.fill[Byte](100)(0xff.toByte))
    val quietAdpcm = WavCodec.encodeAdpcm(8000, Array.fill[Short](80)(100))
    val garbage = Array[Byte](1, 2, 3, 4)
    val in = MemoryStream[(Long, Array[Byte])]
    val q = Pipelines.streamAudioScreen(
      in.toDF().toDF("doc_id", "payload"), minRms = 500.0, maxSilenceRatio = 0.5)
      .writeStream.format("memory").queryName("audio_screen_out")
      .outputMode("append").start()
    in.addData(Seq((1L, loud), (2L, silent), (3L, quietAdpcm), (4L, garbage)): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("audio_screen_out").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(got == Map(1L -> true, 2L -> false, 3L -> false, 4L -> false),
      s"screen verdicts: $got")
  }

  test("streamBpeTokenize: arrivals tokenize exactly as the batch encoder with the trained merges") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val trainDocs = Seq(
      "low low low low lower lower newest newest newest newest",
      "newest newest widest widest widest new new nest").toDF("text")
    val merges = graft.operators.BpeTrain.train(trainDocs, "text", 8)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val arrivals = Seq(
      (1L, "the newest lower nest"),
      (2L, "widest new low"),
      (3L, ""),
      (4L, "unseen zebra words"))
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamBpeTokenize(in.toDF().toDF("doc_id", "text"), merges)
      .writeStream.format("memory").queryName("bpe_tok_out")
      .outputMode("append").start()
    in.addData(arrivals: _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table("bpe_tok_out").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_subwords"), r.getAs[Int]("n_chars")))).toMap
    // the independent expectation: encode each word with the same
    // rank-ordered merges, batch-side
    val expect = arrivals.map { case (id, text) =>
      val words = text.trim.split("\\s+").filter(_.nonEmpty)
      id -> ((words.map(w => graft.operators.BpeTrain.encode(w, merges).length).sum,
        text.length))
    }.toMap
    assert(got == expect)
    // trained merges must actually compress: "newest" was the most
    // frequent training word, so its subword count beats char-level
    assert(graft.operators.BpeTrain.encode("newest", merges).length <
      "newest".length + 1)
  }

  test("funnel stream: strict sequencing, first-reach emits, incremental state") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def run(name: String): Set[(Long, Int, Long)] = {
      val in = MemoryStream[FunnelEvent]
      val q = Pipelines.streamFunnel(in.toDS())
        .writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      // batch 1: u1 converts fully; u2's click PRECEDES its first view
      // (must not count) and its purchase precedes stage 2 (ditto);
      // u3 stops at click; u4 purchases with no funnel at all
      in.addData(
        FunnelEvent(1, "view", 100), FunnelEvent(1, "click", 200),
        FunnelEvent(1, "purchase", 300),
        FunnelEvent(2, "click", 100), FunnelEvent(2, "view", 200),
        FunnelEvent(3, "view", 100), FunnelEvent(3, "click", 150),
        FunnelEvent(3, "click", 120),
        FunnelEvent(4, "purchase", 50))
      q.processAllAvailable()
      // batches 2/3: u2 converts INCREMENTALLY across micro-batches —
      // the state carries its view, so the later click/purchase land
      in.addData(FunnelEvent(2, "click", 250))
      q.processAllAvailable()
      in.addData(FunnelEvent(2, "purchase", 400))
      q.processAllAvailable()
      val out = spark.table(name).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      q.stop()
      out
    }
    val first = run("funnel_out")
    assert(first == Set(
      (1L, 1, 100L), (1L, 2, 200L), (1L, 3, 300L),
      (2L, 1, 200L), (2L, 2, 250L), (2L, 3, 400L),
      (3L, 1, 100L), (3L, 2, 120L)),
      s"funnel advances wrong: $first")
    // u3's in-batch rows apply in ts order: the click at 120 reaches
    // stage 2 even though the 150 click sits earlier in arrival order
    assert(first.contains((3L, 2, 120L)))
    // replay: the same batch sequence re-emits identically
    assert(run("funnel_out_replay") == first, "replay must be deterministic")
  }

  test("mime route: stream sniffs match the batch kernel and replay identically") {
    import spark.implicits._
    import graft.operators.Multimodal
    implicit val ctx = spark.sqlContext
    val payloads: Seq[(Long, Array[Byte])] = Seq(
      1L -> (Multimodal.MagicPng ++ "pix".getBytes("US-ASCII")),
      2L -> (Multimodal.MagicRiff ++ Array[Byte](0, 0, 0, 0) ++ Multimodal.MagicWave),
      3L -> "plain prose".getBytes("US-ASCII"),
      4L -> (Multimodal.MagicY4m ++ " W2".getBytes("US-ASCII")))
    val in = MemoryStream[(Long, Array[Byte])]
    val stream = in.toDF().toDF("doc_id", "payload")
    val q = Pipelines.streamMimeRoute(stream)
      .select("doc_id", "mime", "route")
      .writeStream.format("memory").queryName("mime_route_out")
      .outputMode("append").start()
    in.addData(payloads: _*)
    q.processAllAvailable()
    val out = spark.table("mime_route_out").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    q.stop()
    assert(out == Map(
      1L -> ("image/png", "image"), 2L -> ("audio/x-wav", "audio"),
      3L -> ("text/plain", "text"), 4L -> ("video/x-yuv4mpeg", "video")))
    // stateless per-row expression: the same rows as a batch frame
    // route identically (replay stability under recovery)
    val replay = Pipelines.streamMimeRoute(payloads.toDF("doc_id", "payload"))
      .select("doc_id", "mime", "route").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2))).toMap
    assert(replay == out, "replayed rows must route identically")
  }

  test("anomaly stream: flags equal the batch q67 verdicts; unknown users never flag") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // the batch-trained artifact: per-user history sums over hourly counts
    val hourly = graft.sources.Tables.table(spark, sf, "events")
      .selectExpr("user_id", "(ts div 1000) div 3600000000 AS hour")
      .groupBy("user_id", "hour").agg(count(lit(1)).as("cnt"))
    val stats = hourly.groupBy("user_id")
      .agg(count(lit(1)).as("n_hours"), sum(col("cnt")).as("s1"),
        sum(col("cnt") * col("cnt")).as("s2"))
    val rows = hourly.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val in = MemoryStream[(Long, Long, Long)]
    val q = Pipelines.streamAnomaly(
        in.toDF().toDF("user_id", "hour", "cnt"), stats)
      .writeStream.format("memory").queryName("anomaly_out")
      .outputMode("append").start()
    in.addData(rows :+ ((999999L, 0L, 1000L)): _*) // the no-history user
    q.processAllAvailable()
    val out = spark.table("anomaly_out").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(3)).toMap
    q.stop()
    val batchFlagged = SparkEntry.queries("q67_anomaly")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.filter(_._2).keySet == batchFlagged,
      "stream flags must equal the batch q67 flagged set")
    assert(out((999999L, 0L)) == false, "no history must mean no flag")
    assert(out.size == rows.size + 1, "every arriving row must pass through")
  }

  test("streamClusterSplit routes exactly like the batch d81 verdicts") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val sf = "/root/testdata/sf0.001"
    val batch = SparkEntry.queries("d81_cluster_split")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(3))).toMap
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val cm = graft.operators.Dedup.clusterMap(docs)
    val in = MemoryStream[Long]
    val q = Pipelines.streamClusterSplit(in.toDF().toDF("doc_id"), cm)
      .writeStream.format("memory").queryName("split_out")
      .outputMode("append").start()
    in.addData(batch.keys.toSeq: _*)
    q.processAllAvailable()
    val streamed = spark.table("split_out").collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    q.stop()
    assert(streamed == batch,
      "stream routing must equal the batch split verdicts doc for doc")
    // a doc the map has never seen routes by its own id (singleton rule)
    val q2 = Pipelines.streamClusterSplit(in.toDF().toDF("doc_id"), cm)
      .writeStream.format("memory").queryName("split_out2")
      .outputMode("append").start()
    in.addData(987654321L)
    q2.processAllAvailable()
    val fresh = spark.table("split_out2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    q2.stop()
    assert(fresh(987654321L) == 987654321L, "unseen doc must self-cluster")
  }

  test("CDC apply onto the COW table: upsert, delete, replayed epoch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_apply")
      .toString + "/table"
    val sink = Pipelines.mergeApplySink(dir, "recid", "ts")
    val in = MemoryStream[(Long, Long, String, String)]
    val q = in.toDF().toDF("recid", "ts", "op", "payload")
      .writeStream.foreachBatch(sink).outputMode("append").start()
    // epoch 0: inserts, incl. TWO updates to key 2 — the newer wins
    in.addData((1L, 10L, "U", "a1"), (2L, 10L, "U", "b1"),
      (2L, 11L, "U", "b2"), (3L, 10L, "U", "c1"))
    q.processAllAvailable()
    // epoch 1: cross-epoch update of 1, DELETE of 3, new key 4
    val e1 = Seq((1L, 20L, "U", "a2"), (3L, 20L, "D", "x"),
      (4L, 20L, "U", "d1"))
    in.addData(e1: _*)
    q.processAllAvailable()
    q.stop()
    def state() = graft.sources.MergeTable.read(spark, dir).collect()
      .map(r => r.getAs[Long]("recid") ->
        (r.getAs[Long]("ts"), r.getAs[String]("payload"))).toMap
    val applied = state()
    assert(applied == Map(1L -> (20L, "a2"), 2L -> (11L, "b2"),
      4L -> (20L, "d1")), s"got $applied")
    // ONE commit per epoch: the creating epoch is v0, and epoch 1's
    // upserts AND delete landed through applyBatch as v1 — never the
    // old merge-then-deleteKeys two-version churn
    assert(graft.sources.MergeTable.latestVersion(spark, dir) == 1,
      "an epoch with upserts and deletes must land as ONE version")
    // failure-recovery redelivery of epoch 1: content must not change
    // (the version counter advances by exactly the one replayed
    // commit; CONTENT is the reader's truth)
    val vBefore = graft.sources.MergeTable.latestVersion(spark, dir)
    sink(e1.toDF("recid", "ts", "op", "payload"), 1L)
    assert(state() == applied, "double-applied epoch changed the table")
    assert(graft.sources.MergeTable.latestVersion(spark, dir) == vBefore + 1)
    // the pre-delete snapshot still shows key 3 (time travel intact)
    val v1 = graft.sources.MergeTable.read(spark, dir, 0).collect()
      .map(_.getAs[Long]("recid")).toSet
    assert(v1.contains(3L), "version 0 must still hold the deleted key")
  }

  test("streamChunkScreen verdicts equal the batch kernel + store join") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val docs = graft.sources.Tables.table(spark, sf, "documents")
    val store = docs
      .select(explode(graft.operators.Chunking.chunkSigs(col("text"))).as("c"))
      .select(col("c.sig").as("sig"), col("c.n_toks").as("n_toks")).distinct()
    val corpusText = docs.filter(trim(col("text")) =!= "")
      .orderBy("doc_id").select("text").as[String].head()
    val novelText = (1 to 40).map(i => s"zzqx$i glorpwib$i").mkString(" ")
    // a NULL-text record must chunk to NOTHING, not a garbage row
    val incoming = Seq((900001L, corpusText), (900002L, novelText),
      (900003L, null.asInstanceOf[String]))
    val expected = incoming.toDF("doc_id", "text")
      .select(col("doc_id").as("in_id"),
        posexplode(graft.operators.Chunking.chunkSigs(col("text")))
          .as(Seq("chunk_idx", "c")))
      .select(col("in_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("c.n_toks").as("n_toks"), col("c.sig").as("sig"))
      .join(store.withColumn("__hit", lit(1L)), Seq("sig", "n_toks"), "left_outer")
      .select(col("in_id"), col("chunk_idx"), col("n_toks"), col("sig"),
        (coalesce(col("__hit"), lit(0L)) === 1L).as("is_dup"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    val in = MemoryStream[(Long, String)]
    val q = Pipelines.streamChunkScreen(
      in.toDF().toDF("doc_id", "text"), store)
      .writeStream.format("memory").queryName("chunk_screen")
      .outputMode("append").start()
    in.addData(incoming: _*)
    q.processAllAvailable()
    val streamed = spark.table("chunk_screen").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4))).toSet
    q.stop()
    assert(streamed == expected, "stream verdicts must equal the batch join")
    // a verbatim corpus doc flags on every chunk; gibberish on none;
    // the NULL-text record emits no rows at all
    assert(streamed.filter(_._1 == 900001L).forall(_._5))
    assert(streamed.filter(_._1 == 900002L).forall(!_._5))
    assert(!streamed.exists(_._1 == 900003L),
      "null text must not fabricate chunk rows")
  }

  test("change stream follows a MergeTable: versions as offsets, checkpointed restart") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_stream").toString
    val path = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    MergeTable.create(
      (0L until 20L).map(k => (k, s"v$k")).toDF("id", "payload")
        .repartitionByRange(2, col("id")),
      path, statsCol = Some("id"))
    // memory sinks cannot recover from a checkpoint — collect via
    // foreachBatch (which can) so the restart leg is a real restart
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Long, Int)]
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = df.collect().map(r => (r.getAs[String]("_change_type"),
        r.getAs[Long]("id"), r.getAs[Int]("_commit_version")))
      buf.synchronized { buf ++= rows }
    }
    def start() = MergeTable.changeStream(spark, path, "id", startingVersion = 0)
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    val q1 = start()
    try {
      // no new versions yet: the source must report no offset
      q1.processAllAvailable()
      assert(buf.synchronized(buf.isEmpty))
      // epoch 1: one update + one insert
      MergeTable.merge(spark, path,
        Seq((3L, "U3"), (100L, "NEW")).toDF("id", "payload"), "id")
      q1.processAllAvailable()
      assert(buf.synchronized(buf.toSet) ==
        Set(("update_preimage", 3L, 1), ("update_postimage", 3L, 1),
          ("insert", 100L, 1)))
      // epoch 2: a merge-on-read delete rides the same feed
      MergeTable.deleteKeysMor(spark, path, Seq(7L).toDF("id"), "id")
      q1.processAllAvailable()
      assert(buf.synchronized(buf.toSet).map(t => (t._1, t._2))
        .contains(("delete", 7L)))
      assert(buf.synchronized(buf.size) == 4)
    } finally q1.stop()
    // epoch 3 lands while the stream is DOWN; the restarted stream
    // must emit exactly the uncovered span (checkpointed offset = v2)
    buf.synchronized(buf.clear())
    MergeTable.merge(spark, path, Seq((11L, "U11")).toDF("id", "payload"), "id")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(buf.synchronized(buf.toSet) ==
        Set(("update_preimage", 11L, 3), ("update_postimage", 11L, 3)),
        s"restart must resume at the checkpoint, got ${buf.synchronized(buf.toSet)}")
    } finally q2.stop()
  }

  test("change stream default start: only NEW changes, history untouched") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_tail").toString
    val path = s"$dir/table"
    MergeTable.create(
      (0L until 10L).map(k => (k, s"v$k")).toDF("id", "payload"), path,
      statsCol = Some("id"))
    MergeTable.merge(spark, path, Seq((1L, "OLD")).toDF("id", "payload"), "id")
    // default startingVersion = current latest (1): the pre-existing
    // epoch must NOT replay
    val q = MergeTable.changeStream(spark, path, "id")
      .writeStream.format("memory").queryName("cdf_tail")
      .option("checkpointLocation", s"$dir/ckpt").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cdf_tail").count() == 0)
      MergeTable.merge(spark, path, Seq((2L, "NEW")).toDF("id", "payload"), "id")
      q.processAllAvailable()
      val got = spark.table("cdf_tail").collect()
        .map(r => (r.getAs[String]("_change_type"), r.getAs[Long]("id"))).toSet
      assert(got == Set(("update_preimage", 2L), ("update_postimage", 2L)))
    } finally q.stop()
  }

  test("default-start change stream latches its floor in the checkpoint") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_latch").toString
    val path = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    MergeTable.create(
      (0L until 10L).map(k => (k, s"v$k")).toDF("id", "payload"), path,
      statsCol = Some("id"))
    val buf = new scala.collection.mutable.ArrayBuffer[(String, Long)]
    def sink(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val rows = df.collect().map(r =>
        (r.getAs[String]("_change_type"), r.getAs[Long]("id")))
      buf.synchronized { buf ++= rows }
    }
    def start() = MergeTable.changeStream(spark, path, "id")
      .writeStream.foreachBatch(sink _)
      .option("checkpointLocation", ckpt).start()
    // first start latches the floor at the CURRENT latest (0)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    assert(buf.synchronized(buf.isEmpty))
    // epochs land while the stream is DOWN; a restart that re-latched
    // "latest" would withhold them forever on a then-quiescent table
    MergeTable.merge(spark, path, Seq((1L, "U1")).toDF("id", "payload"), "id")
    MergeTable.merge(spark, path, Seq((2L, "U2")).toDF("id", "payload"), "id")
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(buf.synchronized(buf.toSet) == Set(
        ("update_preimage", 1L), ("update_postimage", 1L),
        ("update_preimage", 2L), ("update_postimage", 2L)),
        s"offline epochs must replay from the latched floor, got ${buf.synchronized(buf.toSet)}")
    } finally q2.stop()
  }

  test("change-stream replication: follow table A, apply into table B, converge") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_repl").toString
    val a = s"$dir/a"
    val b = s"$dir/b"
    MergeTable.create(
      (0L until 20L).map(k => (k, s"v$k")).toDF("id", "payload"), a,
      statsCol = Some("id"))
    // the CDF rows become a CDC batch for the apply sink: postimages
    // and inserts upsert, deletes delete, preimages drop; the commit
    // version is the per-key ordering timestamp
    val apply = Pipelines.mergeApplySink(b, "id", "_commit_version")
    val q = MergeTable.changeStream(spark, a, "id", startingVersion = 0)
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("op",
        when(col("_change_type") === "delete", "D").otherwise("U"))
      .drop("_change_type")
      .writeStream.foreachBatch(apply)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      def aRows() = MergeTable.read(spark, a).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
      def bRows() = MergeTable.read(spark, b).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
      // B does not exist until the first change flows; seed via one epoch
      MergeTable.merge(spark, a,
        Seq((3L, "U3"), (50L, "NEW50")).toDF("id", "payload"), "id")
      q.processAllAvailable()
      // replication starts from the CHANGES, so B holds the changed
      // keys only until a full-history stream is used — use content
      // equality on the touched keys here
      assert(bRows() == Set((3L, "U3"), (50L, "NEW50")))
      // more epochs: update, insert, MOR delete — B follows
      MergeTable.merge(spark, a,
        Seq((3L, "U3b"), (51L, "NEW51")).toDF("id", "payload"), "id")
      MergeTable.deleteKeysMor(spark, a, Seq(50L).toDF("id"), "id")
      q.processAllAvailable()
      assert(bRows() == Set((3L, "U3b"), (51L, "NEW51")))
      assert(aRows().intersect(bRows()) == bRows(),
        "replica rows must agree with the source on every followed key")
    } finally q.stop()
  }

  test("two-format replication: mergetable-changes into mergetable-apply") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_fmt_repl").toString
    val a = s"$dir/a"
    val b = s"$dir/b"
    MergeTable.create(
      (0L until 10L).map(k => (k, s"v$k")).toDF("id", "payload"), a,
      statsCol = Some("id"))
    val q = MergeTable.changeStream(spark, a, "id", startingVersion = 0)
      .filter(col("_change_type") =!= "update_preimage")
      .withColumn("op",
        when(col("_change_type") === "delete", "D").otherwise("U"))
      .drop("_change_type")
      .writeStream.format("mergetable-apply")
      .option("path", b).option("key", "id").option("ts", "_commit_version")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      MergeTable.merge(spark, a,
        Seq((2L, "U2"), (90L, "NEW")).toDF("id", "payload"), "id")
      q.processAllAvailable()
      def bRows() = MergeTable.read(spark, b).collect()
        .map(r => (r.getAs[Long]("id"), r.getAs[String]("payload"))).toSet
      assert(bRows() == Set((2L, "U2"), (90L, "NEW")))
      MergeTable.deleteKeysMor(spark, a, Seq(90L).toDF("id"), "id")
      MergeTable.merge(spark, a, Seq((2L, "U2b")).toDF("id", "payload"), "id")
      q.processAllAvailable()
      assert(bRows() == Set((2L, "U2b")))
    } finally q.stop()
    // a missing required option fails at start, not mid-stream
    val ex = intercept[Exception] {
      MergeTable.changeStream(spark, a, "id")
        .writeStream.format("mergetable-apply")
        .option("path", b)
        .option("checkpointLocation", s"$dir/ckpt2").start()
    }
    assert(ex.getMessage.contains("key") ||
      Option(ex.getCause).exists(_.getMessage.contains("key")))
  }

  test("change stream fails loudly when vacuum outran the checkpoint") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("graft_cdf_vac").toString
    val path = s"$dir/table"
    val ckpt = s"$dir/ckpt"
    MergeTable.create(
      (0L until 10L).map(k => (k, s"v$k")).toDF("id", "payload"), path,
      statsCol = Some("id"))
    def start(n: String) = MergeTable.changeStream(spark, path, "id",
        startingVersion = 0)
      .writeStream.foreachBatch((df: org.apache.spark.sql.DataFrame,
        _: Long) => { df.count(); () })
      .option("checkpointLocation", ckpt).start()
    val q1 = start("a")
    try {
      MergeTable.merge(spark, path, Seq((1L, "U1")).toDF("id", "payload"), "id")
      q1.processAllAvailable()
    } finally q1.stop()
    // two more epochs, then vacuum down to ONLY the newest version:
    // the checkpointed v1 watermark's history is gone
    MergeTable.merge(spark, path, Seq((2L, "U2")).toDF("id", "payload"), "id")
    MergeTable.merge(spark, path, Seq((3L, "U3")).toDF("id", "payload"), "id")
    MergeTable.vacuum(spark, path, keepVersions = 1, minAgeMs = 0)
    val q2 = start("b")
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
      q2.awaitTermination(10000)
    }
    q2.stop()
    assert(ex.getMessage.contains("re-seed") ||
      Option(ex.getCause).exists(_.getMessage.contains("re-seed")),
      s"must fail with the re-seed guidance, got: ${ex.getMessage}")
  }

  test("E2E: the reference loop — RAW decode → COW table + rollup → point lookup") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    import org.apache.spark.sql.functions._
    import graft.sources.MergeTable
    import graft.operators.IncrementalView
    // the reference's whole production system in one chain: T24 RAW
    // records (RECID + XMLRECORD map) decode through the schema
    // pipeline, land on the STRING-keyed COW table with a maintained
    // rollup, and serve point lookups from candidate files only
    val in = MemoryStream[(String, Map[String, String])]
    val raw = in.toDF().toDF("RECID", "XMLRECORD")
    val schema = Seq(FieldSpec("OP"), FieldSpec("GRP"),
      FieldSpec("AMT"), FieldSpec("TS"))
    val decoded = Pipelines.t24Pipeline(raw, schema)
      .select(col("RECID"), col("TS").cast("long").as("ts"),
        col("OP").as("op"), col("GRP").as("grp"),
        col("AMT").cast("double").as("amt"))
    val root = java.nio.file.Files.createTempDirectory("e2e_loop").toString
    val dir = s"$root/table"; val mvDir = s"$root/mv"
    val q = decoded.writeStream
      .foreachBatch(Pipelines.mergeApplyWithMvSink(
        dir, mvDir, "RECID", "ts", "grp", "amt"))
      .outputMode("append").start()
    def rec(id: String, op: String, grp: String, amt: String, ts: String) =
      (id, Map("OP" -> op, "GRP" -> grp, "AMT" -> amt, "TS" -> ts))
    in.addData(rec("ACC1", "U", "retail", "10.5", "1"),
      rec("ACC2", "U", "retail", "2.0", "1"),
      rec("ACC3", "U", "corp", "7.0", "1"))
    q.processAllAvailable()
    in.addData(rec("ACC2", "U", "corp", "3.5", "2"),   // group flip
      rec("ACC3", "D", "corp", "0", "2"),              // delete marker
      rec("ACC4", "U", "retail", "1.0", "2"))          // insert
    q.processAllAvailable()
    q.stop()
    // the table holds the latest state per RECID
    val now = MergeTable.read(spark, dir).collect()
      .map(r => r.getAs[String]("RECID") ->
        (r.getAs[String]("grp"), r.getAs[Double]("amt"))).toMap
    assert(now == Map("ACC1" -> ("retail", 10.5), "ACC2" -> ("corp", 3.5),
      "ACC4" -> ("retail", 1.0)), s"got $now")
    // STRING range stats are tracked (the manifest names RECID)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v = MergeTable.latestVersion(spark, dir)
    val inM = fs.open(new org.apache.hadoop.fs.Path(dir, f"manifest-$v%010d.txt"))
    val mtx = try scala.io.Source.fromInputStream(inM).mkString finally inM.close()
    assert(mtx.split("\n")(1) == "RECID", "string key must be stats-tracked")
    // the maintained rollup equals the direct recompute
    val direct = MergeTable.read(spark, dir).groupBy("grp")
      .agg(count(lit(1)), sum(col("amt").cast("decimal(20,4)")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString)).toMap
    val mv = IncrementalView.read(spark, mvDir).collect()
      .map(r => r.getAs[String]("grp") -> (r.getAs[Long]("n_rows"),
        r.getAs[java.math.BigDecimal]("sum_val")
          .stripTrailingZeros.toPlainString)).toMap
    assert(mv == direct, s"rollup must track the table: $mv vs $direct")
    // point lookup serves current records by RECID batch
    val got = MergeTable.readKeys(spark, dir,
      Seq("ACC2", "ACC4", "NOPE").toDF("RECID"), "RECID").collect()
      .map(r => r.getAs[String]("RECID") -> r.getAs[Double]("amt")).toMap
    assert(got == Map("ACC2" -> 3.5, "ACC4" -> 1.0))
  }

  test("mergeApplyWithMvSink keeps the rollup equal to the table at every epoch") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.operators.IncrementalView
    import graft.sources.MergeTable
    val root = java.nio.file.Files.createTempDirectory("cdc_mv").toString
    val dir = s"$root/table"; val mvDir = s"$root/mv"
    val sink = Pipelines.mergeApplyWithMvSink(dir, mvDir, "recid", "ts", "grp", "amt")
    def check(): Unit = {
      val direct = MergeTable.read(spark, dir)
        .groupBy("grp").agg(count(lit(1)), sum(col("amt").cast("decimal(20,4)")))
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getDecimal(2).stripTrailingZeros.toPlainString)).toMap
      val mv = IncrementalView.read(spark, mvDir).collect()
        .map(r => r.getAs[String]("grp") -> (r.getAs[Long]("n_rows"),
          r.getAs[java.math.BigDecimal]("sum_val")
            .stripTrailingZeros.toPlainString)).toMap
      assert(mv == direct, s"MV must equal the table's rollup: $mv vs $direct")
    }
    sink(Seq((1L, 10L, "U", "a", 5.5), (2L, 10L, "U", "b", 2.0),
      (2L, 11L, "U", "b", 3.0)).toDF("recid", "ts", "op", "grp", "amt"), 0L)
    check()
    // epoch 1: update flips key 1's group, delete key 2, insert key 3
    val e1 = Seq((1L, 20L, "U", "b", 7.25), (2L, 20L, "D", "b", 0.0),
      (3L, 20L, "U", "c", 1.0)).toDF("recid", "ts", "op", "grp", "amt")
    sink(e1, 1L)
    check()
    // replayed epoch: table content unchanged, MV unchanged
    val before = IncrementalView.read(spark, mvDir).collect().toSet
    sink(e1, 1L)
    check()
    assert(IncrementalView.read(spark, mvDir).collect().toSet == before)
  }

  test("CDC apply survives a racing optimize maintainer mid-epoch (OCC retry)") {
    import spark.implicits._
    import graft.sources.MergeTable
    val dir = java.nio.file.Files.createTempDirectory("cdc_race")
      .toString + "/table"
    val sink = Pipelines.mergeApplySink(dir, "recid", "ts")
    // seed epochs: a small-file tail the maintainer will want
    sink(Seq((1L, 10L, "U", "a1"), (2L, 10L, "U", "b1"))
      .toDF("recid", "ts", "op", "payload"), 0L)
    sink(Seq((3L, 11L, "U", "c1")).toDF("recid", "ts", "op", "payload"), 1L)
    sink(Seq((4L, 12L, "U", "d1")).toDF("recid", "ts", "op", "payload"), 2L)
    val vBefore = MergeTable.latestVersion(spark, dir)
    // the maintainer compacts BETWEEN this epoch's manifest read and
    // its publish — exactly the production race the stream must
    // survive (pre-fix: VersionConflict crashed the query)
    MergeTable.midCommitHook = () =>
      assert(MergeTable.optimize(spark, dir) > vBefore,
        "the injected maintainer must actually land a version")
    sink(Seq((1L, 20L, "U", "a2"), (5L, 20L, "U", "e1"))
      .toDF("recid", "ts", "op", "payload"), 3L)
    val applied = MergeTable.read(spark, dir).collect()
      .map(r => r.getAs[Long]("recid") -> r.getAs[String]("payload")).toMap
    assert(applied == Map(1L -> "a2", 2L -> "b1", 3L -> "c1",
      4L -> "d1", 5L -> "e1"),
      s"the epoch must land with correct content past the maintainer: $applied")
  }
}
