package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FieldSpec, SchemaConverter}
import graft.sources.Tables

class SourcesSpec extends AnyFunSuite {
  import SparkTest._

  test("driver testdata honors the engine's normalized schema contract") {
    // The driver regenerates /root/testdata between rounds and physical
    // types have drifted (round 6: events.ts TIMESTAMP(NANOS) →
    // TIMESTAMP(MICROS), which silently broke every ts-nanos query
    // while oracles kept passing). Tables.table normalizes events.ts
    // back to Long nanos; this asserts the post-normalization contract
    // for every column queries do arithmetic on, so the NEXT generation
    // drift fails here, loudly, instead of deep inside a query.
    val expect = Map(
      "events" -> Map("event_id" -> LongType, "ts" -> LongType,
        "user_id" -> LongType, "value" -> DoubleType),
      "lineitem" -> Map("l_orderkey" -> LongType, "l_quantity" -> DoubleType,
        "l_extendedprice" -> DoubleType, "l_shipdate" -> TimestampNTZType),
      "orders" -> Map("o_orderkey" -> LongType, "o_totalprice" -> DoubleType,
        "o_orderdate" -> TimestampNTZType),
      "customer" -> Map("c_custkey" -> LongType, "c_acctbal" -> DoubleType),
      "supplier" -> Map("s_suppkey" -> LongType),
      "part" -> Map("p_partkey" -> LongType, "p_size" -> IntegerType,
        "p_retailprice" -> DoubleType),
      "nation" -> Map("n_nationkey" -> IntegerType),
      "region" -> Map("r_regionkey" -> IntegerType),
      "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
        "n_chars" -> LongType),
      "embeddings" -> Map("vec_id" -> LongType,
        "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
    val drift = for {
      (t, cols) <- expect.toSeq
      schema = Tables.table(spark, sf, t).schema
      (c, want) <- cols
      got = schema(c).dataType if got != want
    } yield s"$t.$c: expected $want, got $got"
    assert(drift.isEmpty,
      s"testdata schema drift (regenerate or extend Tables.table normalization):\n  ${drift.mkString("\n  ")}")
  }

  test("csv source round-trips with schema inference and explicit schema") {
    val dir = Files.createTempDirectory("graft_csv").toString
    val orig = Tables.table(spark, sf, "nation")
    orig.write.option("header", "true").csv(s"$dir/nation")
    val inferred = Tables.csv(spark, s"$dir/nation")
    assert(inferred.count() == orig.count())
    assert(inferred.schema("n_nationkey").dataType == IntegerType)
    val explicit = Tables.csv(spark, s"$dir/nation", Some(StructType(Seq(
      StructField("n_nationkey", LongType), StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))))
    assert(explicit.schema("n_nationkey").dataType == LongType)
    assert(explicit.agg(sum("n_nationkey")).head.getLong(0) ==
      orig.agg(sum(col("n_nationkey").cast("long"))).head.getLong(0))
  }

  test("binaryFile source feeds the multimodal decoders end-to-end") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bin").toString
    Files.createDirectories(java.nio.file.Paths.get(s"$dir/nested"))
    val rgb = Array.tabulate[Byte](2 * 1 * 3)(i => (i * 10).toByte)
    Files.write(java.nio.file.Paths.get(s"$dir/a.ppm"),
      graft.operators.PpmCodec.encode(2, 1, rgb))
    Files.write(java.nio.file.Paths.get(s"$dir/nested/b.ppm"),
      graft.operators.PpmCodec.encode(1, 1, Array[Byte](5, 5, 5)))
    Files.write(java.nio.file.Paths.get(s"$dir/skip.txt"),
      "not an image".getBytes)
    val files = Tables.binaryCorpus(spark, dir, glob = "*.ppm")
    // the glob filters at LISTING time: the txt file is never opened
    assert(files.count() == 2, "glob must keep only the ppm files")
    assert(files.schema.fieldNames.toSet ==
      Set("path", "modificationTime", "length", "content"))
    // raw files → binary rows → the m2 decode chain, end-to-end
    val media = files.orderBy("path")
      .select(monotonically_increasing_id().as("id"), col("content"))
      .as[(Long, Array[Byte])]
    val decoded = graft.operators.Multimodal.decodeImages(media)
      .collect().sortBy(_.id)
    assert(decoded.length == 2)
    assert(decoded(0).width.contains(2) && decoded(0).height.contains(1))
    assert(decoded(1).width.contains(1) && decoded(1).mean_r.contains(5.0))
  }

  test("json source round-trips with schema inference") {
    val dir = Files.createTempDirectory("graft_json").toString
    val orig = Tables.table(spark, sf, "region")
    orig.write.json(s"$dir/region")
    val back = Tables.json(spark, s"$dir/region")
    assert(back.count() == orig.count())
    assert(back.select("r_name").collect().map(_.getString(0)).sorted.toSeq ==
      orig.select("r_name").collect().map(_.getString(0)).sorted.toSeq)
  }

  test("sink DDL emission mirrors the compiled schema") {
    val schema = Seq(
      FieldSpec("NAME"),
      FieldSpec("D", dataType = "date", transformation = "parse_date"),
      FieldSpec("LOCALREF_N", dataType = "int"))
    val ddl = SchemaConverter.sinkDdl(schema, "t24_sink")
    assert(ddl.contains("CREATE TABLE t24_sink"))
    assert(ddl.contains("RECID STRING"))
    assert(ddl.contains("NAME STRING") && ddl.contains("D DATE") && ddl.contains("N INT"))
    // the DDL must be valid Spark SQL
    spark.sql(ddl.replace("t24_sink", s"t24_sink_${System.nanoTime()}"))
  }

  test("co-bucketed tables join without a shuffle") {
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      Tables.writeBucketed(Tables.table(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 4)
      Tables.writeBucketed(Tables.table(spark, sf, "orders")
        .select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 4)
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("partitioned layout prunes non-matching partitions at scan") {
    val dir = Files.createTempDirectory("graft_part").toString
    Tables.writePartitioned(
      Tables.table(spark, sf, "documents").select("doc_id", "n_chars", "lang"),
      s"$dir/docs", "lang")
    val q = spark.read.parquet(s"$dir/docs").filter(col("lang") === "en")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    assert(plan.contains("lang"), "partition filter on lang expected")
    val expected = Tables.table(spark, sf, "documents")
      .filter(col("lang") === "en").count()
    assert(q.count() == expected)
  }

  test("sharded layout: deterministic assignment, one file per shard, prunable") {
    val dir = Files.createTempDirectory("graft_shard").toString
    val docs = Tables.table(spark, sf, "documents")
      .select("doc_id", "lang", "n_chars")
    Tables.writeSharded(docs, s"$dir/a", "doc_id", nShards = 8)
    // re-writing (under a different upstream partitioning) must assign
    // every row to the SAME shard — the property shard-level retries
    // and incremental re-runs depend on
    Tables.writeSharded(docs.repartition(13), s"$dir/b", "doc_id", nShards = 8)
    val a = spark.read.parquet(s"$dir/a").select("doc_id", "shard")
    val b = spark.read.parquet(s"$dir/b").select("doc_id", "shard")
    assert(a.join(b, "doc_id")
      .filter(a("shard") =!= b("shard")).count() == 0,
      "shard assignment must be deterministic across writes")
    // all rows preserved, every shard directory holds exactly one file
    assert(a.count() == docs.count())
    val shardDirs = new java.io.File(s"$dir/a").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard="))
    assert(shardDirs.length == 8, s"expected 8 shard dirs, got ${shardDirs.length}")
    shardDirs.foreach { sd =>
      val files = sd.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files == 1, s"${sd.getName}: expected one file per shard, got $files")
    }
    // a shard filter prunes to one directory
    val q = spark.read.parquet(s"$dir/a").filter(col("shard") === 3)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("shard"), plan)
  }

  test("compaction collapses a small-files directory, preserving rows") {
    val dir = Files.createTempDirectory("graft_compact").toString
    val docs = Tables.table(spark, sf, "documents").select("doc_id", "n_chars")
    docs.repartition(40).write.parquet(s"$dir/small")   // 40 tiny files
    val before = new java.io.File(s"$dir/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before >= 20, s"expected many small files, got $before")
    Tables.compact(spark, s"$dir/small", s"$dir/compacted")
    val after = new java.io.File(s"$dir/compacted").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after < before / 4, s"compaction left $after files (was $before)")
    assert(spark.read.parquet(s"$dir/compacted").count() == docs.count())
  }

  test("schema evolution: mergeSchema unions parquet schemas across batches") {
    val dir = Files.createTempDirectory("graft_evolve").toString
    val docs = Tables.table(spark, sf, "documents")
    docs.select("doc_id", "lang").write.parquet(s"$dir/t/batch=1")
    docs.select("doc_id", "lang", "n_chars").write.parquet(s"$dir/t/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "batch"))
    // rows from the old schema surface the new column as null
    assert(merged.filter(col("batch") === 1 && col("n_chars").isNull).count() ==
      docs.count())
  }

  test("orc source round-trips and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft_orc").toString
    val docs = Tables.table(spark, sf, "documents")
    Tables.writeOrc(docs, s"$dir/docs_orc")
    val back = Tables.orc(spark, s"$dir/docs_orc")
    assert(back.schema == docs.schema)
    assert(back.count() == docs.count())
    // values survive the roundtrip bit-for-bit
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = back.orderBy("doc_id").collect().map(_.toString)
    assert(a.sameElements(b))
    // predicate reaches the ORC scan like the parquet path
    val plan = back.filter(col("doc_id") === 7).queryExecution
      .executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("doc_id"),
      s"ORC scan must carry pushed filters:\n$plan")
  }

  test("multivalue sink DDL includes the position column") {
    val schema = Seq(
      FieldSpec("NAME"),
      FieldSpec("MV", parseSv = false, parseVm = true))
    val ddl = SchemaConverter.sinkDdl(schema, "t24_mv_sink", multivalue = true)
    assert(ddl.contains(s"${SchemaConverter.MvPos} INT"))
    assert(ddl.contains("MV STRING"))
  }

  test("events.ts normalization is session-timezone independent") {
    // the NTZ epoch extraction must be pure field arithmetic — a
    // NTZ->LTZ cast would shift every ts by the local offset when the
    // session is not pinned to UTC (Engine.configure pins it, but
    // Tables.table is public API callable from any session)
    import org.apache.spark.sql.functions.{min, max}
    val ref = Tables.table(spark, sf, "events")
      .agg(min("ts"), max("ts")).collect()(0)
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val shifted = Tables.table(spark, sf, "events")
        .agg(min("ts"), max("ts")).collect()(0)
      assert(shifted == ref,
        s"ts drifted with session timezone: $shifted vs $ref")
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("z-order layout: every file is narrow in BOTH dimensions at once") {
    val li = Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val dir = Files.createTempDirectory("graft_zorder").toString
    Tables.writeZOrdered(li, s"$dir/z", Seq("l_orderkey", "l_partkey"), nFiles = 16)
    // the single-dimension baseline: same file count, sorted on the
    // first dimension only
    li.repartitionByRange(16, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$dir/x")
    def avgFileRange(p: String, c: String): Double =
      spark.read.parquet(p)
        .groupBy(input_file_name().as("f"))
        .agg((max(col(c).cast("double")) - min(col(c).cast("double"))).as("r"))
        .agg(avg(col("r"))).collect()(0).getDouble(0)
    def fullRange(c: String): Double = li
      .agg((max(col(c).cast("double")) - min(col(c).cast("double"))).as("r"))
      .collect()(0).getDouble(0)
    // z-order: BOTH dimensions are narrow per file (the 4x4 grid);
    // the x-sort baseline leaves the second dimension at ~full width
    assert(avgFileRange(s"$dir/z", "l_orderkey") < 0.6 * fullRange("l_orderkey"),
      "z files must be narrow in the first dimension")
    assert(avgFileRange(s"$dir/z", "l_partkey") < 0.6 * fullRange("l_partkey"),
      "z files must be narrow in the second dimension")
    assert(avgFileRange(s"$dir/x", "l_partkey") > 0.8 * fullRange("l_partkey"),
      "fixture check: the single-sort baseline should NOT skip on dim 2")
    // the layout is a re-arrangement, not a transformation: helper
    // columns are gone and the multiset of rows is unchanged
    val back = spark.read.parquet(s"$dir/z")
    assert(back.columns.sorted.toSeq == li.columns.sorted.toSeq)
    assert(back.count() == li.count())
    assert(back.exceptAll(li).isEmpty && li.exceptAll(back).isEmpty)
  }

  test("avro containers roundtrip primitives, arrays, binary, and nulls exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    // the supplier table: strings, longs, doubles through the container
    val sup = Tables.table(spark, sf, "supplier")
    Tables.writeAvro(sup, s"$dir/sup")
    val supBack = Tables.readAvro(spark, s"$dir/sup")
    assert(supBack.schema.map(f => (f.name, f.dataType)) ==
      sup.schema.map(f => (f.name, f.dataType)).toSeq)
    assert(supBack.count() == sup.count())
    assert(supBack.exceptAll(sup).isEmpty && sup.exceptAll(supBack).isEmpty)
    // embeddings: array<float> columns survive bit-exactly
    val emb = Tables.table(spark, sf, "embeddings")
    Tables.writeAvro(emb, s"$dir/emb")
    val embBack = Tables.readAvro(spark, s"$dir/emb")
    assert(embBack.count() == emb.count())
    assert(embBack.exceptAll(emb).isEmpty && emb.exceptAll(embBack).isEmpty)
    // nulls and binary: a hand-built frame with gaps
    val mixed = Seq(
      (1L, Option("alpha"), Option(Array[Byte](1, 2, 3))),
      (2L, None: Option[String], None: Option[Array[Byte]]),
      (3L, Option(""), Option(Array.empty[Byte])))
      .toDF("id", "s", "b")
    Tables.writeAvro(mixed, s"$dir/mixed")
    val mixedBack = Tables.readAvro(spark, s"$dir/mixed")
    val got = mixedBack.collect().map(r => (r.getLong(0),
      Option(r.getString(1)), Option(r.getAs[Array[Byte]](2)).map(_.toSeq)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, Some("alpha"), Some(Seq[Byte](1, 2, 3))),
      (2L, None, None), (3L, Some(""), Some(Seq.empty[Byte]))))
    // a multi-partition write produces one container per non-empty task
    Tables.writeAvro(sup.repartition(5), s"$dir/multi")
    val n = new java.io.File(s"$dir/multi").listFiles()
      .count(_.getName.endsWith(".avro"))
    assert(n == 5, s"expected 5 containers, got $n")
    assert(Tables.readAvro(spark, s"$dir/multi").count() == sup.count())
  }

  test("avro task commit: torn attempts never surface, a rewrite republishes cleanly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_avro_tc").toString
    val sup = Tables.table(spark, sf, "supplier")
    Tables.writeAvro(sup.repartition(5), s"$dir/t")
    // a task that died mid-write leaves an attempt-unique _tmp container:
    // readers must never observe it (only published part-*.avro names)
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t", "_tmp-part-00000-attempt-999.avro"),
      Array[Byte](0x4f, 0x62, 0x6a, 1, 0, 0)) // torn: header magic then EOF
    val back = Tables.readAvro(spark, s"$dir/t")
    assert(back.count() == sup.count(),
      "a torn uncommitted attempt must be invisible to readers")
    assert(back.exceptAll(sup).isEmpty && sup.exceptAll(back).isEmpty)
    // a retried/replayed WRITE over the same path republishes complete
    // containers and clears every stale file — including the torn tmp
    // and the parts of the previous (5-partition) layout
    Tables.writeAvro(sup.repartition(2), s"$dir/t")
    val names = new java.io.File(s"$dir/t").listFiles().map(_.getName)
      .filter(_.endsWith(".avro")).sorted.toSeq
    assert(names == Seq("part-00000.avro", "part-00001.avro"),
      s"rewrite must leave exactly the new layout's containers, got $names")
    val back2 = Tables.readAvro(spark, s"$dir/t")
    assert(back2.exceptAll(sup).isEmpty && sup.exceptAll(back2).isEmpty)
  }
}
