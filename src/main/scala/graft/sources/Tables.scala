package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Table access layer.
  *
  * All engine queries read through here so that scan-level concerns
  * (format, schema, future bucketing/partition layout) live in one
  * place. Filters/projections are applied by callers through the
  * Column DSL and reach the parquet reader via Catalyst pushdown —
  * verified in `PlanSpec`.
  */
object Tables {
  val tpch: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one driver-generated parquet table from an sf directory.
    *
    * `events.ts` has shifted physical type across testdata generations
    * (INT64 TIMESTAMP(NANOS) read as Long via the nanosAsLong legacy
    * conf, later TIMESTAMP(MICROS) which Spark reads as TIMESTAMP_NTZ).
    * The engine's contract is the original one — `ts` is a Long of
    * nanoseconds since the epoch — so the scan normalizes whatever the
    * file carries back to that type here, in the one place all queries
    * read through. DuckDB oracles are unaffected either way: it maps
    * both generations to a timestamp, and `epoch_us(ts)` is
    * generation-independent there.
    */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name != "events") df
    else df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => df
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive micros → epoch nanos by NTZ field arithmetic: a
        // timestampdiff between two NTZ values never consults the
        // session zone, so the normalization is identical from any
        // session (an NTZ→LTZ cast here would silently shift every ts
        // by the local offset outside the Engine.configure UTC pin;
        // DuckDB's epoch_us(ts) is the same naive-as-is rule)
        df.withColumn("ts",
          org.apache.spark.sql.functions.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") *
            org.apache.spark.sql.functions.lit(1000L))
      case _ =>
        // true instant (isAdjustedToUTC parquet timestamp): epoch
        // extraction is zone-free by definition
        df.withColumn("ts",
          org.apache.spark.sql.functions.unix_micros(df.col("ts")) *
            org.apache.spark.sql.functions.lit(1000L))
    }
  }

  /** CSV source with optional explicit schema (inference otherwise). */
  def csv(spark: SparkSession, path: String, schema: Option[StructType] = None,
          header: Boolean = true): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }

  /** JSON-lines source with optional explicit schema. */
  def json(spark: SparkSession, path: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }

  /** ORC source — Spark's built-in columnar alternative where the lake
    * standardized on ORC instead of parquet. Same pushdown/pruning
    * behavior through the DSv2 scan (asserted in SourcesSpec). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** ORC sink (snappy, Spark default). */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** Raw-file corpus ingestion via Spark's built-in `binaryFile`
    * source — the entry point that feeds the multimodal decode family:
    * each file becomes one row of (path, modificationTime, length,
    * content binary), so a directory tree of images/audio/video lands
    * directly as the opaque-binary column the m-family decoders
    * consume. Glob filtering happens at FILE LISTING time (files that
    * don't match are never opened — the binary analog of partition
    * pruning) and recursive lookup walks nested corpus layouts. */
  def binaryCorpus(spark: SparkSession, dir: String,
                   glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(dir)

  /** Compact a parquet directory produced by a streaming sink: many
    * small files → ~`targetFileBytes` files, preserving the data. The
    * operational companion to `streaming.Pipelines.parquetSink` — a
    * continuous sink at 100 TB produces a file per trigger per
    * partition, and scans degrade until compaction. Coalesce (no
    * shuffle) is used since file boundaries, not row order, matter. */
  def compact(spark: SparkSession, path: String, outPath: String,
              targetFileBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(new org.apache.hadoop.fs.Path(path)).getLength
    val nFiles = math.max(1, (totalBytes / targetFileBytes).toInt)
    spark.read.parquet(path).coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }

  /** Hive-style partitioned parquet layout: one directory per value of
    * `partitionCol`. Queries filtering on the partition column scan
    * only the matching directories (partition pruning — asserted in
    * SourcesSpec) — the layout for time/tenant-partitioned 100 TB
    * corpora. */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Deterministic hash-sharded corpus layout: shard =
    * pmod(xxhash64(key), nShards) written as a hive partition — the
    * "write the corpus as N stable shards" step feeding downstream
    * tokenizer/packing jobs. Deterministic (a row's shard depends only
    * on its key — identical across runs, partitionings and engines
    * restarts, which is what makes incremental re-runs and shard-level
    * retries safe), size-balanced by the hash, and prunable (a
    * shard = k filter reads one directory — asserted in SourcesSpec).
    * The pre-write repartition ON the shard column aligns tasks with
    * shards so each shard directory gets one file per write, not one
    * per upstream task. */
  def writeSharded(df: DataFrame, path: String, keyCol: String,
                   nShards: Int): Unit = {
    import org.apache.spark.sql.functions._
    require(!df.columns.contains("shard"),
      "input already carries a 'shard' column (re-sharding a sharded " +
        "read-back?) — drop or rename it first; silently overwriting " +
        "it would lose the original values")
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)
  }

  /** Z-order (Morton) clustered parquet layout: the bits of each
    * clustering column's min/max-normalized 16-bit rank interleave
    * into one Morton code, and the write range-partitions + sorts on
    * it — so every output file covers a NARROW range of EVERY
    * clustering dimension at once, and a predicate on ANY one of them
    * prunes most files through parquet min/max stats. A single-column
    * sort gives file-skipping on that column only; at 100 TB a corpus
    * queried by several independent dimensions (time AND tenant,
    * orderkey AND partkey) needs the multi-dimensional layout.
    *
    * Normalization stats ride a broadcast 1-row aggregate (no driver
    * action); the Morton code is 16·k bits of pure integer bit math
    * (codegen-friendly, no UDF); `repartitionByRange` samples the code
    * for balanced files. Degenerate dimensions (min = max) contribute
    * zero bits instead of dividing by zero. The helper `__z`/stat
    * columns never reach the files. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
                    nFiles: Int = 32): Unit = {
    import org.apache.spark.sql.functions._
    val k = zCols.size
    require(k >= 2 && k <= 4, "z-ordering clusters 2-4 dimensions")
    require(zCols.forall(df.columns.contains), s"missing z column in $zCols")
    val stats = df.agg(
      min(col(zCols.head).cast("double")).as(s"__mn_${zCols.head}"),
      zCols.tail.flatMap(c => Seq(
        min(col(c).cast("double")).as(s"__mn_$c"),
        max(col(c).cast("double")).as(s"__mx_$c")))
        :+ max(col(zCols.head).cast("double")).as(s"__mx_${zCols.head}"): _*)
    val norm = zCols.map { c =>
      val (mn, mx) = (col(s"__mn_$c"), col(s"__mx_$c"))
      when(mx === mn, lit(0L)).otherwise(
        least(lit(65535L), greatest(lit(0L),
          floor((col(c).cast("double") - mn) / (mx - mn) * 65535.0)
            .cast("long"))))
    }
    val z = (for { d <- 0 until k; i <- 0 until 16 } yield
      shiftleft(shiftright(norm(d), i).bitwiseAND(lit(1L)), i * k + d))
      .reduce(_ + _)
    df.crossJoin(broadcast(stats))
      .withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .select(df.columns.map(col).toIndexedSeq: _*)
      .write.mode("overwrite").parquet(path)
  }

  /** Bucketed managed table: rows hash-partitioned into `buckets` files
    * by `key` and sorted within each. Two tables bucketed the same way
    * join WITHOUT a shuffle (the scan already satisfies the join's
    * required distribution) — the co-location strategy for repeated
    * fact⋈fact joins at 100 TB, proven shuffle-free in SourcesSpec. */
  def writeBucketed(df: DataFrame, tableName: String, key: String,
                    buckets: Int = 32): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(tableName)

  // ---- Avro Object Container Files ---------------------------------
  // The spark-avro DataSource module is absent from this environment,
  // but avro-core ships on Spark's own classpath — so the engine
  // carries its own plumbing: schema mapping both ways, per-partition
  // container writes, parallel container reads. Supported column
  // types: the primitive family + arrays of primitives (embeddings);
  // anything else is rejected at write time, never mis-mapped.

  private def avroType(dt: org.apache.spark.sql.types.DataType): org.apache.avro.Schema = {
    import org.apache.avro.Schema.{create, createArray}
    import org.apache.spark.sql.types._
    dt match {
      case LongType    => create(org.apache.avro.Schema.Type.LONG)
      case IntegerType => create(org.apache.avro.Schema.Type.INT)
      case DoubleType  => create(org.apache.avro.Schema.Type.DOUBLE)
      case FloatType   => create(org.apache.avro.Schema.Type.FLOAT)
      case BooleanType => create(org.apache.avro.Schema.Type.BOOLEAN)
      case StringType  => create(org.apache.avro.Schema.Type.STRING)
      case BinaryType  => create(org.apache.avro.Schema.Type.BYTES)
      case ArrayType(e, _) => createArray(avroType(e))
      case other => throw new IllegalArgumentException(
        s"unsupported Spark type for Avro write: $other")
    }
  }

  private def avroSchema(st: StructType): org.apache.avro.Schema = {
    val fields = new java.util.ArrayList[org.apache.avro.Schema.Field]()
    st.fields.foreach { f =>
      val base = avroType(f.dataType)
      // null default is only legal when null leads the union
      val fld =
        if (f.nullable) new org.apache.avro.Schema.Field(f.name,
          org.apache.avro.Schema.createUnion(
            org.apache.avro.Schema.create(org.apache.avro.Schema.Type.NULL), base),
          null, org.apache.avro.Schema.Field.NULL_DEFAULT_VALUE)
        else new org.apache.avro.Schema.Field(f.name, base)
      fields.add(fld)
    }
    val rec = org.apache.avro.Schema.createRecord("row", null, "graft", false)
    rec.setFields(fields)
    rec
  }

  private def sparkType(s: org.apache.avro.Schema): org.apache.spark.sql.types.DataType = {
    import org.apache.avro.Schema.Type._
    import org.apache.spark.sql.types._
    val nonNull = if (s.getType == UNION)
      s.getTypes.asScala.filterNot(_.getType == NULL).head else s
    nonNull.getType match {
      case LONG    => LongType
      case INT     => IntegerType
      case DOUBLE  => DoubleType
      case FLOAT   => FloatType
      case BOOLEAN => BooleanType
      case STRING  => StringType
      case BYTES   => BinaryType
      case ARRAY   => ArrayType(sparkType(nonNull.getElementType))
      case other => throw new IllegalArgumentException(
        s"unsupported Avro type for read: $other")
    }
  }

  private def toAvroValue(v: Any): Any = v match {
    case null              => null
    case s: String         => s
    case b: Array[Byte]    => java.nio.ByteBuffer.wrap(b)
    case seq: scala.collection.Seq[_] =>
      val l = new java.util.ArrayList[Any](seq.length)
      seq.foreach(x => l.add(toAvroValue(x)))
      l
    case other => other // boxed primitives pass through
  }

  private def fromAvroValue(v: Any): Any = v match {
    case null                      => null
    case u: org.apache.avro.util.Utf8 => u.toString
    case bb: java.nio.ByteBuffer   =>
      val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
    case l: java.util.List[_]      =>
      val b = scala.collection.mutable.ArrayBuffer.empty[Any]
      l.forEach(x => b += fromAvroValue(x))
      b.toSeq
    case other => other
  }

  /** Serialized Hadoop conf entries, rebuilt executor-side — the
    * `Configuration` object itself is not serializable, and executor
    * defaults alone would miss driver-set FS settings. */
  private def hadoopConfEntries(df: DataFrame): Array[(String, String)] =
    df.sparkSession.sparkContext.hadoopConfiguration.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray

  private def rebuildConf(entries: Array[(String, String)]) = {
    val conf = new org.apache.hadoop.conf.Configuration(true)
    entries.foreach { case (k, v) => conf.set(k, v) }
    conf
  }

  /** Write a DataFrame as a directory of Avro Object Container Files,
    * one `part-NNNNN.avro` per non-empty partition (deflate-coded) —
    * the interchange write for consumers outside the parquet world.
    *
    * All I/O goes through the Hadoop `FileSystem` resolved from the
    * session conf (so a cluster writes to the shared FS, not each
    * executor's local disk), and each task writes to an
    * attempt-unique `_tmp-` name then publishes with delete+rename —
    * the minimal task-commit protocol: a retried or speculative
    * attempt republishes a COMPLETE container and readers never
    * observe a torn file. */
  def writeAvro(df: DataFrame, path: String): Unit = {
    val schemaStr = avroSchema(df.schema).toString
    val nCols = df.schema.length
    val confEntries = hadoopConfEntries(df)
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = dirPath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.mkdirs(dirPath)
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(dirPath, "*.avro")))
      .getOrElse(Array.empty)
      .foreach(st => fs.delete(st.getPath, false))
    df.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
      if (it.hasNext) {
        val conf = rebuildConf(confEntries)
        val dir = new org.apache.hadoop.fs.Path(path)
        val tfs = dir.getFileSystem(conf)
        val tc = org.apache.spark.TaskContext.get()
        val pid = tc.partitionId()
        val tmp = new org.apache.hadoop.fs.Path(
          dir, f"_tmp-part-$pid%05d-attempt-${tc.taskAttemptId()}%d.avro")
        val dst = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.avro")
        val sch = new org.apache.avro.Schema.Parser().parse(schemaStr)
        val w = new org.apache.avro.file.DataFileWriter(
          new org.apache.avro.generic.GenericDatumWriter[
            org.apache.avro.generic.GenericRecord](sch))
        w.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
        w.create(sch, tfs.create(tmp, true))
        try it.foreach { row =>
          val rec = new org.apache.avro.generic.GenericData.Record(sch)
          var i = 0
          while (i < nCols) {
            rec.put(i, toAvroValue(row.get(i)))
            i += 1
          }
          w.append(rec)
        } finally w.close()
        tfs.delete(dst, false) // rename-over-existing is FS-dependent
        if (!tfs.rename(tmp, dst)) {
          tfs.delete(tmp, false)
          throw new java.io.IOException(s"could not publish $tmp -> $dst")
        }
      }
    }
  }

  /** Read a [[writeAvro]] directory back as a DataFrame: schema from
    * one container header on the driver, then the files decode in
    * parallel (one task per container — the Avro analog of the
    * binaryFile corpus read). */
  def readAvro(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val hconf = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(path)
    val fs = dirPath.getFileSystem(hconf)
    val files = Option(
      fs.globStatus(new org.apache.hadoop.fs.Path(dirPath, "*.avro")))
      .getOrElse(Array.empty)
      .filter(!_.getPath.getName.startsWith("_")) // uncommitted attempts
      .map(_.getPath.toString).sorted.toSeq
    require(files.nonEmpty, s"no .avro containers under $path")
    val confEntries = hconf.iterator().asScala
      .map(e => (e.getKey, e.getValue)).toArray
    val header = new org.apache.avro.file.DataFileStream(
      fs.open(new org.apache.hadoop.fs.Path(files.head)),
      new org.apache.avro.generic.GenericDatumReader[
        org.apache.avro.generic.GenericRecord]())
    val avroSch = try header.getSchema finally header.close()
    val st = StructType(avroSch.getFields.asScala.toSeq.map { f =>
      org.apache.spark.sql.types.StructField(f.name(), sparkType(f.schema()),
        f.schema().getType == org.apache.avro.Schema.Type.UNION)
    })
    import spark.implicits._
    spark.createDataset(files).flatMap { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      val tfs = p.getFileSystem(rebuildConf(confEntries))
      val r = new org.apache.avro.file.DataFileStream(
        tfs.open(p),
        new org.apache.avro.generic.GenericDatumReader[
          org.apache.avro.generic.GenericRecord]())
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      try while (r.hasNext) {
        val rec = r.next()
        out += Row.fromSeq((0 until st.length).map(i => fromAvroValue(rec.get(i))))
      } finally r.close()
      out
    }(Encoders.row(st))
  }
}
