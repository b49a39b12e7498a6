package graft.sources

import org.apache.spark.internal.Logging
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.StreamShim
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** STRUCTURED STREAMING SOURCE over a [[MergeTable]]'s change feed —
  * the read-side closure of the CDC loop: `mergeApplySink` writes a
  * stream INTO the table, this follows the table OUT as a stream, so
  * a downstream consumer (replica table, maintained view, alerting)
  * rides the normal `readStream`/`writeStream` machinery with
  * checkpointed exactly-once progress instead of hand-polling
  * versions (the Delta streaming-source shape, on this manifest
  * format).
  *
  * OFFSETS ARE TABLE VERSIONS: a micro-batch covers the versions
  * `(fromV, toV]` and emits `MergeTable.changes(fromV, toV)` — the
  * manifest-aware diff, so each batch is priced by the files its
  * epochs touched, never the table. The endpoint diff NETS
  * intermediate churn inside one batch (a row inserted then deleted
  * between two triggers never appears); set `exactPerVersion=true`
  * for the per-commit walk (`changesByVersion`) when an audit
  * consumer needs every leg. After a restart the checkpointed offset
  * replays the exact uncovered version span — exactly-once delivery
  * as long as the versions are retained (a `vacuum` past the
  * checkpoint fails the stream loudly rather than silently skipping
  * history; re-seed the consumer, the IncrementalView convention).
  *
  * Options: `path` (the table), `key` (the diff key — normally the
  * tracked stats column), `startingVersion` (emit changes COMMITTED
  * AFTER this version; default = the latest version when the stream
  * starts, i.e. only new changes — pass 0 to stream the full retained
  * history; the snapshot AT startingVersion itself is read-side:
  * `MergeTable.read`), `exactPerVersion` (see above).
  *
  * The schema is fixed at stream start (table schema +
  * `_change_type` + `_commit_version`); columns added by later
  * schema evolution appear after a stream restart, never mid-stream.
  */
class MergeTableChangeSourceProvider extends StreamSourceProvider
    with DataSourceRegister {

  override def shortName(): String = "mergetable-changes"

  private def changeSchema(spark: org.apache.spark.sql.SparkSession,
                           path: String): StructType = {
    // metadata-priced: the manifest DDL, never a snapshot read (which
    // would build a file index over every entry just to learn columns)
    StructType(MergeTable.tableSchema(spark, path).fields ++ Seq(
      StructField("_change_type", StringType, nullable = true),
      StructField("_commit_version", IntegerType, nullable = true)))
  }

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("mergetable-changes needs a 'path' option"))
    (shortName(), schema.getOrElse(
      changeSchema(sqlContext.sparkSession, path)))
  }

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("mergetable-changes needs a 'path' option"))
    val key = parameters.getOrElse("key",
      throw new IllegalArgumentException("mergetable-changes needs a 'key' option"))
    // LATCH the starting version into the checkpoint's metadata dir on
    // FIRST start and read it back on every restart. Re-resolving
    // "latest" per (re)start would move the floor under the offset
    // log: a crash between the WAL and the commit log replays the
    // batch against a HIGHER startFrom (the emit-nothing branch —
    // silent loss), and epochs landing while a default-start stream is
    // down would be withheld until some future commit bumps latest
    // past the re-latched floor.
    val startFrom = {
      val mp = new org.apache.hadoop.fs.Path(metadataPath, "starting-version")
      val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(mp)) {
        val in = fs.open(mp)
        try scala.io.Source.fromInputStream(in).mkString.trim.toInt
        finally in.close()
      } else {
        val v = parameters.get("startingVersion").map(_.toInt)
          .getOrElse(MergeTable.latestVersion(spark, path))
        val tmp = new org.apache.hadoop.fs.Path(metadataPath,
          s"_tmp-start-${java.util.UUID.randomUUID()}")
        val out = fs.create(tmp, true)
        try out.write(v.toString.getBytes("UTF-8")) finally out.close()
        if (!fs.rename(tmp, mp) && !fs.exists(mp))
          throw new java.io.IOException(s"could not latch starting version at $mp")
        v
      }
    }
    val exact = parameters.get("exactPerVersion").exists(_.toBoolean)
    new MergeTableChangeSource(spark, path, key, startFrom, exact,
      schema.getOrElse(changeSchema(spark, path)))
  }
}

private[graft] class MergeTableChangeSource(
    spark: org.apache.spark.sql.SparkSession,
    path: String, key: String, startFrom: Int, exactPerVersion: Boolean,
    declared: StructType) extends Source with Logging {

  override def schema: StructType = declared

  private def verOf(o: Offset): Int = o match {
    case l: LongOffset => l.offset.toInt
    case other => other.json.trim.toInt // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] = {
    val latest = MergeTable.latestVersion(spark, path)
    if (latest > startFrom) Some(LongOffset(latest.toLong)) else None
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val fromV = start.map(verOf).getOrElse(startFrom)
    val toV = verOf(end)
    val cols = declared.fieldNames.toIndexedSeq.map(col)
    val batch =
      if (fromV >= toV)
        // the engine replays the last batch's range on restart with
        // start == end when it was already committed — emit nothing,
        // built from the declared schema alone (no manifest access:
        // the replayed version may legitimately be vacuumed by now)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], declared)
      else {
        val retained = MergeTable.retainedVersions(spark, path)
        require(retained.contains(fromV),
          s"change-stream checkpoint at version $fromV of $path, but vacuum " +
            s"retained only ${retained.mkString(",")} — history is gone; " +
            "re-seed the consumer from a snapshot and restart the stream")
        if (exactPerVersion)
          MergeTable.changesByVersion(spark, path, fromV, toV, key)
        else MergeTable.changes(spark, path, fromV, toV, key)
      }
    // project to the declared stream schema: schema evolution between
    // restarts only ever ADDS columns, and those wait for a restart
    StreamShim.asStreaming(batch.select(cols: _*))
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String =
    s"MergeTableChangeSource[$path from v$startFrom]"
}
