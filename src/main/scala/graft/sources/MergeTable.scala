package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Manifest-based copy-on-write table (SURVEY §2e) — the MERGE/DELETE
  * layer plain parquet directories lack. A table is a directory of
  * immutable `data-*.parquet` files plus numbered manifests; the
  * CURRENT version is the highest `manifest-N.txt`, and a manifest is
  * the complete truth of a version: schema (line 1, DDL) + the exact
  * data files (one name per line). This is the minimal shape of the
  * log-structured table formats (Delta/Iceberg — public designs):
  *
  *  - SNAPSHOT ISOLATION: readers resolve ONE manifest and read
  *    exactly its files. Writers never mutate a published file — a
  *    merge stages new files (invisible: staged under `_`-prefixed
  *    dirs until the manifest names them) and publishes by ONE atomic
  *    manifest rename. A crash at any point leaves the last published
  *    version intact; stray staged files are garbage, not corruption,
  *    and `vacuum` collects them.
  *  - TIME TRAVEL: any retained older manifest is a consistent
  *    snapshot (`read(path, version)`).
  *  - OPTIMISTIC CONCURRENCY: publishing renames onto
  *    `manifest-(N+1)` — on filesystems with atomic no-overwrite
  *    rename two racing writers cannot both win the same version.
  *    (Maintenance ops — vacuum — assume a single maintainer, as in
  *    the public formats.)
  *
  * The 100 TB posture is COPY-ON-WRITE WITH FILE PRUNING: a merge
  * rewrites ONLY the files that contain a matched key (found by
  * joining the base's `_metadata.file_path` against the update keys —
  * a keyed join, never a full rewrite); untouched files carry over to
  * the new manifest by NAME. Only the file LIST (metadata-scale, like
  * every table format's log) crosses the driver — row data never
  * does.
  */
object MergeTable {

  private val ManifestRe = """manifest-(\d{10})\.txt""".r

  private def fsFor(spark: SparkSession, dir: Path): FileSystem =
    dir.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def versions(fs: FileSystem, dir: Path): Seq[Int] =
    Option(fs.globStatus(new Path(dir, "manifest-*.txt")))
      .getOrElse(Array.empty).toSeq
      .flatMap(st => st.getPath.getName match {
        case ManifestRe(n) => Some(n.toInt)
        case _             => None
      }).sorted

  private def manifestPath(dir: Path, v: Int): Path =
    new Path(dir, f"manifest-$v%010d.txt")

  private def readManifest(fs: FileSystem, dir: Path, v: Int): (String, Seq[String]) = {
    val in = fs.open(manifestPath(dir, v))
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    (lines.head, lines.tail)
  }

  /** Publish version `v`: write the manifest under a `_tmp-` name,
    * then rename onto the versioned name — the single atomic step
    * that makes the new files visible. A failed rename (version
    * already published by a racing writer) aborts loudly. */
  private def publish(fs: FileSystem, dir: Path, v: Int,
                      ddl: String, files: Seq[String]): Unit = {
    val tmp = new Path(dir, s"_tmp-manifest-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write((ddl +: files).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = manifestPath(dir, v)
    if (fs.exists(dst) || !fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(
        s"version $v already published (concurrent writer?) — retry from latest")
    }
  }

  /** Stage a DataFrame as immutable data files: Spark writes into an
    * invisible `_stage-` dir, then each part renames to a unique
    * `data-*.parquet` in the table root. The names are returned for
    * the manifest; until a manifest lists them the files are
    * unreferenced (readers resolve manifests, never glob data files).
    */
  private def stage(df: DataFrame, dir: Path, fs: FileSystem): Seq[String] = {
    val stageDir = new Path(dir, s"_stage-${UUID.randomUUID()}")
    df.write.parquet(stageDir.toString)
    val parts = Option(fs.globStatus(new Path(stageDir, "part-*.parquet")))
      .getOrElse(Array.empty).toSeq
    val names = parts.zipWithIndex.map { case (st, i) =>
      val name = s"data-${UUID.randomUUID()}-$i.parquet"
      if (!fs.rename(st.getPath, new Path(dir, name)))
        throw new java.io.IOException(s"could not stage ${st.getPath}")
      name
    }
    fs.delete(stageDir, true)
    names
  }

  /** Create a table at `path` from `df` as version 0. */
  def create(df: DataFrame, path: String): Unit = {
    val dir = new Path(path)
    val fs = fsFor(df.sparkSession, dir)
    fs.mkdirs(dir)
    require(versions(fs, dir).isEmpty, s"$path already holds a MergeTable")
    publish(fs, dir, 0, df.schema.toDDL, stage(df, dir, fs))
  }

  /** Latest version number, or -1 if the table does not exist. */
  def latestVersion(spark: SparkSession, path: String): Int = {
    val dir = new Path(path)
    versions(fsFor(spark, dir), dir).lastOption.getOrElse(-1)
  }

  /** Read a snapshot: the latest manifest, or an explicit retained
    * `version` (time travel). The manifest's schema is authoritative
    * — an empty version still answers with the right columns. */
  def read(spark: SparkSession, path: String, version: Int = -1): DataFrame = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val vs = versions(fs, dir)
    require(vs.nonEmpty, s"no MergeTable at $path")
    val v = if (version >= 0) version else vs.last
    require(vs.contains(v), s"version $v not present (have ${vs.mkString(",")})")
    val (ddl, files) = readManifest(fs, dir, v)
    val schema = StructType.fromDDL(ddl)
    if (files.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema)
        .parquet(files.map(f => new Path(dir, f).toString): _*)
  }

  /** MERGE (upsert) by `key`: rows of `updates` replace same-key base
    * rows, new keys append. Copy-on-write with FILE PRUNING: only
    * files containing a matched key are rewritten (their unmatched
    * survivors + every update row land in fresh files); all other
    * files carry into the new manifest untouched. Returns the new
    * version. `updates` must carry unique keys — an ambiguous
    * double-update is rejected, not resolved silently. */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            key: String): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val (ddl, files) = readManifest(fs, dir, v)
    val schema = StructType.fromDDL(ddl)
    require(updates.columns.toSet == schema.fieldNames.toSet,
      s"update columns ${updates.columns.mkString(",")} != table ${schema.fieldNames.mkString(",")}")
    val ups = updates.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val uniq = ups.agg(count(lit(1)), count_distinct(col(key))).head()
    require(uniq.getLong(0) == uniq.getLong(1),
      s"updates carry duplicate '$key' values — ambiguous merge")

    val base = read(spark, path, v)
      .withColumn("__mt_file", col("_metadata.file_path"))
    val hitPaths = base
      .join(ups.select(col(key)).distinct(), Seq(key))
      .select("__mt_file").distinct()
      .collect().map(_.getString(0)).toSet // file list: metadata-scale
    val hitNames = files.filter(f => hitPaths.exists(_.endsWith("/" + f)))
    val survivors =
      if (hitNames.isEmpty) ups // pure append
      else spark.read.schema(schema)
        .parquet(hitNames.map(f => new Path(dir, f).toString): _*)
        .join(ups.select(col(key)), Seq(key), "left_anti")
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .unionByName(ups)
    val rewritten = stage(survivors, dir, fs)
    val next = files.filterNot(hitNames.toSet) ++ rewritten
    publish(fs, dir, v + 1, ddl, next)
    v + 1
  }

  /** COW DELETE: rewrite only the files holding rows matching `cond`,
    * keeping their non-matching survivors; untouched files carry
    * over. Returns the new version. */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val (ddl, files) = readManifest(fs, dir, v)
    val schema = StructType.fromDDL(ddl)
    val base = read(spark, path, v)
      .withColumn("__mt_file", col("_metadata.file_path"))
    val hitPaths = base.filter(cond)
      .select("__mt_file").distinct()
      .collect().map(_.getString(0)).toSet
    val hitNames = files.filter(f => hitPaths.exists(_.endsWith("/" + f)))
    val next =
      if (hitNames.isEmpty) files
      else {
        val survivors = spark.read.schema(schema)
          .parquet(hitNames.map(f => new Path(dir, f).toString): _*)
          .filter(!cond)
        files.filterNot(hitNames.toSet) ++ stage(survivors, dir, fs)
      }
    publish(fs, dir, v + 1, ddl, next)
    v + 1
  }

  /** COW DELETE BY KEY SET: like [[deleteWhere]] but the doomed keys
    * arrive as a DataFrame (single `key` column) — the CDC-apply
    * shape, where a delete batch can be data-sized and must join, not
    * collect into a driver-side predicate. Only files holding a
    * matched key rewrite. Returns the new version. */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
                 key: String): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val (ddl, files) = readManifest(fs, dir, v)
    val schema = StructType.fromDDL(ddl)
    val ks = keys.select(col(key)).distinct()
    val base = read(spark, path, v)
      .withColumn("__mt_file", col("_metadata.file_path"))
    val hitPaths = base.join(ks, Seq(key))
      .select("__mt_file").distinct()
      .collect().map(_.getString(0)).toSet
    val hitNames = files.filter(f => hitPaths.exists(_.endsWith("/" + f)))
    val next =
      if (hitNames.isEmpty) files
      else {
        val survivors = spark.read.schema(schema)
          .parquet(hitNames.map(f => new Path(dir, f).toString): _*)
          .join(ks, Seq(key), "left_anti")
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        files.filterNot(hitNames.toSet) ++ stage(survivors, dir, fs)
      }
    publish(fs, dir, v + 1, ddl, next)
    v + 1
  }

  /** Garbage-collect: keep the newest `keepVersions` manifests, drop
    * older manifests, every data file none of the kept manifests
    * reference, and any leftover `_stage-`/`_tmp-` debris (crashed or
    * abandoned writes). Single-maintainer operation (the table-format
    * convention): concurrent time-travel readers of dropped versions
    * lose them. Returns the number of files removed. */
  def vacuum(spark: SparkSession, path: String, keepVersions: Int = 1): Int = {
    require(keepVersions >= 1, "must keep at least the current version")
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val vs = versions(fs, dir)
    val keep = vs.takeRight(keepVersions)
    val referenced = keep.flatMap(v => readManifest(fs, dir, v)._2).toSet
    var removed = 0
    vs.dropRight(keepVersions).foreach { v =>
      if (fs.delete(manifestPath(dir, v), false)) removed += 1
    }
    Option(fs.globStatus(new Path(dir, "data-*.parquet")))
      .getOrElse(Array.empty)
      .filterNot(st => referenced.contains(st.getPath.getName))
      .foreach { st => if (fs.delete(st.getPath, false)) removed += 1 }
    Option(fs.listStatus(dir)).getOrElse(Array.empty)
      .filter(st => st.getPath.getName.startsWith("_stage-") ||
        st.getPath.getName.startsWith("_tmp-"))
      .foreach { st => if (fs.delete(st.getPath, true)) removed += 1 }
    removed
  }
}
