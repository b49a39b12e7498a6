package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Manifest-based copy-on-write table (SURVEY §2e) — the MERGE/DELETE
  * layer plain parquet directories lack. A table is a directory of
  * immutable `data-*.parquet` files plus numbered manifests; the
  * CURRENT version is the highest `manifest-N.txt`, and a manifest is
  * the complete truth of a version: schema (line 1, DDL), the stats
  * column (line 2, `-` if none), and the exact data files (one per
  * line, with the file's true [min, max] of the stats column when
  * tracked). This is the minimal shape of the log-structured table
  * formats (Delta/Iceberg — public designs):
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
  *  - FILE-SKIPPING STATS: when a stats column is tracked (the merge
  *    key), every entry carries the file's TRUE [min, max] of it, so
  *    a merge/delete finds its candidate files by RANGE OVERLAP from
  *    metadata alone — the base table is never scanned to locate
  *    hits, only the (conservative, always-correct) candidate files
  *    are opened. A key outside every file's range touches NOTHING.
  *
  * The 100 TB posture is COPY-ON-WRITE WITH FILE PRUNING: a merge
  * rewrites ONLY candidate files (their unmatched survivors + every
  * update row land in fresh files); untouched files carry over to
  * the new manifest by NAME. Only the file LIST (metadata-scale,
  * like every table format's log) crosses the driver — row data
  * never does. Candidate selection joins the update keys against the
  * broadcast range table (a theta join over #files rows); at true
  * scale an interval index over the ranges replaces the linear scan,
  * the same refinement the public formats apply to their manifests.
  */
object MergeTable {

  private val ManifestRe = """manifest-(\d{10})\.txt""".r

  /** A manifest entry: a data file plus (optionally) the true
    * [min, max] of the table's stats column within it. */
  private[sources] case class Entry(name: String, mn: Option[Long], mx: Option[Long]) {
    def line: String = mn match {
      case Some(a) => s"$name\t$a\t${mx.get}"
      case None    => name
    }
  }
  private def parseEntry(l: String): Entry = l.split("\t") match {
    case Array(n, a, b) => Entry(n, Some(a.toLong), Some(b.toLong))
    case Array(n)       => Entry(n, None, None)
    case _ => throw new IllegalArgumentException(s"bad manifest line: $l")
  }

  private case class Manifest(ddl: String, statsCol: Option[String],
                              entries: Seq[Entry])

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

  private def readManifest(fs: FileSystem, dir: Path, v: Int): Manifest = {
    val in = fs.open(manifestPath(dir, v))
    val text = try {
      val out = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, false)
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = text.split("\n").toSeq.filter(_.nonEmpty)
    Manifest(lines.head,
      Some(lines(1)).filter(_ != "-"),
      lines.drop(2).map(parseEntry))
  }

  /** Publish version `v`: write the manifest under a `_tmp-` name,
    * then rename onto the versioned name — the single atomic step
    * that makes the new files visible. A failed rename (version
    * already published by a racing writer) aborts loudly. */
  private def publish(fs: FileSystem, dir: Path, v: Int, m: Manifest): Unit = {
    val tmp = new Path(dir, s"_tmp-manifest-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(
      (Seq(m.ddl, m.statsCol.getOrElse("-")) ++ m.entries.map(_.line))
        .mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
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
    * `data-*.parquet` in the table root. When a stats column is
    * tracked, the staged files are read back ONCE (one scan, grouped
    * by `_metadata.file_path`) for their true per-file [min, max] —
    * data-sized work stays in executors; only #files stat rows reach
    * the driver. Until a manifest lists them the files are
    * unreferenced (readers resolve manifests, never glob data files).
    */
  private def stage(df: DataFrame, dir: Path, fs: FileSystem,
                    statsCol: Option[String]): Seq[Entry] = {
    val stageDir = new Path(dir, s"_stage-${UUID.randomUUID()}")
    df.write.parquet(stageDir.toString)
    val parts = Option(fs.globStatus(new Path(stageDir, "part-*.parquet")))
      .getOrElse(Array.empty).toSeq
    val renamed = parts.zipWithIndex.map { case (st, i) =>
      val name = s"data-${UUID.randomUUID()}-$i.parquet"
      if (!fs.rename(st.getPath, new Path(dir, name)))
        throw new java.io.IOException(s"could not stage ${st.getPath}")
      name
    }
    fs.delete(stageDir, true)
    statsCol match {
      case None => renamed.map(Entry(_, None, None))
      case Some(_) if renamed.isEmpty => Seq.empty
      case Some(c) =>
        val stats = df.sparkSession.read
          .parquet(renamed.map(n => new Path(dir, n).toString): _*)
          .select(col(c), col("_metadata.file_path").as("__mt_file"))
          .groupBy("__mt_file")
          .agg(min(col(c)).as("mn"), max(col(c)).as("mx"))
          .collect()
          .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
        renamed.map { n =>
          stats.find { case (p, _) => p.endsWith("/" + n) } match {
            case Some((_, (a, b))) => Entry(n, Some(a), Some(b))
            // a part file with zero rows carries no range: it can
            // never hold a hit, so an impossible range prunes it
            case None => Entry(n, Some(Long.MaxValue), Some(Long.MinValue))
          }
        }
    }
  }

  /** Create a table at `path` from `df` as version 0. Pass the merge
    * key as `statsCol` (must be a LONG column) to track per-file key
    * ranges — the file-skipping metadata later merges prune with. */
  def create(df: DataFrame, path: String,
             statsCol: Option[String] = None): Unit = {
    val dir = new Path(path)
    val fs = fsFor(df.sparkSession, dir)
    fs.mkdirs(dir)
    require(versions(fs, dir).isEmpty, s"$path already holds a MergeTable")
    statsCol.foreach { c =>
      require(df.schema(c).dataType == LongType,
        s"stats column '$c' must be LONG, got ${df.schema(c).dataType}")
    }
    publish(fs, dir, 0, Manifest(df.schema.toDDL, statsCol,
      stage(df, dir, fs, statsCol)))
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
    val m = readManifest(fs, dir, v)
    fromEntries(spark, dir, m, m.entries)
  }

  /** Range read over the stats column: files whose [min, max] cannot
    * intersect [lo, hi] are never OPENED (manifest-level skipping on
    * top of parquet's own row-group stats); the residual filter
    * applies to the candidates. */
  def readRange(spark: SparkSession, path: String, lo: Long, hi: Long): DataFrame = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val m = readManifest(fs, dir, versions(fs, dir).last)
    val c = m.statsCol.getOrElse(
      throw new IllegalArgumentException(s"$path tracks no stats column"))
    val live = m.entries.filter(e =>
      e.mn.isEmpty || (e.mn.get <= hi && e.mx.get >= lo))
    fromEntries(spark, dir, m, live)
      .filter(col(c) >= lo && col(c) <= hi)
  }

  private def fromEntries(spark: SparkSession, dir: Path, m: Manifest,
                          entries: Seq[Entry]): DataFrame = {
    val schema = StructType.fromDDL(m.ddl)
    if (entries.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else
      spark.read.schema(schema)
        .parquet(entries.map(e => new Path(dir, e.name).toString): _*)
  }

  /** Candidate files for a set of keys: with tracked ranges this is a
    * metadata-only theta join of the (distinct) keys against the
    * BROADCAST range table — the base is never scanned; a false
    * positive only costs rewrite volume, never correctness (ranges
    * are true min/max, so every real hit file is a candidate).
    * Without stats it falls back to scanning the base for
    * `_metadata.file_path` hits. */
  private def candidateFiles(spark: SparkSession, dir: Path, m: Manifest,
                             keys: DataFrame, key: String): Seq[Entry] =
    m.statsCol match {
      case Some(c) if c == key =>
        val ranged = m.entries.filter(_.mn.isDefined)
        val ranges = spark.createDataFrame(
          ranged.map(e => (e.name, e.mn.get, e.mx.get)))
          .toDF("__mt_name", "__mt_mn", "__mt_mx")
        val hit = keys.select(col(key)).distinct()
          .join(broadcast(ranges),
            col(key) >= col("__mt_mn") && col(key) <= col("__mt_mx"))
          .select("__mt_name").distinct()
          .collect().map(_.getString(0)).toSet
        val statless = m.entries.filter(_.mn.isEmpty)
        m.entries.filter(e => hit.contains(e.name)) ++ statless
      case _ =>
        val base = fromEntries(spark, dir, m, m.entries)
          .withColumn("__mt_file", col("_metadata.file_path"))
        val hitPaths = base
          .join(keys.select(col(key)).distinct(), Seq(key))
          .select("__mt_file").distinct()
          .collect().map(_.getString(0)).toSet
        m.entries.filter(e => hitPaths.exists(_.endsWith("/" + e.name)))
    }

  /** MERGE (upsert) by `key`: rows of `updates` replace same-key base
    * rows, new keys append. Copy-on-write with FILE PRUNING: only
    * candidate files (range-overlap when the key is the tracked
    * stats column — found WITHOUT scanning the base) are rewritten
    * (their unmatched survivors + every update row land in fresh
    * files); all other files carry into the new manifest untouched.
    * Returns the new version. `updates` must carry unique keys — an
    * ambiguous double-update is rejected, not resolved silently. */
  def merge(spark: SparkSession, path: String, updates: DataFrame,
            key: String): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val m = readManifest(fs, dir, v)
    val schema = StructType.fromDDL(m.ddl)
    require(updates.columns.toSet == schema.fieldNames.toSet,
      s"update columns ${updates.columns.mkString(",")} != table ${schema.fieldNames.mkString(",")}")
    val ups = updates.select(schema.fieldNames.map(col).toIndexedSeq: _*)
    val uniq = ups.agg(count(lit(1)), count_distinct(col(key))).head()
    require(uniq.getLong(0) == uniq.getLong(1),
      s"updates carry duplicate '$key' values — ambiguous merge")

    val hits = candidateFiles(spark, dir, m, ups, key)
    val hitNames = hits.map(_.name).toSet
    val survivors =
      if (hits.isEmpty) ups // pure append
      else fromEntries(spark, dir, m, hits)
        .join(ups.select(col(key)), Seq(key), "left_anti")
        .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        .unionByName(ups)
    val rewritten = stage(survivors, dir, fs, m.statsCol)
    publish(fs, dir, v + 1,
      m.copy(entries = m.entries.filterNot(e => hitNames(e.name)) ++ rewritten))
    v + 1
  }

  /** COW DELETE BY KEY SET: like [[deleteWhere]] but the doomed keys
    * arrive as a DataFrame (single `key` column) — the CDC-apply
    * shape, where a delete batch can be data-sized and must join, not
    * collect into a driver-side predicate. Only candidate files
    * (range-pruned like [[merge]]) rewrite. Returns the new version. */
  def deleteKeys(spark: SparkSession, path: String, keys: DataFrame,
                 key: String): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val m = readManifest(fs, dir, v)
    val schema = StructType.fromDDL(m.ddl)
    val ks = keys.select(col(key)).distinct()
    val hits = candidateFiles(spark, dir, m, ks, key)
    val hitNames = hits.map(_.name).toSet
    val next =
      if (hits.isEmpty) m.entries
      else {
        val survivors = fromEntries(spark, dir, m, hits)
          .join(ks, Seq(key), "left_anti")
          .select(schema.fieldNames.map(col).toIndexedSeq: _*)
        m.entries.filterNot(e => hitNames(e.name)) ++
          stage(survivors, dir, fs, m.statsCol)
      }
    publish(fs, dir, v + 1, m.copy(entries = next))
    v + 1
  }

  /** COW DELETE by arbitrary predicate: rewrites only the files
    * holding rows matching `cond`, found by ONE base scan (a general
    * predicate cannot be answered from key ranges — the documented
    * asymmetry vs [[deleteKeys]]); untouched files carry over.
    * Returns the new version. */
  def deleteWhere(spark: SparkSession, path: String, cond: Column): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val m = readManifest(fs, dir, v)
    val base = fromEntries(spark, dir, m, m.entries)
      .withColumn("__mt_file", col("_metadata.file_path"))
    val hitPaths = base.filter(cond)
      .select("__mt_file").distinct()
      .collect().map(_.getString(0)).toSet
    val hits = m.entries.filter(e => hitPaths.exists(_.endsWith("/" + e.name)))
    val hitNames = hits.map(_.name).toSet
    val next =
      if (hits.isEmpty) m.entries
      else {
        val survivors = fromEntries(spark, dir, m, hits).filter(!cond)
        m.entries.filterNot(e => hitNames(e.name)) ++
          stage(survivors, dir, fs, m.statsCol)
      }
    publish(fs, dir, v + 1, m.copy(entries = next))
    v + 1
  }

  /** CHANGE DATA FEED between two retained versions — the read-side
    * complement of the CDC apply (`mergeApplySink` writes changes IN,
    * this reads changes OUT, so downstream consumers can follow a
    * table without rescanning it — the public formats' CDF). Rows
    * align on `key`; emits the Delta-CDF shape: `_change_type` ∈
    * insert / delete / update_preimage / update_postimage, where
    * updates are keys present in both versions whose full row
    * changed. Both snapshots prune to their own manifests; the diff
    * is one key-aligned full-outer join — at scale the two file sets
    * mostly COINCIDE (untouched files carry by name), so a
    * manifest-aware consumer could skip shared files entirely; this
    * implementation states the semantics, the file-diff refinement is
    * the documented optimization seam. */
  def changes(spark: SparkSession, path: String, fromV: Int, toV: Int,
              key: String): DataFrame = {
    require(fromV < toV, s"need fromV < toV, got $fromV >= $toV")
    val before = read(spark, path, fromV)
    val after = read(spark, path, toV)
    val cols = before.columns.toSeq
    val b = before.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__b"))
    val a = after.select(col(key).as("__k"),
      struct(cols.map(col): _*).as("__a"))
    val j = b.join(a, Seq("__k"), "full_outer")
    val inserts = j.filter(col("__b").isNull)
      .select(col("__a.*")).withColumn("_change_type", lit("insert"))
    val deletes = j.filter(col("__a").isNull)
      .select(col("__b.*")).withColumn("_change_type", lit("delete"))
    val updatedKeys = j.filter(col("__b").isNotNull && col("__a").isNotNull &&
      col("__b") =!= col("__a"))
    val pre = updatedKeys.select(col("__b.*"))
      .withColumn("_change_type", lit("update_preimage"))
    val post = updatedKeys.select(col("__a.*"))
      .withColumn("_change_type", lit("update_postimage"))
    inserts.unionByName(deletes).unionByName(pre).unionByName(post)
  }

  /** OPTIMIZE: rewrite the current version's small files into
    * target-sized ones (a continuous CDC-apply produces a file per
    * epoch per touched range — scans degrade until compaction, the
    * Tables.compact problem at the table-format layer). Files at or
    * above `smallBytes` keep their place BY NAME (their stats and
    * their parquet row groups are already good); the small tail
    * rewrites into ceil(bytes/target) files. Publishes a new version
    * — readers of the old one are untouched, time travel intact, and
    * the rewrite is content-neutral (spec-pinned). Returns the new
    * version, or -1 when nothing needed compacting. */
  def optimize(spark: SparkSession, path: String,
               smallBytes: Long = 16L * 1024 * 1024,
               targetBytes: Long = 128L * 1024 * 1024): Int = {
    val dir = new Path(path)
    val fs = fsFor(spark, dir)
    val v = versions(fs, dir).last
    val m = readManifest(fs, dir, v)
    val sized = m.entries.map(e =>
      (e, fs.getFileStatus(new Path(dir, e.name)).getLen))
    val (small, big) = sized.partition(_._2 < smallBytes)
    if (small.size < 2) return -1 // nothing to gain from one file
    val totalSmall = small.map(_._2).sum
    val nOut = math.max(1L, (totalSmall + targetBytes - 1) / targetBytes).toInt
    val compacted = fromEntries(spark, dir, m, small.map(_._1))
      .coalesce(nOut) // boundary change only — no shuffle, no reorder
    val rewritten = stage(compacted, dir, fs, m.statsCol)
    publish(fs, dir, v + 1, m.copy(entries = big.map(_._1) ++ rewritten))
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
    val referenced = keep.flatMap(v => readManifest(fs, dir, v).entries
      .map(_.name)).toSet
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
