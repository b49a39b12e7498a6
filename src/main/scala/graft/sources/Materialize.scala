package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Build-once / read-many parquet artifacts (persisted cluster maps,
  * indexes): the table is (re)built only when `path` carries no
  * committed parquet `_SUCCESS` marker, so the first consumer pays the
  * build and every later invocation is a pure table read. Only correct
  * for builds that are DETERMINISTIC in their inputs — the contract
  * every graft index keeps (and specs pin: a committed path is never
  * rebuilt, so persisted ≡ recompute is a theorem, not luck). All FS
  * access goes through the Hadoop `FileSystem` of the session conf, so
  * the marker probe works against any cluster filesystem. */
object Materialize {
  def ensure(spark: SparkSession, path: String)(build: => Unit): DataFrame = {
    val marker = new org.apache.hadoop.fs.Path(path, "_SUCCESS")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) build
    spark.read.parquet(path)
  }
}
