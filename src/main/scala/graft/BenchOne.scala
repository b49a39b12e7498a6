package graft

import org.apache.spark.sql.execution.FormattedMode

/** Isolated single-query re-measure (the SURVEY §6e methodology):
  * prints the formatted plan once, then times `n` consuming runs on a
  * warm JVM — the tool for separating a real plan regression from
  * suite-order JIT noise. Usage: runMain graft.BenchOne <query> [sfDir] [n]
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: runMain graft.BenchOne <query> [sfDir] [n]")
    val name = args(0)
    val fn = SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; valid: " +
        SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val n = if (args.length > 2) args(2).toInt else 5
    // session + consumption come from Bench so the isolated re-measure
    // always measures exactly what the suite measures
    val spark = Bench.session()
    println(fn(spark, sfDir).queryExecution.explainString(FormattedMode))
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      Bench.consume(fn(spark, sfDir))
      println(f"[benchone] $name run $i: ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
