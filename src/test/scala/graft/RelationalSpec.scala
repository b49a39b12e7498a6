package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTest {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  val sf = "/root/testdata/sf0.001"
}

class RelationalSpec extends AnyFunSuite {
  import SparkTest._

  test("every registered query returns rows at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query has an oracle or is documented rows-only") {
    val rowsOnly = Set("q27_approx_distinct")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries missing oracle: $missing")
  }

  test("approx_count_distinct stays within 5% of exact") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q27_approx_distinct")(spark, sf)
      .join(graft.sources.Tables.table(spark, sf, "lineitem")
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("exact")), "l_returnflag")
      .collect()
    rows.foreach { r =>
      val approx = r.getAs[Long]("approx_parts").toDouble
      val exact = r.getAs[Long]("exact").toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getAs[String]("l_returnflag")}: approx $approx vs exact $exact")
    }
  }

  test("q1 aggregates are stable across partitionings") {
    val a = SparkEntry.queries("q1_pricing_agg")(spark, sf).collect().toSeq
    val b = SparkEntry.queries("q1_pricing_agg")(spark, sf)
      .repartition(7).collect().toSeq
    // decimal-path sums must be associative-exact: identical under reshuffle
    assert(a.map(_.toString).sorted == b.map(_.toString).sorted)
  }
}
