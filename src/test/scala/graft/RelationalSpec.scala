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

  test("every query has an oracle") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries missing oracle: $missing")
  }

  test("approx_count_distinct stays within 5% of exact") {
    val rows = SparkEntry.queries("q27_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("within_5pct") == 1,
        s"${r.getAs[String]("l_returnflag")}: HLL estimate off by more than 5% " +
          s"(exact ${r.getAs[Long]("exact_parts")})")
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
