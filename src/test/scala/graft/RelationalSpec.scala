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

  test("every query has an oracle — no rows-only exceptions remain") {
    // round 8 closed the last gap: d45's merge loop unrolls as a fixed
    // DuckDB CTE chain (bpeTrainOracle), so EVERY query key now has a
    // full SQL oracle and any future oracle-less query fails here.
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries missing oracle: $missing")
  }

  test("count-min estimates never undercount and mostly hit exact at this width") {
    val rows = SparkEntry.queries("q61_heavy_hitters")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach(r => assert(r.getAs[Boolean]("never_under"),
      s"CMS undercounted ${r.getAs[String]("key")}"))
    // 1000-ish keys into 3×1024 cells: the min-of-rows estimate is
    // EXACT unless a key collides in all three rows — most of the
    // top-20 at sf0.001 should be collision-free
    val exactHits = rows.count(r =>
      r.getAs[Long]("est_cnt") == r.getAs[Long]("exact_cnt"))
    assert(exactHits * 4 >= rows.length * 3,
      s"only $exactHits/${rows.length} estimates exact — " +
        "all-three-row collisions should be rare at this key count")
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

  test("q42 aggregate rewrite matches the literal semi/anti formulation") {
    import org.apache.spark.sql.functions._
    // independent formulation, mirroring the oracle's EXISTS/NOT
    // EXISTS literally: a late line survives if ANOTHER supplier sits
    // on the same order (semi) and NO OTHER supplier is late on it
    // (anti)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F")
    val l1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate").cast("date") >
          date_add(col("o_orderdate").cast("date"), 90)).as("late"))
    val l2 = l1.select(col("ok").as("k2"), col("sk").as("s2"))
    val l3 = l1.filter(col("late"))
      .select(col("ok").as("k3"), col("sk").as("s3"))
    val expected = l1.filter(col("late"))
      .join(l2, col("ok") === col("k2") && col("sk") =!= col("s2"), "left_semi")
      .join(l3, col("ok") === col("k3") && col("sk") =!= col("s3"), "left_anti")
      .join(spark.read.parquet(s"$sf/supplier.parquet"),
        col("sk") === col("s_suppkey"))
      .join(spark.read.parquet(s"$sf/nation.parquet")
        .filter(col("n_name").isin("NATION_3", "NATION_7", "NATION_11")),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val actual = SparkEntry.queries("q42_supplier_wait")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(actual == expected)
  }

  test("q43 keeps only orders whose total quantity exceeds the threshold") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q43_large_orders")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Double]("sum_qty") > 300.0))
    // and no qualifying order is missing (top-100 covers all at sf0.001)
    val nBig = spark.read.parquet(s"$sf/lineitem.parquet")
      .groupBy("l_orderkey").agg(sum("l_quantity").as("sq"))
      .filter(col("sq") > 300).count()
    assert(rows.length == nBig.toInt)
  }
}
