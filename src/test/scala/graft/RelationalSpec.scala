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

  test("q42 semi/anti formulation matches the per-order aggregate rewrite") {
    import org.apache.spark.sql.functions._
    // independent formulation: per order, count suppliers and late
    // suppliers; a waiting supplier is late on a multi-supplier order
    // where it is the only late one
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val o = spark.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderstatus") === "F")
    val l1 = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"),
        (col("l_shipdate").cast("date") >
          date_add(col("o_orderdate").cast("date"), 90)).as("late"))
    val perOrder = l1.groupBy("ok").agg(
      countDistinct(col("sk")).as("n_supp"),
      countDistinct(when(col("late"), col("sk"))).as("n_late_supp"))
    val expected = l1.filter(col("late")).join(perOrder, "ok")
      .filter(col("n_supp") > 1 && col("n_late_supp") === 1)
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
