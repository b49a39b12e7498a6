package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin
import graft.sources.Tables

class SkewJoinSpec extends AnyFunSuite {
  import SparkTest._

  test("salted join equals the plain join result") {
    val li = Tables.table(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val oAligned = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(oAligned, Seq("l_orderkey"))
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toString).sorted
    val salted = SkewJoin.saltedJoin(li, oAligned, Seq("l_orderkey"),
        scatterOn = col("l_linenumber"), saltFactor = 4)
      .select("l_orderkey", "l_linenumber", "o_totalprice")
      .collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.sameElements(plain))
  }

  test("native functions are callable from SQL") {
    Engine.configure(spark)
    val r = spark.sql(
      """SELECT cosine_sim(array(1.0D, 2.0D), array(1.0D, 2.0D)) AS c,
        |  word_shingles(array('a','b','c'), 2) AS s""".stripMargin).head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getSeq[String](1) == Seq("a b", "b c"))
  }
}
