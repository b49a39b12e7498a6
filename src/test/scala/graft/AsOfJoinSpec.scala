package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTest._

  test("matches the most recent right row at or before the left ts") {
    import spark.implicits._
    val left = Seq(("k", 10L), ("k", 20L), ("k", 30L)).toDF("key", "lts")
    val right = Seq(("k", 10L, "a"), ("k", 25L, "b")).toDF("key", "rts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts", Map("v" -> "v"))
      .orderBy("lts").collect()
    // ts=10 matches the equal-ts right row (<=); 20 keeps it; 30 takes 25's
    assert(out.map(r => Option(r.getAs[String]("v"))).toSeq ==
      Seq(Some("a"), Some("a"), Some("b")))
  }

  test("a null in the matched right row stays null — no stale-value resurrection") {
    import spark.implicits._
    val left = Seq(("k", 30L)).toDF("key", "lts")
    // latest right row (ts=20) carries v2=null: per-column last(ignoreNulls)
    // would resurrect v2="old" from ts=10 and silently mix two right rows
    val right = Seq(
      ("k", 10L, "x1", "old"),
      ("k", 20L, "x2", null.asInstanceOf[String])
    ).toDF("key", "rts", "v1", "v2")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts",
      Map("v1" -> "v1", "v2" -> "v2")).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("v1") == "x2")
    assert(out.head.isNullAt(out.head.fieldIndex("v2")),
      "carried v2 must be the matched row's null, not a stale older value")
  }

  test("left rows before any right row carry nulls") {
    import spark.implicits._
    val left = Seq(("k", 5L)).toDF("key", "lts")
    val right = Seq(("k", 10L, "a")).toDF("key", "rts", "v")
    val out = AsOfJoin.asOf(left, right, Seq("key"), "lts", "rts", Map("v" -> "v"))
      .collect()
    assert(out.length == 1 && out.head.isNullAt(out.head.fieldIndex("v")))
  }

  test("nearest: closest within tolerance, ties backward, exact ts is distance 0") {
    import spark.implicits._
    val left = Seq(
      ("k", 100L), // bwd at 90 (d=10) vs fwd at 115 (d=15) -> bwd
      ("k", 110L), // bwd at 90 (d=20) vs fwd at 115 (d=5)  -> fwd
      ("k", 90L),  // exact-ts right row -> distance 0 backward
      ("k", 300L), // nothing within +-25 -> null
      ("k", 120L)  // bwd 115 (d=5) vs fwd 125 (d=5): TIE -> backward
    ).toDF("key", "lts")
    val right = Seq(("k", 90L, "a"), ("k", 115L, "b"), ("k", 125L, "c"))
      .toDF("key", "rts", "v")
    val out = AsOfJoin.asOfNearest(left, right, Seq("key"), "lts", "rts",
        Map("v" -> "v"), tolerance = 25L)
      .orderBy("lts").collect()
      .map(r => r.getAs[Long]("lts") -> Option(r.getAs[String]("v"))).toMap
    assert(out == Map(100L -> Some("a"), 110L -> Some("b"),
      90L -> Some("a"), 300L -> None, 120L -> Some("b")))
  }
}
