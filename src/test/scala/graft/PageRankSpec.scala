package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graphs

/** Independent local re-derivation for the integer PageRank (the
  * VERDICT r9 rule): replay the surfer-unit recurrence in plain Scala
  * maps from the same edge formula — no Spark, no SQL — and require
  * the distributed five-iteration plan to match rank for rank.
  */
class PageRankSpec extends AnyFunSuite {
  import SparkTest._

  private val H = Graphs.Hosts

  private def localEdges(ids: Seq[Long]): Set[(Long, Long)] =
    ids.flatMap { id =>
      val src = id % H
      Seq((id * 31 + 7) % H, (id * 17 + 3) % H).map { d =>
        (src, if (d == src) (d + 1) % H else d)
      }
    }.toSet

  private def localPagerank(edges: Set[(Long, Long)], iters: Int): Map[Long, Long] = {
    val outd = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val hosts = edges.flatMap(e => Seq(e._1, e._2))
    var r = hosts.map(_ -> Graphs.StartUnits).toMap
    for (_ <- 1 to iters) {
      val in = edges.toSeq
        .map { case (u, v) => v -> (r(u) * 85 / 100 / outd(u)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = hosts.map(h => h -> (Graphs.Teleport + in.getOrElse(h, 0L))).toMap
    }
    r
  }

  test("distributed pagerank equals the local surfer-unit replay") {
    import spark.implicits._
    val ids = (0L until 300L) ++ Seq(1000L, 2500L, 7777L)
    val docs = ids.toDF("doc_id")
    val got = Graphs.pagerank(Graphs.hostEdges(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = localPagerank(localEdges(ids), 5)
    assert(got == want)
  }

  test("iteration count changes ranks (the recurrence actually runs)") {
    import spark.implicits._
    val docs = (0L until 200L).toDF("doc_id")
    val e = Graphs.hostEdges(docs)
    val r1 = Graphs.pagerank(e, 1).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r5 = Graphs.pagerank(e, 5).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 != r5)
    assert(r5 == localPagerank(localEdges(0L until 200L), 5))
    assert(r1 == localPagerank(localEdges(0L until 200L), 1))
  }

  test("a host with no in-edges settles at the teleport floor") {
    import spark.implicits._
    // hand graph: 1 -> 2, 2 -> 1; host 3 links out but nothing links in
    val edges = Seq((1L, 2L), (2L, 1L), (3L, 1L)).toDF("src", "dst")
    val got = Graphs.pagerank(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(3L) == Graphs.Teleport)
    assert(got(1L) > got(2L), "host 1 has two in-edges, host 2 one")
  }
}
