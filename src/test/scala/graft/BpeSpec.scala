package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.BpeTrain

/** BPE training against an INDEPENDENT local reference trainer — the
  * correctness gate for d45 (iterative argmax-dependent rewriting has
  * no fixed SQL oracle, so the reference implementation carries the
  * semantics here).
  */
class BpeSpec extends AnyFunSuite {
  import SparkTest.spark

  /** Reference trainer: plain Scala maps, no Spark — counts
    * overlapping adjacent pairs over a word-frequency dict, merges the
    * (count desc, pair lexicographic asc) winner, repeats. */
  private def referenceTrain(corpus: Seq[String], numMerges: Int): Seq[(Int, String, String, Long)] = {
    var dict: Map[Vector[String], Long] = corpus
      .flatMap(_.trim.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, g) =>
        (w.map(_.toString).toVector :+ BpeTrain.EndOfWord, g.size.toLong)
      }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var r = 0
    var stop = false
    while (r < numMerges && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.foreach { case (syms, n) =>
        syms.sliding(2).foreach {
          case Seq(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + n
          case _         =>
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((a, b), c) = counts.toSeq.minBy { case ((l, rr), n) => (-n, l, rr) }
        out += ((r, a, b, c))
        dict = dict.groupBy { case (syms, _) =>
          BpeTrain.applyMerge(syms.toArray, a, b).toVector
        }.map { case (k, g) => (k, g.values.sum) }
      }
      r += 1
    }
    out.toSeq
  }

  private val corpus = Seq(
    "low low low low low lower lower newest newest newest",
    "newest newest newest widest widest widest new new nest",
    "the quick brown fox jumps over the lazy dog the end")

  test("train matches the independent reference on a toy corpus") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val got = BpeTrain.train(docs, "text", 8).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == referenceTrain(corpus, 8))
  }

  test("merge table is invariant under repartitioning") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val a = BpeTrain.train(docs, "text", 6).collect().toSeq
    val b = BpeTrain.train(docs.repartition(7), "text", 6).collect().toSeq
    assert(a == b)
  }

  test("applyMerge is greedy left-to-right and non-overlapping") {
    assert(BpeTrain.applyMerge(Array("a", "a", "a"), "a", "a").toSeq == Seq("aa", "a"))
    assert(BpeTrain.applyMerge(Array("a", "a", "a", "a"), "a", "a").toSeq == Seq("aa", "aa"))
    assert(BpeTrain.applyMerge(Array("x", "a", "b", "y", "a", "b"), "a", "b").toSeq ==
      Seq("x", "ab", "y", "ab"))
    assert(BpeTrain.applyMerge(Array("a", "b"), "b", "a").toSeq == Seq("a", "b"))
  }

  test("encode applies merges in rank order and compresses the corpus words") {
    import spark.implicits._
    val docs = corpus.toDF("text")
    val merges = BpeTrain.train(docs, "text", 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    // the most frequent training word must tokenize into FEWER symbols
    // than its character count once the learned merges apply
    val toks = BpeTrain.encode("newest", merges)
    assert(toks.length < "newest".length + 1, s"got ${toks.toSeq}")
    assert(toks.mkString == "newest" + BpeTrain.EndOfWord, "symbols must concatenate back")
    // a word the corpus never saw still encodes (to char-level symbols)
    assert(BpeTrain.encode("zzz", merges).toSeq == Seq("z", "z", "z", BpeTrain.EndOfWord))
  }

  test("train stops early when no pair remains") {
    import spark.implicits._
    val docs = Seq("a b a b").toDF("text")
    // words are 1 char + marker: exactly one pair each; after merging
    // ("a","</w>") and ("b","</w>") every word is a single symbol
    val merges = BpeTrain.train(docs, "text", 50).collect()
    assert(merges.length == 2)
    assert(merges.map(_.getString(1)).toSeq == Seq("a", "b"))
  }
}
