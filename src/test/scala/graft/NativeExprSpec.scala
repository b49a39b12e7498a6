package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Native, Vectors}
import graft.operators.Dedup
import graft.sources.Tables

class NativeExprSpec extends AnyFunSuite {
  import SparkTest._

  test("native WordShingles equals the composed formulation") {
    val docs = Tables.table(spark, sf, "documents").limit(200)
    val native = docs.select(col("doc_id"),
      Dedup.shingles(col("text"), 3).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val composed = docs.select(col("doc_id"),
      Dedup.shinglesComposed(col("text"), 3).as("s")).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(native == composed)
  }

  test("WordShingles handles short token arrays") {
    import spark.implicits._
    val df = Seq("one two", "single", "a b c d").toDF("text")
    val out = df.select(Dedup.shingles(col("text"), 3)).collect()
      .map(_.getSeq[String](0).toSeq)
    assert(out(0) == Seq("one two"))
    assert(out(1) == Seq("single"))
    assert(out(2) == Seq("a b c", "b c d"))
  }

  test("native GopherStats equals the composed formulation (corpus + edges)") {
    import spark.implicits._
    val reqStop = graft.plans.GopherStats.RequiredStopwords
    def composed(df: org.apache.spark.sql.DataFrame) = {
      val toks = graft.functions.Text.tokens(lower(col("text")))
      val nHash = length(col("text")) - length(regexp_replace(col("text"), "#", ""))
      val nEll = (length(col("text")) -
        length(regexp_replace(col("text"), "\\.\\.\\.", ""))) / lit(3)
      df.select(col("id"),
        size(toks).cast("long").as("n_words"),
        aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("sum_wlen"),
        (nHash + nEll).cast("long").as("n_sym"),
        size(filter(toks, t => t.rlike("[a-z]"))).cast("long").as("n_alpha"),
        size(filter(array(reqStop.map(lit): _*), w => array_contains(toks, w)))
          .cast("long").as("n_req_stop"))
    }
    def native(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), Native.gopherStats(col("text")).as("g"))
        .select(col("id"), col("g")("n_words"), col("g")("sum_wlen"),
          col("g")("n_sym"), col("g")("n_alpha"), col("g")("n_req_stop"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 6).map(r.get).toList)
        .sortBy(_.head.toString).toSeq
    val corpus = Tables.table(spark, sf, "documents").limit(300)
      .select(col("doc_id").as("id"), col("text"))
    assert(rows(native(corpus)) == rows(composed(corpus)))
    // whitespace/symbol/unicode edges: tabs and newlines (trim vs \s+
    // boundaries), empty and all-space strings, overlapping dot runs,
    // '#' inside words, stopwords repeated and capitalized, non-ASCII
    // tokens (no [a-z] after lowering), multi-byte chars around marks
    val edges = Seq(
      "", " ", "\t", " \t\n ", "the the the", "THE Be with...",
      "a#b ## c.....d", "...", "......", ".......", "ab...cd...",
      "über café 北京 42 #", "  leading and trailing  ",
      "that\thave\nwith of", "x y", "word. word.. word...",
      "be be be be", "tHe BE To oF aNd ThAt HaVe WiTh").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    assert(rows(native(edges)) == rows(composed(edges)))
  }

  test("native TextStats equals the composed token/stopword/punct counters") {
    import spark.implicits._
    import graft.functions.Text
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (0 until 4).map(r.get).toList)
        .sortBy(_.head.toString).toSeq
    def native(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), Text.tokenCount(col("text")),
        Text.stopwordCount(col("text")), Text.punctCount(col("text")))
    def composed(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), Text.tokenCountComposed(col("text")),
        Text.stopwordCountComposed(col("text")), Text.punctCountComposed(col("text")))
    val corpus = Tables.table(spark, sf, "documents").limit(300)
      .select(col("doc_id").as("id"), col("text"))
    assert(rows(native(corpus)) == rows(composed(corpus)))
    // edges: raw-vs-lowered token streams (uppercase stopwords), the
    // uppercase-is-punct rule, unicode incl. a supplementary code
    // point (one punct, not two), empty/whitespace-only strings
    val edges = Seq(
      "", " ", "\t \n", "The THE the tHe", "A AND OF TO IN a and",
      "UPPER lower 123 !?", "über café 北京", "emoji 😀 end",
      "the  a   and", " in ", "of.of,of", "a#b c.d e f").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    assert(rows(native(edges)) == rows(composed(edges)))
    // the plans-side stopword list cannot drift from Text.Stopwords
    assert(Text.Stopwords == Seq("the", "a", "and", "of", "to", "in"))
  }

  test("native CosineSim is bit-identical to the composed double fold") {
    val emb = Tables.table(spark, sf, "embeddings").limit(100)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(500)
    val diff = pairs.select(
      Vectors.cosine(col("a.embedding"), col("b.embedding")).as("n"),
      Vectors.cosineComposed(col("a.embedding"), col("b.embedding")).as("c"))
      .filter(col("n") =!= col("c")).count()
    assert(diff == 0)
  }

  test("native WinnowFingerprints equals the composed formulation") {
    val docs = Tables.table(spark, sf, "documents").limit(300)
    val native = docs.select(col("doc_id"), Dedup.winnow(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = docs.select(col("doc_id"), Dedup.winnowComposed(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == composed)
  }

  test("native hashes match the composed per-character folds on non-ASCII text") {
    import spark.implicits._
    val docs = Seq((1L, "café au lait très tôt près du quai übers Straße"),
      (2L, "plain ascii text for the fast path check here")).toDF("doc_id", "text")
    val nw = docs.select(col("doc_id"), Dedup.winnow(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val cw = docs.select(col("doc_id"), Dedup.winnowComposed(col("text")).as("f")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(nw == cw, "winnow must fold codepoints like the oracle's ascii() terms")
    val nh = docs.select(col("doc_id"), Dedup.shingleHash(col("text")).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ch = docs.select(col("doc_id"),
        aggregate(split(col("text"), ""), lit(0L),
          (acc, c) => pmod(acc * 31 + ascii(c), lit(Dedup.P))).as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nh == ch, "polyHash must fold codepoints like the oracle's ascii() terms")
  }

  test("WinnowFingerprints handles short token arrays") {
    import spark.implicits._
    val out = Seq("one two", "single", "a b c d e f").toDF("text")
      .select(Dedup.winnow(col("text")).as("f"))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(out.forall(_.nonEmpty))
    assert(out(1).length == 1, "a single-token doc has exactly one fingerprint")
  }

  test("param-table expressions are value-equal (CSE / exchange reuse)") {
    import org.apache.spark.sql.GraftBridge.expression
    // two independently-constructed instances with equal constants must
    // be semanticEquals — reference-equality Array params would defeat
    // common-subexpression elimination and exchange reuse
    val (pa1, pb1) = Dedup.minhashPerms(16)
    val (pa2, pb2) = Dedup.minhashPerms(16)
    val h = col("h")
    val m1 = graft.plans.MinHashSketch(expression(h), pa1.toSeq, pb1.toSeq, Dedup.P)
    val m2 = graft.plans.MinHashSketch(expression(h), pa2.toSeq, pb2.toSeq, Dedup.P)
    assert(m1 == m2 && m1.semanticEquals(m2))

    val (sa1, sb1) = Dedup.simhashPerms
    val s1 = graft.plans.SimHashPortable(expression(h), sa1.toSeq, sb1.toSeq, Dedup.P)
    val s2 = graft.plans.SimHashPortable(expression(h), sa1.toSeq.map(identity), sb1.toSeq, Dedup.P)
    assert(s1 == s2 && s1.semanticEquals(s2))

    val planes1 = Vectors.randomPlanes(8, 8).map(_.toSeq).toSeq
    val planes2 = Vectors.randomPlanes(8, 8).map(_.toSeq).toSeq
    val l1 = graft.plans.LshBuckets(expression(h), planes1, 4)
    val l2 = graft.plans.LshBuckets(expression(h), planes2, 4)
    assert(l1 == l2 && l1.semanticEquals(l2))
  }

  test("native LshBuckets matches per-table composed buckets") {
    val planes = Vectors.randomPlanes(8, 64)
    val emb = Tables.table(spark, sf, "embeddings").limit(50)
    val native = emb.select(col("vec_id"),
      Native.lshBuckets(col("embedding"), planes, 4).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val composed = emb.select(col("vec_id"),
      array(
        Vectors.lshBucket(col("embedding"), planes.slice(0, 4)),
        Vectors.lshBucket(col("embedding"), planes.slice(4, 8))).as("b")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(native == composed)
  }

  test("IntersectCount equals size(array_intersect) and the rewrite rule fires") {
    import spark.implicits._
    import org.apache.spark.sql.GraftBridge
    val df = Seq(
      (Seq(Option(1L), Option(2L), Option(3L), Option(3L)), Seq(Option(3L), Option(2L), Option(9L))),
      (Seq.empty[Option[Long]], Seq(Option(1L))),
      (Seq(Option(7L), None), Seq(None, Option(8L))),
      (Seq(Option(5L)), Seq(Option(5L)))).toDF("a", "b")
    val builtin = df.select(size(array_intersect(col("a"), col("b"))))
      .collect().map(_.getInt(0)).toSeq
    val native = df.select(GraftBridge.column(graft.plans.IntersectCount(
        GraftBridge.expression(col("a")), GraftBridge.expression(col("b")))))
      .collect().map(_.getInt(0)).toSeq
    assert(native == builtin, s"native $native vs builtin $builtin")
    assert(builtin == Seq(2, 0, 1, 1))
    // the optimizer rule rewrites the composed pattern to the native count
    val analyzed = df.select(size(array_intersect(col("a"), col("b"))).as("n"))
      .queryExecution.analyzed
    val rewritten = graft.plans.IntersectCountRewrite(analyzed)
    assert(rewritten.toString.contains("intersect_count"),
      s"rule did not fire:\n$rewritten")
    // string arrays must NOT rewrite (the kernel is long-specialized)
    val sdf = Seq((Seq("x"), Seq("x"))).toDF("a", "b")
      .select(size(array_intersect(col("a"), col("b"))).as("n"))
    assert(!graft.plans.IntersectCountRewrite(sdf.queryExecution.analyzed)
      .toString.contains("intersect_count"))
  }
}
