package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral checks for the d40-d43 SFT/chat-data family, against an
  * INDEPENDENT Scala re-derivation of the conversation synthesis (turn
  * chunking, template rendering, defect injection) — the oracle SQL
  * proves cross-engine parity; these prove the semantics are the ones
  * claimed.
  */
class ChatCurationSpec extends AnyFunSuite {
  import SparkTest._

  private def corpus: Map[Long, String] = {
    import spark.implicits._
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect().toMap
  }

  private def turnsOf(text: String): Seq[String] = {
    val toks = text.trim.split("\\s+").toSeq
    val n = math.min(6, math.max(1, (toks.length + 7) / 8))
    (0 until n).map(i => toks.slice(i * 8, i * 8 + 8).mkString(" "))
  }

  test("d40: offsets index the rendered template exactly") {
    val rows = SparkEntry.queries("d40_chat_render")(spark, sf).collect()
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    val docs = corpus
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (id, turnRows) =>
      val turns = turnsOf(docs(id))
      assert(turnRows.length == turns.length, s"doc $id turn count")
      // independently render the full conversation, then check every
      // claimed span against the actual string
      val rendered = turns.zipWithIndex.map { case (b, i) =>
        val role = if (i % 2 == 0) "user" else "assistant"
        s"<|$role|>\n$b\n"
      }.mkString
      turnRows.sortBy(_.getAs[Long]("turn_idx")).foreach { r =>
        val i = r.getAs[Long]("turn_idx").toInt
        val bs = r.getAs[Long]("body_start").toInt
        val be = r.getAs[Long]("body_end").toInt
        assert(rendered.substring(bs, be) == turns(i),
          s"doc $id turn $i span [$bs,$be) does not cut the body")
        val so = r.getAs[Long]("start_off").toInt
        val role = r.getAs[String]("role")
        assert(rendered.startsWith(s"<|$role|>\n", so),
          s"doc $id turn $i start_off $so does not land on the marker")
        assert((r.getAs[Long]("in_loss") == 1L) == (role == "assistant"))
      }
    }
  }

  test("d41: injected structural defects are each caught by their flag") {
    val rows = SparkEntry.queries("d41_turn_validate")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows.nonEmpty)
    rows.foreach { case (id, r) =>
      val clean = id % 13 != 0 && id % 17 != 0 && id % 19 != 0
      if (id % 13 == 0)
        assert(r.getAs[Long]("first_user") == 0L, s"doc $id: swapped roles")
      if (id % 17 == 0 && r.getAs[Long]("n_turns") >= 2 && id % 13 != 0)
        assert(r.getAs[Long]("alternation_ok") == 0L,
          s"doc $id: forced consecutive user turns")
      if (id % 19 == 0)
        assert(r.getAs[Long]("no_empty") == 0L, s"doc $id: emptied last turn")
      if (clean && r.getAs[Long]("n_turns") >= 2
          && r.getAs[Long]("n_turns") % 2 == 0)
        // clean even-turn conversations are fully valid (odd-turn ones
        // legitimately fail ends_assistant — user gets the last word)
        assert(r.getAs[Long]("valid") == 1L, s"doc $id should be valid")
      if (r.getAs[Long]("valid") == 1L)
        assert(Seq("first_user", "alternation_ok", "no_empty",
          "ends_assistant").forall(f => r.getAs[Long](f) == 1L))
    }
  }

  test("d42: prompt groups are exact first-turn groups with min keeper") {
    val out = SparkEntry.queries("d42_prompt_dedup")(spark, sf).collect()
    val docs = corpus
    val expected = docs.groupBy { case (_, t) => turnsOf(t).head.toLowerCase.take(64) }
    assert(out.map(_.getAs[Long]("n_convs")).sum == docs.size,
      "every conversation lands in exactly one prompt group")
    assert(out.length == expected.size,
      s"group count ${out.length} != independent grouping ${expected.size}")
    val keepers = out.map(_.getAs[Long]("keep_id")).toSet
    expected.values.foreach { g =>
      assert(keepers.contains(g.keys.min), "earliest conversation survives")
    }
  }

  test("d43: buckets partition the corpus and waste adds up") {
    val out = SparkEntry.queries("d43_length_buckets")(spark, sf).collect()
    val docs = corpus
    def cap(n: Int) = Seq(16, 32, 64, 128, 256, 512, 1024, 2048)
      .find(n <= _).getOrElse(4096)
    val lens = docs.values.map(_.trim.split("\\s+").length).toSeq
    assert(out.map(_.getAs[Long]("n_docs")).sum == docs.size)
    out.foreach { r =>
      val c = r.getAs[Long]("capacity")
      val exp = lens.filter(n => cap(n) == c)
      assert(r.getAs[Long]("n_docs") == exp.size, s"bucket $c doc count")
      assert(r.getAs[Long]("n_pad") ==
        exp.map(n => c - math.min(n, 4096)).sum, s"bucket $c padding")
      val u = r.getAs[Double]("utilization")
      assert(u > 0.0 && u <= 1.0, s"bucket $c utilization $u")
    }
  }

  test("d44: preference pairs pick quality extremes within duplicate-prompt groups") {
    val pairs = SparkEntry.queries("d44_preference_pairs")(spark, sf).collect()
    val scores = SparkEntry.queries("d2_quality_score")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    val docs = corpus
    val groups = docs.groupBy { case (_, t) => turnsOf(t).head.toLowerCase.take(64) }
      .values.filter(_.size >= 2).toSeq
    assert(pairs.length == groups.size,
      s"one pair per multi-member prompt group: ${pairs.length} vs ${groups.size}")
    pairs.foreach { r =>
      val c = r.getAs[Long]("chosen_id")
      val j = r.getAs[Long]("rejected_id")
      assert(c != j, "chosen and rejected must differ")
      assert(scores(c) >= scores(j), s"chosen $c outscores rejected $j")
      assert(r.getAs[Double]("score_gap") == scores(c) - scores(j))
    }
    // argmax/argmin agree with a local recomputation, including ties
    val expected = groups.map { g =>
      val members = g.keys.toSeq
      val chosen = members.minBy(id => (-scores(id), id))
      val rejected = members.minBy(id => (scores(id), -id))
      (chosen, rejected)
    }.toSet
    assert(pairs.map(r => (r.getAs[Long]("chosen_id"),
      r.getAs[Long]("rejected_id"))).toSet == expected)
  }
}
