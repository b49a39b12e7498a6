package graft

import org.scalatest.funsuite.AnyFunSuite

/** The reference's `/api/execute` surface: users submit KSQL-shaped SQL
  * text. After `Engine.registerFunctions`, those statements parse and
  * run through `spark.sql`, resolving to the same native expressions as
  * the Column API. */
class EngineSqlSpec extends AnyFunSuite {
  import SparkTest._
  Engine.registerFunctions(spark)

  private def one(sql: String) = spark.sql(sql).head().get(0)

  test("KSQL scalar surface resolves through spark.sql") {
    assert(one("SELECT PARSE_DATE('20240131', 'yyyyMMdd')").toString == "2024-01-31")
    assert(one("SELECT PARSE_DATE('20240131')").toString == "2024-01-31")
    assert(one("SELECT PARSE_TIMESTAMP('2401311230', 'yyMMddHHmm')").toString
      == "2024-01-31 12:30:00.0")
    assert(one("SELECT SEAB_FIELD('a_b_c', '_', 2)") == "b")
    assert(one("SELECT SEAB_FIELD('a.b.c', '.', 3)") == "c", "delimiter must not act as regex")
    assert(one("SELECT SEAB_HEXTOTEXT(FROM_BYTES('414243', 'hex'))") == "ABC")
    assert(one("SELECT MV_INDEX('1:a#2:b#3:c', 2)") == "b")
    assert(one("SELECT MV_JOIN('1:a#s2:b', '|')") == "a|b")
    assert(one("SELECT INPUTTER_HIS('1:SYS_AGENT1#2:SYS_TELLER2')") == "AGENT1 TELLER2")
  }

  test("malformed input nulls the value, not the query (KSQL semantics)") {
    assert(one("SELECT PARSE_DATE('not-a-date')") == null)
    assert(one("SELECT SEAB_FIELD('nodash', '_', 2)") == null)
    assert(one("SELECT MV_INDEX('1:a', 9)") == null)
  }

  test("GraftExtensions injects the full function surface") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must register every builder cleanly
    // the injected surface is the same builder list the session path uses
    val names = Engine.functionBuilders.map(_._1).toSet
    assert(Set("parse_date", "parse_timestamp", "seab_field", "seab_hextotext",
      "from_bytes", "mv_split", "mv_index", "mv_join", "inputter_his",
      "simhash64", "cosine_sim").subsetOf(names))
  }

  test("dedup primitives are expressible in plain SQL") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    Seq((1L, "alpha beta gamma delta epsilon zeta"), (2L, "alpha beta gamma"))
      .toDF("doc_id", "text").createOrReplaceTempView("engine_sql_docs")
    val rows = spark.sql(
      """SELECT doc_id,
        |  POLYHASH(text) AS h,
        |  WINNOW_FINGERPRINTS(SPLIT(LOWER(TRIM(text)), '\\s+')) AS fps
        |FROM engine_sql_docs ORDER BY doc_id""".stripMargin).collect()
    // SQL results equal the Column-API formulations used by d6/d10
    val expH = Seq("alpha beta gamma delta epsilon zeta", "alpha beta gamma")
      .toDF("t").select(graft.functions.Native.polyHash(col("t"),
        graft.operators.Dedup.P)).collect().map(_.getLong(0))
    assert(rows.map(_.getLong(1)).toSeq == expH.toSeq)
    val expF = Seq("alpha beta gamma delta epsilon zeta", "alpha beta gamma")
      .toDF("t").select(graft.operators.Dedup.winnow(col("t")))
      .collect().map(_.getSeq[Long](0))
    assert(rows.map(_.getSeq[Long](2)).toSeq == expF.toSeq)
    // explicit-argument paths: spelling out the engine defaults must
    // equal the default-argument results (pins argument order and the
    // literal-to-Long conversion), and string-literal numbers with
    // whitespace are accepted like every litInt-based argument
    import graft.operators.Dedup.{WinnowK, WinnowModulus, WinnowW}
    val explicit = spark.sql(
      s"""SELECT POLYHASH(text, ${graft.operators.Dedup.P}) AS h,
         |  WINNOW_FINGERPRINTS(SPLIT(LOWER(TRIM(text)), '\\\\s+'),
         |    $WinnowK, $WinnowW, $WinnowModulus) AS fps,
         |  POLYHASH(text, ' ${graft.operators.Dedup.P} ') AS h2
         |FROM engine_sql_docs ORDER BY doc_id""".stripMargin).collect()
    assert(explicit.map(_.getLong(0)).toSeq == rows.map(_.getLong(1)).toSeq)
    assert(explicit.map(_.getSeq[Long](1)).toSeq == rows.map(_.getSeq[Long](2)).toSeq)
    assert(explicit.map(_.getLong(2)).toSeq == rows.map(_.getLong(1)).toSeq)
  }

  test("a reference-shaped MAPPED statement runs end-to-end") {
    import spark.implicits._
    Seq(("1", Map("D" -> "20240131", "AMT" -> "12.5", "MV" -> "1:x#2:y")))
      .toDF("RECID", "XMLRECORD").createOrReplaceTempView("engine_sql_raw")
    val row = spark.sql(
      """SELECT RECID,
        |  PARSE_DATE(XMLRECORD['D'], 'yyyyMMdd') AS D,
        |  TRY_CAST(XMLRECORD['AMT'] AS double) AS AMT,
        |  MV_JOIN(XMLRECORD['MV'], ' ') AS MV
        |FROM engine_sql_raw""".stripMargin).head()
    assert(row.getString(0) == "1")
    assert(row.getDate(1).toString == "2024-01-31")
    assert(row.getDouble(2) == 12.5)
    assert(row.getString(3) == "x y")
  }
}
