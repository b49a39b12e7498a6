package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-level runtime configuration applied idempotently at the head
  * of every engine entry point. The driver owns SparkSession creation
  * (Verify/Bench), so anything the engine needs beyond defaults is set
  * here at runtime rather than at builder time.
  */
object Engine {
  def configure(spark: SparkSession): SparkSession = {
    // events.parquet carries INT64 TIMESTAMP(NANOS) which Spark refuses
    // by default; read as Long (ns since epoch) and convert explicitly.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    registerFunctions(spark)
    spark
  }

  /** The engine's SQL function surface as (name, builder) pairs —
    * shared by session-level registration ([[registerFunctions]]) and
    * the `spark.sql.extensions` deployment path ([[GraftExtensions]]). */
  lazy val functionBuilders: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression]
        => org.apache.spark.sql.catalyst.expressions.Expression)] = {
    import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, Literal}
    import graft.functions.T24
    val out = Seq.newBuilder[(String, Seq[Expression] => Expression)]
    def ensure(name: String)(builder: Seq[Expression] => Expression): Unit =
      out += name -> builder
    def litOf(e: Expression, what: String): Any = e match {
      case Literal(v, _) if v != null => v
      case other => sys.error(s"$what must be a literal, got $other")
    }
    def litStr(e: Expression, what: String): String = litOf(e, what).toString
    def litInt(e: Expression, what: String): Int = litStr(e, what).trim.toInt
    // Registry builders must return real catalyst trees (a lazy Column
    // wrapper would reach codegen unresolved): parse a SQL template
    // eagerly and splice the argument expressions at __ARGn__. The
    // still-unresolved built-in functions inside resolve on the
    // analyzer's next fixed-point iteration.
    val ArgRef = """__ARG(\d+)__""".r
    def sqlFn(template: String, args: Expression*): Expression =
      org.apache.spark.sql.catalyst.parser.CatalystSqlParser
        .parseExpression(template).transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.nameParts.lengthCompare(1) == 0 =>
            a.name match {
              case ArgRef(i) => args(i.toInt)
              case _ => a
            }
        }

    ensure("simhash64")(exprs => graft.plans.SimHash64(exprs.head))
    ensure("cosine_sim")(exprs => graft.plans.CosineSim(exprs(0), exprs(1)))
    ensure("try_parse_timestamp") { exprs =>
      graft.plans.TryParseTimestamp(exprs.head, litStr(exprs(1), "try_parse_timestamp fmt"))
    }
    ensure("word_shingles") { exprs =>
      graft.plans.WordShingles(exprs.head, litInt(exprs(1), "word_shingles k"))
    }
    // dedup primitives for SQL-first users: POLYHASH(s [, modulus]) and
    // WINNOW_FINGERPRINTS(tokens [, k, w, modulus]) with the engine's
    // default constants (graft.operators.Dedup.P / the d10 parameters),
    // so the d6/d10/d16 pipelines are expressible in plain SQL
    def litLong(e: Expression, what: String): Long = {
      val s = litStr(e, what).trim
      val v = try s.toLong catch {
        case _: NumberFormatException =>
          throw new IllegalArgumentException(
            s"$what must be an integer literal, got '$s'")
      }
      require(v > 0, s"$what must be positive, got $v")
      v
    }
    ensure("polyhash") { exprs =>
      val p = if (exprs.length > 1) litLong(exprs(1), "polyhash modulus")
              else graft.operators.Dedup.P
      graft.plans.PolyHash(exprs.head, p)
    }
    ensure("winnow_fingerprints") { exprs =>
      val k = if (exprs.length > 1) litInt(exprs(1), "winnow k")
              else graft.operators.Dedup.WinnowK
      val w = if (exprs.length > 2) litInt(exprs(2), "winnow w")
              else graft.operators.Dedup.WinnowW
      val p = if (exprs.length > 3) litLong(exprs(3), "winnow modulus")
              else graft.operators.Dedup.WinnowModulus
      graft.plans.WinnowFingerprints(exprs.head, k, w, p)
    }
    // T24 surface (reference controllers/index.js:57-170, 293-403):
    // KSQL-shaped statements using these names run through spark.sql,
    // resolving to the same native/codegen expressions as the Column API.
    ensure("parse_date") { exprs =>
      val fmt = if (exprs.length > 1) litStr(exprs(1), "parse_date fmt") else "yyyyMMdd"
      Cast(graft.plans.TryParseTimestamp(exprs.head, fmt),
        org.apache.spark.sql.types.DateType)
    }
    ensure("parse_timestamp") { exprs =>
      val fmt = if (exprs.length > 1) litStr(exprs(1), "parse_timestamp fmt") else "yyMMddHHmm"
      graft.plans.TryParseTimestamp(exprs.head, fmt)
    }
    ensure("seab_field") { exprs =>
      // delimiter is a literal split-by string, not a regex — quote it
      val delim = java.util.regex.Pattern.quote(litStr(exprs(1), "seab_field delim"))
      sqlFn("TRY_ELEMENT_AT(SPLIT(__ARG0__, __ARG1__), __ARG2__)",
        exprs(0), Literal(delim), exprs(2))
    }
    // SEAB_HEXTOTEXT(FROM_BYTES(x,'hex')) — the reference's hex-decode
    // pair (controllers/index.js:307)
    ensure("seab_hextotext")(exprs => sqlFn("DECODE(__ARG0__, 'UTF-8')", exprs.head))
    ensure("from_bytes") { exprs =>
      val enc = if (exprs.length > 1) litStr(exprs(1), "from_bytes encoding") else "hex"
      require(enc.equalsIgnoreCase("hex"), s"from_bytes: only 'hex' is supported, got $enc")
      sqlFn("UNHEX(__ARG0__)", exprs.head)
    }
    ensure("mv_split")(exprs =>
      sqlFn(s"FILTER(SPLIT(__ARG0__, '${T24.MvMarker}'), x -> x <> '')", exprs.head))
    ensure("mv_index")(exprs =>
      sqlFn(s"TRY_ELEMENT_AT(FILTER(SPLIT(__ARG0__, '${T24.MvMarker}'), x -> x <> ''), __ARG1__)",
        exprs(0), exprs(1)))
    ensure("mv_join") { exprs =>
      val d: Expression = if (exprs.length > 1) exprs(1) else Literal(" ")
      sqlFn(s"ARRAY_JOIN(FILTER(SPLIT(REGEXP_REPLACE(__ARG0__, '${T24.MvLead}', ''), " +
        s"'#(s?[0-9]+:)?'), x -> x <> ''), __ARG1__)", exprs(0), d)
    }
    ensure("inputter_his")(exprs =>
      sqlFn(s"SUBSTRING(REGEXP_REPLACE(ARRAY_JOIN(TRANSFORM(" +
        s"SPLIT(REGEXP_REPLACE(__ARG0__, '${T24.MvLead}', ''), '#(s?[0-9]*:)?'), " +
        s"x -> TRY_ELEMENT_AT(SPLIT(x, '_'), 2)), ' ', 'null'), 'null ', ''), 1, 4000)",
        exprs.head))
    // the BLOB FE/FEFD packed-record decode and the subvalue split —
    // registered so the emitted BLOB_PARSE_T24 statement TEXT resolves
    // to the SAME native expressions as the Column pipeline (text-level
    // parity is parity by construction, not by re-derivation)
    ensure("mv_decode")(exprs => graft.plans.MvDecode(exprs.head))
    ensure("split_char")(exprs =>
      graft.plans.SplitChar(exprs(0), litStr(exprs(1), "split_char separator")))
    out.result()
  }

  /** Expose native expressions AND the full T24/KSQL scalar surface to
    * the SQL side (the reference's users write KSQL-shaped SQL against
    * `/api/execute`; `spark.sql` is the analog — after registration the
    * reference's generated statements parse and run as-is). */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    functionBuilders.foreach { case (name, builder) =>
      if (!registry.functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(name))) {
        registry.createOrReplaceTempFunction(name, builder, "built-in")
      }
    }
  }

  /** Wrap a query builder so Engine configuration always precedes it. */
  def q(f: (SparkSession, String) => DataFrame): (SparkSession, String) => DataFrame =
    (s, d) => f(configure(s), d)
}
