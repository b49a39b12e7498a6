package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.T24

/** One field of a T24 schema document — the reference's `procData` items
  * (`/root/reference/src/controllers/index.js:10-26`): `name`,
  * `transformation`, target `type`, and the three parse flags
  * (`should_parse_sv` / `_vm` / `_vs`).
  */
case class FieldSpec(
    name: String,
    dataType: String = "string",
    transformation: String = "",
    parseSv: Boolean = true,
    parseVm: Boolean = false,
    parseVs: Boolean = false)

/** The reference's core capability re-expressed Spark-first.
  *
  * The reference compiles a schema document into KSQL *text* (RAW →
  * MAPPED → MULTIVALUE → SINK statements, `controllers/index.js:406-623`).
  * Here the same schema compiles directly into Catalyst `Column` trees
  * over a raw DataFrame (`RECID` string + `XMLRECORD map<string,string>`),
  * so pushdown/pruning/codegen apply to the generated pipeline. A SQL
  * text emitter (`mappedSql`) keeps parity with the reference's
  * statement-generating API surface.
  *
  * Transformations supported (reference `controllers/index.js:57-170`):
  *  - `""`              field passthrough `XMLRECORD['NAME']`
  *  - `"parse_date"`    PARSE_DATE yyyyMMdd
  *  - `"parse_timestamp"` PARSE_TIMESTAMP yyMMddHHmm
  *  - `"substring"`     SUBSTRING(x,1,35)
  *  - `"seab_field"`    split-by-'_'-take-2nd
  *  - `"string-join"` / `"string-join('<d>')"`  multivalue join
  *  - `"[n]"`           multivalue positional index (1-based)
  *  - `"inputter_his"`  the INPUTTER_HIS audit transform
  * Field names with a `LOCALREF_` prefix surface under the stripped,
  * upper-cased name (reference `:67-69`); non-string `dataType` adds a
  * final CAST (reference `:155-157`).
  */
object SchemaConverter {
  val RecId = "RECID"
  val Record = "XMLRECORD"
  /** Position column added by the multivalue explode stage. */
  val MvPos = "MV_POS"

  private val IndexT = """^\[(\d+)\]$""".r
  private val JoinArgT = """string-join\('([^']*)'\)""".r
  /** `FUNC(… $ …) [ALIAS]` template transformations — the reference's
    * `$`-substitution (`controllers/index.js:96-144`): `$` stands for
    * the raw field value, the optional trailing token renames the
    * output. Compiled by substituting the field's SQL into the template
    * and parsing with `expr` — exactly the reference's string
    * substitution, but the result is a Catalyst tree, not text. */
  private val TemplateT = """^([^\s(]+)\((.*\$.*)\)\s*(\S*)$""".r

  /** Output column + name for a template-transformed field. */
  private def compileTemplate(valueSql: String, spec: FieldSpec,
                              fn: String, args: String, alias: String): (Column, String) = {
    val c = org.apache.spark.sql.functions.expr(
      s"${fn.toUpperCase}(${args.replace("$", valueSql)})")
    val cast = if (spec.dataType == "string") c else c.try_cast(spec.dataType)
    (cast, if (alias.nonEmpty) alias.toUpperCase else outputName(spec))
  }

  def outputName(spec: FieldSpec): String = {
    val base =
      if (spec.name.startsWith("LOCALREF_")) spec.name.stripPrefix("LOCALREF_")
      else spec.name
    base.toUpperCase
  }

  /** Compile one field's transformation over an input value column. */
  def compileValue(value: Column, spec: FieldSpec): Column = {
    val base = spec.transformation match {
      case ""                => value
      case "parse_date"      => T24.parseDate(value)
      case "parse_timestamp" => T24.parseTimestamp(value)
      case "substring"       => T24.substr35(value)
      case "seab_field"      => T24.seabField(value, "_", 2)
      case "inputter_his"    => T24.inputterHis(value)
      case JoinArgT(delim)   => T24.mvJoin(value, delim)
      case "string-join"     => T24.mvJoin(value, " ")
      case IndexT(n)         => T24.mvIndex(value, n.toInt)
      case other => sys.error(s"unsupported transformation: $other")
    }
    // try_cast: a malformed value nulls the field, never the pipeline
    // (KSQL semantics; ANSI cast would fail the job on one bad record)
    if (spec.dataType == "string") base else base.try_cast(spec.dataType)
  }

  /** MAPPED stage: RECID + one compiled column per single-value field.
    * `FUNC($)` templates substitute the map access directly. */
  def mapped(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    val cols = col(RecId) +: schema.filter(_.parseSv).map { sp =>
      sp.transformation match {
        case TemplateT(fn, args, alias) =>
          val (c, name) = compileTemplate(s"$Record['${sp.name}']", sp, fn, args, alias)
          c.as(name)
        case _ => compileValue(col(Record)(sp.name), sp).as(outputName(sp))
      }
    }
    raw.select(cols: _*)
  }

  /** BLOB-mode MAPPED stage (reference `controllers/index.js:293-403`,
    * `BLOB_SPLIT`): field values arrive hex-encoded
    * (`SEAB_HEXTOTEXT(FROM_BYTES(…,'hex'))`); decode precedes every
    * per-field transformation. */
  def blobMapped(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    val cols = col(RecId) +: schema.filter(_.parseSv).map { sp =>
      compileValue(T24.hexToText(col(Record)(sp.name)), sp).as(outputName(sp))
    }
    raw.select(cols: _*)
  }

  /** MULTIVALUE stage: decode every VM field to its element array, zip
    * the arrays (T24 multivalues are positionally aligned), and explode
    * one row per position — Spark's Generate operator instead of the
    * reference's self-join template. Single-value fields ride along;
    * VS (subvalue) fields decode a second level within each element.
    */
  def multivalue(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    val svs = schema.filter(_.parseSv)
    val vms = schema.filter(_.parseVm)
    val vss = schema.filter(_.parseVs)
    require(vms.nonEmpty || vss.nonEmpty, "multivalue stage needs a VM/VS field")

    val arrays = (vms ++ vss).map { sp =>
      T24.mvSplit(col(Record)(sp.name)).as(outputName(sp))
    }
    val svCols = svs.map(sp => compileValue(col(Record)(sp.name), sp).as(outputName(sp)))
    val zipped = raw.select(
      (col(RecId) +: svCols) :+ posexplode_outer(arrays_zip(arrays: _*)).as(Seq("pos", "mv")): _*)

    val vmCols = vms.map { sp =>
      compileValue(col("mv").getField(outputName(sp)), sp.copy(transformation = ""))
        .as(outputName(sp))
    }
    // VS fields: second-level decode of the positional element
    val vsCols = vss.map { sp =>
      T24.mvSplit(col("mv").getField(outputName(sp))).as(outputName(sp) + "_VS")
    }
    zipped.select(
      (col(RecId) +: svs.map(sp => col(outputName(sp)))) ++
        Seq((col("pos") + 1).as(MvPos)) ++ vmCols ++ vsCols: _*)
  }

  /** Full pipeline, mirroring the reference's handler dispatch
    * (`controllers/index.js:573-610`): multivalue explode when any
    * VM/VS field is flagged, plain MAPPED otherwise.
    */
  def pipeline(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame =
    if (schema.exists(sp => sp.parseVm || sp.parseVs)) multivalue(raw, schema)
    else mapped(raw, schema)

  // ---- SQL text emission (parity with the reference's generated stmts) ----

  private def sqlValue(input: String, spec: FieldSpec): String = {
    val v = spec.transformation match {
      case ""                => input
      case "parse_date"      => s"CAST(TRY_TO_TIMESTAMP($input, 'yyyyMMdd') AS DATE)"
      case "parse_timestamp" => s"TRY_TO_TIMESTAMP($input, 'yyMMddHHmm')"
      case "substring"       => s"SUBSTRING($input, 1, 35)"
      case "seab_field"      => s"TRY_ELEMENT_AT(SPLIT($input, '_'), 2)"
      case "inputter_his" =>
        s"SUBSTRING(REGEXP_REPLACE(ARRAY_JOIN(TRANSFORM(SPLIT(REGEXP_REPLACE($input, '${T24.MvLead}', ''), '#(s?[0-9]*:)?'), x -> SPLIT(x, '_')[1]), ' ', 'null'), 'null ', ''), 1, 4000)"
      case JoinArgT(delim) =>
        s"ARRAY_JOIN(FILTER(SPLIT(REGEXP_REPLACE($input, '${T24.MvLead}', ''), '#(s?[0-9]+:)?'), x -> x <> ''), '$delim')"
      case "string-join" =>
        s"ARRAY_JOIN(FILTER(SPLIT(REGEXP_REPLACE($input, '${T24.MvLead}', ''), '#(s?[0-9]+:)?'), x -> x <> ''), ' ')"
      case IndexT(n) =>
        s"TRY_ELEMENT_AT(FILTER(SPLIT($input, '${T24.MvMarker}'), x -> x <> ''), ${n.toInt})"
      case other => sys.error(s"unsupported transformation: $other")
    }
    if (spec.dataType == "string") v else s"TRY_CAST($v AS ${spec.dataType})"
  }

  /** Spark SQL text of the MAPPED statement over a source table/view —
    * the analog of the reference's `stmtMapped` template output. */
  def mappedSql(schema: Seq[FieldSpec], source: String): String = {
    val fields = schema.filter(_.parseSv).map { sp =>
      sp.transformation match {
        case TemplateT(fn, args, alias) =>
          val body = s"${fn.toUpperCase}(${args.replace("$", s"$Record['${sp.name}']")})"
          val cast = if (sp.dataType == "string") body
            else s"TRY_CAST($body AS ${sp.dataType})"
          val name = if (alias.nonEmpty) alias.toUpperCase else outputName(sp)
          s"  $cast AS $name"
        case _ =>
          s"  ${sqlValue(s"$Record['${sp.name}']", sp)} AS ${outputName(sp)}"
      }
    }
    (s"SELECT\n  $RecId," +: fields.mkString(",\n") +: Nil).mkString("\n") +
      s"\nFROM $source"
  }

  /** CREATE TABLE DDL for the sink — the analog of the reference's
    * `stmtDdl` template output (`controllers/index.js:408,567`). The
    * target schema IS the compiled pipeline's schema. */
  def sinkDdl(schema: Seq[FieldSpec], tableName: String,
              multivalue: Boolean = false): String = {
    val fieldCols = schema.filter(_.parseSv).map { sp =>
      s"  ${outputName(sp)} ${sp.dataType.toUpperCase}"
    }
    val mvCols =
      if (multivalue)
        s"  $MvPos INT" +:
          schema.filter(_.parseVm).map(sp => s"  ${outputName(sp)} STRING") ++:
          schema.filter(_.parseVs).map(sp => s"  ${outputName(sp)}_VS ARRAY<STRING>")
      else Seq.empty
    (s"CREATE TABLE $tableName (" +: (s"  $RecId STRING" +: (fieldCols ++ mvCols))
      .mkString(",\n") +: Seq(") USING parquet")).mkString("\n")
  }
}
