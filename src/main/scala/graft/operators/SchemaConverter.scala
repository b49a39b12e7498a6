package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.T24

/** One field of a T24 schema document — the reference's `procData` items
  * (`/root/reference/src/controllers/index.js:10-26`): `name`,
  * `transformation`, target `type`, the three parse flags
  * (`should_parse_sv` / `_vm` / `_vs`), and the optional second-level
  * `nested` template.
  */
case class FieldSpec(
    name: String,
    dataType: String = "string",
    transformation: String = "",
    parseSv: Boolean = true,
    parseVm: Boolean = false,
    parseVs: Boolean = false,
    nested: String = "")

/** The reference's core capability re-expressed Spark-first.
  *
  * The reference compiles a schema document into KSQL *text* (RAW →
  * MAPPED → MULTIVALUE → SINK statements, `controllers/index.js:406-623`).
  * Here the same schema compiles directly into Catalyst `Column` trees
  * over a raw DataFrame (`RECID` string + `XMLRECORD map<string,string>`,
  * or a packed hex `BLOB`), so pushdown/pruning/codegen apply to the
  * generated pipeline. A SQL text emitter (`mappedSql`) keeps parity with
  * the reference's statement-generating API surface.
  *
  * Transformation grammar (reference `controllers/index.js:57-170`):
  *  - `""`              field passthrough `XMLRECORD['NAME']`
  *  - `"parse_date"`    PARSE_DATE yyyyMMdd
  *  - `"parse_timestamp"` PARSE_TIMESTAMP yyMMddHHmm
  *  - `"substring"`     SUBSTRING(x,1,35)
  *  - `"seab_field"`    split-by-'_'-take-2nd
  *  - `"string-join"` / `"string-join('<d>')"`  multivalue join
  *  - `"[n]"`           multivalue positional index (1-based)
  *  - `"inputter_his"`  the INPUTTER_HIS audit transform
  *  - `"FUNC(… $ …) [ALIAS]"` template: `$` = the field value (`DATA
  *    .RECID` when the field is named RECID, `:104-105`), `$$` = the
  *    field NAME spliced as text (`:110-111`; exclusive with `$`)
  *  - `"FUNC([n] [params]) [ALIAS]"` — FUNC over the n-th multivalue
  *    element, params inferred from the function (parse_date →
  *    `'yyyyMMdd'`, substring → `1,35`, seab_field → `'_',2`) or given
  *    explicitly (`:115-143`)
  *  - anything else     raw-expression passthrough, emitted verbatim
  *    (`:145-146`)
  * After the transformation, an optional `nested` template (`FUNC($)
  * [ALIAS]`) wraps the result (`:149-153`), then a CAST to the target
  * type (`:155-157`). `LOCALREF_` name prefixes are stripped (`:67-69`).
  * VM/VS fields receive the SAME dispatch per exploded element — the
  * reference's `multiParser` (`:172-290`).
  */
object SchemaConverter {
  val RecId = "RECID"
  val Record = "XMLRECORD"
  /** Packed-record input column for the BLOB FE/FEFD modes. */
  val Blob = "BLOB"
  /** Position column added by the multivalue explode stage. */
  val MvPos = "MV_POS"

  /** T24 packed-record delimiters after a latin-1 decode of the blob
    * (every byte maps to one char, so 0xFE/0xFD/0xFC survive). */
  val FeSep = "þ" // 0xFE: field marker
  val FdSep = "ý" // 0xFD: value (multivalue) marker
  val FcSep = "ü" // 0xFC: subvalue marker

  private val IndexT = """^\[(\d+)\]$""".r
  private val JoinArgT = """string-join\('([^']*)'\)""".r
  /** `FUNC(args) [ALIAS]` template transformations — the reference's
    * `$`-substitution parser (`controllers/index.js:96-144`). */
  private val TemplateT = """^([^\s(]+)\((.*)\)\s*(\S*)$""".r
  /** Template args of the `[n] params` element form (`:115-143`). */
  private val MvElemT = """^\[(\d+)\](.*)$""".r
  /** `nested` second-level template: `FUNC($) [ALIAS]` (`:149-153`). */
  private val NestedT = """(?s)^(.*\))\s*(\S*)\s*$""".r

  /** Attribute name spliced into template SQL where `$` appeared; the
    * parsed tree has the input column's expression substituted at every
    * such reference — the reference's string substitution, but the
    * result is a Catalyst tree, not text. */
  private val Placeholder = "__GRAFT_IN__"

  private def spliceSql(sqlTemplate: String, input: Column): Column = {
    val inExpr = org.apache.spark.sql.GraftBridge.expression(input)
    // parse eagerly (Column's expr() defers parsing to analysis, which
    // would hide the placeholder from the transform below)
    val parsed = org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(sqlTemplate)
    org.apache.spark.sql.GraftBridge.column(parsed.transformUp {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts == Seq(Placeholder) => inExpr
    })
  }

  def outputName(spec: FieldSpec): String = {
    val base =
      if (spec.name.startsWith("LOCALREF_")) spec.name.stripPrefix("LOCALREF_")
      else spec.name
    base.toUpperCase
  }

  /** Whether the transformation consumes the multivalue-encoded input —
    * the reference then reads the `NAME_multivalue` record key instead
    * of `NAME` (`controllers/index.js:78,93,107,118`). */
  private[operators] def readsMultivalue(transformation: String): Boolean =
    transformation match {
      case JoinArgT(_)   => true
      case "string-join" => true
      case IndexT(_)     => true
      case TemplateT(_, args, _) =>
        if (args.contains("$"))
          !args.contains("$$") && transformation.contains("string-join")
        else MvElemT.pattern.matcher(args).matches()
      case _ => false
    }

  /** The XML-record input column for a field: the T24 layout stores
    * multivalued fields under `NAME_multivalue` (and the INPUTTER_HIS
    * audit field reads `INPUTTER_multivalue`, reference `:70-72`); the
    * coalesce accepts either layout, so schemas written for the
    * reference and this engine's plain-key tests both resolve. */
  private def recordInput(spec: FieldSpec): Column =
    if (spec.name == "INPUTTER_HIS")
      coalesce(col(Record)("INPUTTER_multivalue"), col(Record)("INPUTTER"))
    else if (readsMultivalue(spec.transformation))
      coalesce(col(Record)(spec.name + "_multivalue"), col(Record)(spec.name))
    else col(Record)(spec.name)

  /** SQL mirror of [[recordInput]]. */
  private def recordInputSql(spec: FieldSpec): String =
    if (spec.name == "INPUTTER_HIS")
      s"COALESCE($Record['INPUTTER_multivalue'], $Record['INPUTTER'])"
    else if (readsMultivalue(spec.transformation))
      s"COALESCE($Record['${spec.name}_multivalue'], $Record['${spec.name}'])"
    else s"$Record['${spec.name}']"

  /** Params for the `FUNC([n])` element form when none are given —
    * inferred from the function mentioned in the transformation
    * (reference `controllers/index.js:121-129`). */
  private def inferredParams(transformation: String): String = {
    val t = transformation.toLowerCase
    if (t.contains("parse_date")) ", 'yyyyMMdd'"
    else if (t.contains("parse_timestamp")) ", 'yyMMddHHmm'"
    else if (t.contains("substring")) ",1,35"
    else if (t.contains("seab_field")) ",'_',2"
    else ""
  }

  /** SQL of the n-th (1-based) element of a multivalue-encoded string
    * (reference `:93`: FILTER(REGEXP_SPLIT_TO_ARRAY(…))[n]). */
  private def elemSql(input: String, n: String): String =
    s"TRY_ELEMENT_AT(FILTER(SPLIT($input, '${T24.MvMarker}'), x -> x <> ''), $n)"

  /** Compile one field's full transform chain over its input value
    * column: transformation dispatch → optional `nested` wrap → CAST.
    * Returns the output column and its (possibly template-aliased)
    * name. Template `FUNC` names resolve through the session registry —
    * `Engine.registerFunctions` provides the KSQL surface (PARSE_DATE,
    * SEAB_FIELD, …) as native expressions.
    */
  def compileField(value: Column, spec: FieldSpec,
                   recId: Column = col(RecId)): (Column, String) = {
    val defaultName = outputName(spec)
    // the INPUTTER_HIS field NAME forces the audit transform regardless
    // of its transformation (reference :70-72)
    val (base, name) = if (spec.name == "INPUTTER_HIS")
      (T24.inputterHis(value), "INPUTTER_HIS")
    else spec.transformation match {
      case ""                => (value, defaultName)
      case "parse_date"      => (T24.parseDate(value), defaultName)
      case "parse_timestamp" => (T24.parseTimestamp(value), defaultName)
      case "substring"       => (T24.substr35(value), defaultName)
      case "seab_field"      => (T24.seabField(value, "_", 2), defaultName)
      case "inputter_his"    => (T24.inputterHis(value), defaultName)
      case JoinArgT(delim)   => (T24.mvJoin(value, delim), defaultName)
      case "string-join"     => (T24.mvJoin(value, " "), defaultName)
      case IndexT(n)         => (T24.mvIndex(value, n.toInt), defaultName)
      case TemplateT(fn, args, alias) =>
        val outName = if (alias.nonEmpty) alias.toUpperCase else defaultName
        // RECID as template input maps to the record key, not the map
        // (reference :104-105)
        val input = if (spec.name == RecId) recId else value
        if (args.contains("$$")) {
          // `$$` splices the field NAME into the template text
          // (reference :110-111; exclusive with `$`)
          (expr(s"${fn.toUpperCase}(${args.replace("$$", spec.name)})"), outName)
        } else if (args.contains("$")) {
          (spliceSql(s"${fn.toUpperCase}(${args.replace("$", Placeholder)})", input), outName)
        } else args match {
          case MvElemT(n, extra) =>
            val params =
              if (extra.exists(c => c != ',' && !c.isWhitespace)) extra
              else inferredParams(spec.transformation)
            (spliceSql(s"${fn.toUpperCase}(${elemSql(Placeholder, n)}$params)", input), outName)
          case _ =>
            // template body without `$` or `[n]`: raw passthrough
            (expr(spec.transformation), outName)
        }
      // unrecognized transformation: raw-expression passthrough,
      // emitted verbatim (reference :145-146)
      case other => (expr(other), defaultName)
    }
    val (wrapped, name2) =
      if (spec.nested.contains("$")) spec.nested match {
        case NestedT(tpl, alias2) =>
          (spliceSql(tpl.replace("$", Placeholder), base),
            if (alias2.nonEmpty) alias2.toUpperCase else name)
        case _ => (base, name)
      } else (base, name)
    // try_cast: a malformed value nulls the field, never the pipeline
    // (KSQL semantics; ANSI cast would fail the job on one bad record)
    val cast = if (spec.dataType == "string") wrapped else wrapped.try_cast(spec.dataType)
    (cast, name2)
  }

  /** Compile one field's transformation over an input value column
    * (name-less convenience over [[compileField]]). */
  def compileValue(value: Column, spec: FieldSpec): Column =
    compileField(value, spec)._1

  /** MAPPED stage: RECID + one compiled column per single-value field. */
  def mapped(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    val cols = col(RecId) +: schema.filter(_.parseSv).map { sp =>
      val (c, name) = compileField(recordInput(sp), sp)
      c.as(name)
    }
    raw.select(cols: _*)
  }

  /** BLOB-mode MAPPED stage (reference `controllers/index.js:293-403`,
    * `BLOB_SPLIT`): field values arrive hex-encoded
    * (`SEAB_HEXTOTEXT(FROM_BYTES(…,'hex'))`); decode precedes every
    * per-field transformation. */
  def blobMapped(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    val cols = col(RecId) +: schema.filter(_.parseSv).map { sp =>
      val (c, name) = compileField(T24.hexToText(col(Record)(sp.name)), sp)
      c.as(name)
    }
    raw.select(cols: _*)
  }

  /** BLOB FE / FEFD packed-record modes (reference handler dispatch
    * `controllers/index.js:582-601`): the whole record arrives as ONE
    * hex blob; 0xFE bytes delimit fields POSITIONALLY (schema order),
    * and in FEFD mode 0xFD bytes delimit multivalue elements within a
    * field (0xFC for subvalues). The blob is decoded once via latin-1
    * (delimiter bytes survive as chars), split, and each positional
    * field runs the same compileField dispatch as the XML path; VM/VS
    * fields explode exactly like [[multivalue]].
    */
  def blobFe(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    // ONE byte pass over the hex blob (unhex + latin-1 + FE/FD split
    // fused — plans/MvExprs.scala); the composed
    // split(decode(unhex(..)), quote(þ)) chain Pattern.compiled per
    // row and round-tripped through java.lang.String twice. Decoded
    // ONCE into a real column: CollapseProject refuses to inline a
    // non-cheap expression used by several fields, so the decode is
    // never duplicated across field extractions.
    val DecTmp = "__FEFD"
    val withDec = raw.withColumn(DecTmp,
      org.apache.spark.sql.GraftBridge.column(
        graft.plans.MvDecode(
          org.apache.spark.sql.GraftBridge.expression(col(Blob)))))
    def elemsAt(i: Int) = try_element_at(col(DecTmp), lit(i + 1))
    // a single-value field is the FD-join of its elements (identity
    // when the field never contained an FD marker)
    def fieldAt(i: Int) = array_join(elemsAt(i), FdSep)
    val posed = schema.zipWithIndex
    val svs = posed.filter(_._1.parseSv)
    val vms = posed.filter(_._1.parseVm)
    val vss = posed.filter(_._1.parseVs)
    if (vms.isEmpty && vss.isEmpty) {
      withDec.select(col(RecId) +: svs.map { case (sp, i) =>
        val (c, n) = compileField(fieldAt(i), sp); c.as(n)
      }: _*)
    } else {
      val arrays = (vms ++ vss).map { case (sp, i) =>
        elemsAt(i).as(outputName(sp))
      }
      val svPairs = svs.map { case (sp, i) => compileField(fieldAt(i), sp) }
      val zipped = withDec.select((col(RecId) +: svPairs.map { case (c, n) => c.as(n) }) :+
        posexplode_outer(arrays_zip(arrays: _*)).as(Seq("pos", "mv")): _*)
      val vmCols = vms.map { case (sp, _) =>
        val (c, n) = compileField(col("mv").getField(outputName(sp)), sp)
        c.as(n)
      }
      val vsCols = vss.map { case (sp, _) =>
        transform(
          org.apache.spark.sql.GraftBridge.column(graft.plans.SplitChar(
            org.apache.spark.sql.GraftBridge.expression(
              col("mv").getField(outputName(sp))), FcSep)),
          e => compileField(e, sp)._1
        ).as(outputName(sp) + "_VS")
      }
      zipped.select(
        (col(RecId) +: svPairs.map(p => col(p._2))) ++
          Seq((col("pos") + 1).as(MvPos)) ++ vmCols ++ vsCols: _*)
    }
  }

  /** MULTIVALUE stage: decode every VM field to its element array, zip
    * the arrays (T24 multivalues are positionally aligned), and explode
    * one row per position — Spark's Generate operator instead of the
    * reference's self-join template. Single-value fields ride along.
    * Each exploded element then receives the FULL per-field transform
    * dispatch (the reference's `multiParser`, `controllers/index.js:
    * 172-290`) — a multivalued date field parses per element. VS
    * (subvalue) fields decode a second level within each element and
    * transform per subvalue.
    */
  def multivalue(raw: DataFrame, schema: Seq[FieldSpec]): DataFrame = {
    val svs = schema.filter(_.parseSv)
    val vms = schema.filter(_.parseVm)
    val vss = schema.filter(_.parseVs)
    require(vms.nonEmpty || vss.nonEmpty, "multivalue stage needs a VM/VS field")

    val arrays = (vms ++ vss).map { sp =>
      T24.mvSplit(coalesce(col(Record)(sp.name + "_multivalue"), col(Record)(sp.name)))
        .as(outputName(sp))
    }
    val svPairs = svs.map(sp => compileField(recordInput(sp), sp))
    val zipped = raw.select(
      (col(RecId) +: svPairs.map { case (c, n) => c.as(n) }) :+
        posexplode_outer(arrays_zip(arrays: _*)).as(Seq("pos", "mv")): _*)

    // per-element transformations (reference multiParser :172-290)
    val vmCols = vms.map { sp =>
      val (c, n) = compileField(col("mv").getField(outputName(sp)), sp)
      c.as(n)
    }
    // VS fields: second-level decode, then per-subvalue transforms
    val vsCols = vss.map { sp =>
      transform(T24.mvSplit(col("mv").getField(outputName(sp))),
        e => compileField(e, sp)._1).as(outputName(sp) + "_VS")
    }
    zipped.select(
      (col(RecId) +: svPairs.map(p => col(p._2))) ++
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
  // Emits the KSQL-shaped function names (PARSE_DATE, SEAB_FIELD, …);
  // Engine.registerFunctions makes them resolvable by spark.sql, so the
  // emitted statements run with the same native expressions as the
  // Column path.

  /** SQL text + output name of one field's full transform chain —
    * mirror of [[compileField]]. */
  def sqlField(input: String, spec: FieldSpec,
               recIdSql: String = RecId): (String, String) = {
    val defaultName = outputName(spec)
    val (body, name) = if (spec.name == "INPUTTER_HIS")
      (s"INPUTTER_HIS($input)", "INPUTTER_HIS")
    else spec.transformation match {
      case ""                => (input, defaultName)
      case "parse_date"      => (s"PARSE_DATE($input, 'yyyyMMdd')", defaultName)
      case "parse_timestamp" => (s"PARSE_TIMESTAMP($input, 'yyMMddHHmm')", defaultName)
      case "substring"       => (s"SUBSTRING($input, 1, 35)", defaultName)
      case "seab_field"      => (s"SEAB_FIELD($input, '_', 2)", defaultName)
      case "inputter_his"    => (s"INPUTTER_HIS($input)", defaultName)
      case JoinArgT(delim)   => (s"MV_JOIN($input, '$delim')", defaultName)
      case "string-join"     => (s"MV_JOIN($input, ' ')", defaultName)
      case IndexT(n)         => (s"MV_INDEX($input, ${n.toInt})", defaultName)
      case TemplateT(fn, args, alias) =>
        val outName = if (alias.nonEmpty) alias.toUpperCase else defaultName
        val in = if (spec.name == RecId) recIdSql else input
        if (args.contains("$$"))
          (s"${fn.toUpperCase}(${args.replace("$$", spec.name)})", outName)
        else if (args.contains("$"))
          (s"${fn.toUpperCase}(${args.replace("$", in)})", outName)
        else args match {
          case MvElemT(n, extra) =>
            val params =
              if (extra.exists(c => c != ',' && !c.isWhitespace)) extra
              else inferredParams(spec.transformation)
            (s"${fn.toUpperCase}(${elemSql(in, n)}$params)", outName)
          case _ => (spec.transformation, outName)
        }
      case other => (other, defaultName)
    }
    val (wrapped, name2) =
      if (spec.nested.contains("$")) spec.nested match {
        case NestedT(tpl, alias2) =>
          (tpl.replace("$", s"($body)"),
            if (alias2.nonEmpty) alias2.toUpperCase else name)
        case _ => (body, name)
      } else (body, name)
    val cast =
      if (spec.dataType == "string") wrapped
      else s"TRY_CAST($wrapped AS ${spec.dataType})"
    (cast, name2)
  }

  /** Built-in emission templates — overridable per name through
    * [[SchemaRegistry.putTemplate]], mirroring the reference's
    * user-editable template collection (`services/index.js:43-79`;
    * template names follow the reference's: XML for the mapped
    * statement, DDL_SINGLE / DDL_MULTIVALUE for the sink DDL). */
  val MappedTemplateName = "XML"
  val DdlSingleTemplateName = "DDL_SINGLE"
  val DdlMultiTemplateName = "DDL_MULTIVALUE"
  val DefaultMappedTemplate: String =
    "SELECT\n  ${recId},\n${selectedFields}\nFROM ${source}"
  val DefaultDdlTemplate: String =
    "CREATE TABLE ${tableName} (\n${columns}\n) USING parquet${optionsClause}"

  /** Spark SQL text of the MAPPED statement over a source table/view —
    * the analog of the reference's `stmtMapped` template output,
    * rendered through the registered `XML` template when one exists
    * (interpolation variables: `${recId}`, `${selectedFields}`,
    * `${source}` — also bound as `${sourceStream}` and
    * `${schemaName}`, the reference's names for it). */
  def mappedSql(schema: Seq[FieldSpec], source: String): String = {
    val fields = schema.filter(_.parseSv).map { sp =>
      val (sql, name) = sqlField(recordInputSql(sp), sp)
      s"  $sql AS $name"
    }
    SchemaRegistry.render(MappedTemplateName, DefaultMappedTemplate, Map(
      "recId" -> RecId,
      "selectedFields" -> fields.mkString(",\n"),
      "source" -> source,
      "sourceStream" -> source,
      "schemaName" -> source))
  }

  /** Statement-text names for the non-XML stages — the reference's
    * template collection keys (`controllers/index.js:575,419,588,602`). */
  val MultivalueTemplateName = "MULTIVALUE"
  val BlobSplitTemplateName = "BLOB_SPLIT"
  val BlobParseTemplateName = "BLOB_PARSE_T24"

  /** Internal derived-column prefix for the emitted multivalue /
    * packed-blob statements (never reaches the output schema). */
  private val ArrPrefix = "__graft_arr_"

  /** Shared emission of the exploded (multivalue) statement shape: a
    * derived table computes one named element-array per VM/VS field
    * (names feed ARRAYS_ZIP's struct-field naming — the same mechanism
    * as the Column stage's `.as(...)` aliases), LATERAL VIEW OUTER
    * POSEXPLODE zips and explodes them positionally, and the outer
    * select runs the per-element transform dispatch. `innerExtra`
    * prepends derived columns the arrays themselves need (the
    * packed-blob decode). */
  private def explodedSql(schema: Seq[FieldSpec], source: String,
                          templateName: String,
                          svInput: FieldSpec => String,
                          arrayOf: FieldSpec => String,
                          vsSplit: String => String,
                          innerExtra: Seq[String]): String = {
    val svs = schema.filter(_.parseSv)
    val vms = schema.filter(_.parseVm)
    val vss = schema.filter(_.parseVs)
    require(vms.nonEmpty || vss.nonEmpty, "multivalue statement needs a VM/VS field")
    val arrays = (vms ++ vss).map { sp =>
      s"${arrayOf(sp)} AS $ArrPrefix${outputName(sp)}"
    }
    val inner = (Seq("*") ++ innerExtra ++ arrays).mkString(",\n    ")
    val zipArgs = (vms ++ vss).map(sp => s"$ArrPrefix${outputName(sp)}").mkString(", ")
    val exploded =
      s"""(SELECT $inner\n  FROM $source) __graft_src
         |LATERAL VIEW OUTER POSEXPLODE(ARRAYS_ZIP($zipArgs)) __graft_mv AS pos, mv""".stripMargin
    val svFields = svs.map { sp =>
      val (sql, name) = sqlField(svInput(sp), sp)
      s"  $sql AS $name"
    }
    val vmFields = vms.map { sp =>
      val (sql, name) = sqlField(s"mv.$ArrPrefix${outputName(sp)}", sp)
      s"  $sql AS $name"
    }
    val vsFields = vss.map { sp =>
      val (sql, _) = sqlField("__graft_x", sp)
      s"  TRANSFORM(${vsSplit(s"mv.$ArrPrefix${outputName(sp)}")}, " +
        s"__graft_x -> $sql) AS ${outputName(sp)}_VS"
    }
    val fields =
      (svFields :+ s"  pos + 1 AS $MvPos") ++ vmFields ++ vsFields
    SchemaRegistry.render(templateName, DefaultMappedTemplate, Map(
      "recId" -> RecId,
      "selectedFields" -> fields.mkString(",\n"),
      "source" -> exploded,
      "sourceStream" -> exploded,
      "schemaName" -> source))
  }

  /** Spark SQL text of the MULTIVALUE statement — the analog of the
    * reference's `stmtMultival`+mapped output (`multiHandler`,
    * `controllers/index.js:413-567`), equal row-for-row to
    * [[multivalue]] (spec-pinned): element arrays via MV_SPLIT, the
    * positional ARRAYS_ZIP explode, per-element transform chains, VS
    * second-level decode. */
  def multivalueSql(schema: Seq[FieldSpec], source: String): String =
    explodedSql(schema, source, MultivalueTemplateName,
      svInput = recordInputSql,
      arrayOf = sp =>
        s"MV_SPLIT(COALESCE($Record['${sp.name}_multivalue'], $Record['${sp.name}']))",
      vsSplit = in => s"MV_SPLIT($in)",
      innerExtra = Seq.empty)

  /** Spark SQL text of the BLOB_SPLIT MAPPED statement (reference
    * `singleSplitBlobParser`, `controllers/index.js:294-403`): per-field
    * hex values decode through the reference's own
    * `SEAB_HEXTOTEXT(FROM_BYTES(..,'hex'))` pair before the transform
    * chain — equal to [[blobMapped]]. */
  def blobMappedSql(schema: Seq[FieldSpec], source: String): String = {
    val fields = schema.filter(_.parseSv).map { sp =>
      val (sql, name) = sqlField(
        s"SEAB_HEXTOTEXT(FROM_BYTES($Record['${sp.name}'], 'hex'))", sp)
      s"  $sql AS $name"
    }
    SchemaRegistry.render(BlobSplitTemplateName, DefaultMappedTemplate, Map(
      "recId" -> RecId,
      "selectedFields" -> fields.mkString(",\n"),
      "source" -> source,
      "sourceStream" -> source,
      "schemaName" -> source))
  }

  /** Spark SQL text of the BLOB FE / FEFD MAPPED statement (reference
    * `BLOB_PARSE_T24` dispatch, `controllers/index.js:582-601`) — equal
    * to [[blobFe]]: the packed record decodes ONCE via the registered
    * `MV_DECODE` (the same native expression the Column path uses),
    * fields read positionally, a single-value field FD-joins its
    * elements, and VM/VS fields ride the shared exploded shape with
    * `SPLIT_CHAR` for the 0xFC subvalue level. */
  def blobFeSql(schema: Seq[FieldSpec], source: String): String = {
    val Dec = s"${ArrPrefix}dec"
    val decoded = s"(SELECT *, MV_DECODE($Blob) AS $Dec FROM $source) __graft_dec"
    val posed = schema.zipWithIndex
    def elems(i: Int) = s"TRY_ELEMENT_AT($Dec, ${i + 1})"
    def fieldAt(i: Int) = s"ARRAY_JOIN(${elems(i)}, '$FdSep')"
    val posOf = posed.map { case (sp, i) => sp.name -> i }.toMap
    if (!schema.exists(sp => sp.parseVm || sp.parseVs)) {
      val fields = posed.filter(_._1.parseSv).map { case (sp, i) =>
        val (sql, name) = sqlField(fieldAt(i), sp)
        s"  $sql AS $name"
      }
      SchemaRegistry.render(BlobParseTemplateName, DefaultMappedTemplate, Map(
        "recId" -> RecId,
        "selectedFields" -> fields.mkString(",\n"),
        "source" -> decoded,
        "sourceStream" -> decoded,
        "schemaName" -> source))
    } else explodedSql(schema, decoded, BlobParseTemplateName,
      svInput = sp => fieldAt(posOf(sp.name)),
      arrayOf = sp => elems(posOf(sp.name)),
      vsSplit = in => s"SPLIT_CHAR($in, '$FcSep')",
      innerExtra = Seq.empty)
  }

  /** CREATE TABLE DDL for the sink — the analog of the reference's
    * `stmtDdl` template output (`controllers/index.js:408,567`),
    * rendered through the registered `DDL_SINGLE` / `DDL_MULTIVALUE`
    * template when one exists (variables: `${tableName}`, `${columns}`,
    * `${options}`, `${optionsClause}`). The target schema IS the
    * compiled pipeline's schema. `options` carries WITH-style sink
    * options (the reference's DDL templates embed topic/format options)
    * emitted as an `OPTIONS ('k' = 'v', …)` clause. */
  def sinkDdl(schema: Seq[FieldSpec], tableName: String,
              multivalue: Boolean = false,
              options: Seq[(String, String)] = Seq.empty): String = {
    // the DDL column name must be the STATEMENT's output name — for
    // template-aliased fields (`UPPER($) KEY2`) that is the alias, not
    // the field name (sqlField's name resolution is input-independent)
    def ddlName(sp: FieldSpec): String = sqlField("NULL", sp)._2
    val fieldCols = schema.filter(_.parseSv).map { sp =>
      s"  ${ddlName(sp)} ${sp.dataType.toUpperCase}"
    }
    val mvCols =
      if (multivalue)
        s"  $MvPos INT" +:
          schema.filter(_.parseVm).map(sp => s"  ${ddlName(sp)} STRING") ++:
          schema.filter(_.parseVs).map(sp => s"  ${outputName(sp)}_VS ARRAY<STRING>")
      else Seq.empty
    def esc(s: String) = s.replace("'", "''")
    val optionsSql = options
      .map { case (k, v) => s"'${esc(k)}' = '${esc(v)}'" }
      .mkString(", ")
    val templateName = if (multivalue) DdlMultiTemplateName else DdlSingleTemplateName
    SchemaRegistry.render(templateName, DefaultDdlTemplate, Map(
      "tableName" -> tableName,
      "columns" -> (s"  $RecId STRING" +: (fieldCols ++ mvCols)).mkString(",\n"),
      "options" -> optionsSql,
      "optionsClause" -> (if (options.isEmpty) "" else s"\nOPTIONS ($optionsSql)")))
  }
}
