package graft.operators

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.SparkSession

/** Schema/template store — the reference keeps proc schemas and
  * statement templates in Couchbase collections with CRUD endpoints
  * (`/api/proc-data`, `/api/template*`; `src/services/index.js:31-79`).
  * The lake-native analog: an in-memory registry with parquet
  * persistence, so a deployment stores its schema documents next to
  * its data and every executor can read them.
  */
object SchemaRegistry {

  private val store = TrieMap.empty[String, Seq[FieldSpec]]

  def put(name: String, schema: Seq[FieldSpec]): Unit = store.put(name, schema)
  def get(name: String): Option[Seq[FieldSpec]] = store.get(name)
  def remove(name: String): Unit = store.remove(name)
  def list(): Seq[String] = store.keys.toSeq.sorted

  /** Persist every registered schema to one parquet dataset. Field
    * order is PERSISTED (`pos`): it is semantically positional for the
    * BLOB FE/FEFD modes, and parquet read order is not write order. */
  def save(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    store.toSeq
      .flatMap { case (n, fs) => fs.zipWithIndex.map { case (f, i) =>
        (n, i, f.name, f.dataType, f.transformation, f.parseSv, f.parseVm,
          f.parseVs, f.nested) } }
      .toDF("schema_name", "pos", "name", "dataType", "transformation",
        "parseSv", "parseVm", "parseVs", "nested")
      .write.mode("overwrite").parquet(path)
  }

  /** Load schemas persisted by [[save]] into the registry. Reads
    * pre-`nested`/pre-`pos` datasets too (defaults "", file order). */
  def load(spark: SparkSession, path: String): Unit = {
    import org.apache.spark.sql.functions.{col, lit, monotonically_increasing_id}
    val df0 = spark.read.parquet(path)
    val df1 = if (df0.columns.contains("nested")) df0 else df0.withColumn("nested", lit(""))
    val df = if (df1.columns.contains("pos")) df1
      else df1.withColumn("pos", monotonically_increasing_id())
    import spark.implicits._
    df.select(col("schema_name"), col("pos").cast("long"), col("name"), col("dataType"),
        col("transformation"), col("parseSv"), col("parseVm"), col("parseVs"), col("nested"))
      .as[(String, Long, String, String, String, Boolean, Boolean, Boolean, String)]
      .collect()
      .groupBy(_._1)
      .foreach { case (n, rows) =>
        put(n, rows.toSeq.sortBy(_._2)
          .map(r => FieldSpec(r._3, r._4, r._5, r._6, r._7, r._8, r._9)))
      }
  }

  /** Compile-and-run a registered schema over a raw frame — the
    * `/api/etl-pipeline` + `/api/execute` composition. */
  def run(raw: org.apache.spark.sql.DataFrame, name: String): org.apache.spark.sql.DataFrame =
    SchemaConverter.pipeline(raw,
      get(name).getOrElse(sys.error(s"schema not registered: $name")))

  // ---- statement templates ------------------------------------------------
  // The reference keeps the emission statement TEMPLATES themselves
  // user-editable in a Couchbase collection (names like RAW, XML, SINK,
  // DDL_SINGLE, DDL_MULTIVALUE; `src/services/index.js:43-79`, routes
  // `GET|PUT /api/template*`) and interpolates them at compile time
  // (`src/controllers/index.js:573-615`). Analog: a named template store
  // with the same CRUD surface; interpolation is pure `${var}`
  // substitution (the reference eval's a JS template literal — running
  // arbitrary code from a data store is exactly what an engine must NOT
  // do, so substitution is the deliberate Spark-first semantics).
  // `SchemaConverter.mappedSql`/`sinkDdl` render through a registered
  // template when present and fall back to the built-in default.

  private val templates = TrieMap.empty[String, String]

  def putTemplate(name: String, template: String): Unit =
    templates.put(name, template)
  def getTemplate(name: String): Option[String] = templates.get(name)
  def removeTemplate(name: String): Unit = templates.remove(name)
  def listTemplates(): Seq[String] = templates.keys.toSeq.sorted

  /** `PUT /api/template/all` semantics (`services/index.js:53-68`): a
    * present template upserts, an absent one removes its entry. */
  def updateAllTemplates(entries: Seq[(String, Option[String])]): Unit =
    entries.foreach {
      case (n, Some(t)) => putTemplate(n, t)
      case (n, None)    => removeTemplate(n)
    }

  /** Interpolate `${var}` references in the named template, or in
    * `default` when no template with that name is registered. Unknown
    * `${var}` references are left verbatim (visible in the output,
    * never silently dropped). Single-pass: a `${var}` occurring inside
    * a substituted VALUE is never re-expanded (a sequential
    * replace-per-key would splice later keys into earlier values, in
    * Map-iteration order). */
  def render(name: String, default: String, vars: Map[String, String]): String =
    VarRef.replaceAllIn(templates.getOrElse(name, default), m =>
      scala.util.matching.Regex.quoteReplacement(
        vars.getOrElse(m.group(1), m.matched)))

  private val VarRef = """\$\{([A-Za-z0-9_]+)\}""".r

  /** `GET /api/createTestData?collectionName` semantics
    * (`services/index.js:93-99`, `routes/index.js:12`): seed a named
    * collection with the CURRENT template set — the reference reads
    * every template (`getAllTemplates`) and upserts each into the
    * target collection via `updateAllTemplates` (a null template
    * removes its key). Here a "collection" is a parquet table under
    * `path` (the [[saveTemplates]] layout), so the test-data seeding
    * endpoint is: snapshot the live template store into a fresh
    * collection table. Returns the seeded (template_name, template)
    * pairs like the endpoint returns the update result. */
  def createTestData(spark: SparkSession, path: String): Seq[(String, String)] = {
    saveTemplates(spark, path)
    templates.toSeq.sortBy(_._1)
  }

  /** Persist the template store next to the schemas ([[save]]). */
  def saveTemplates(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    templates.toSeq.toDF("template_name", "template")
      .write.mode("overwrite").parquet(path)
  }

  /** Load templates persisted by [[saveTemplates]]. */
  def loadTemplates(spark: SparkSession, path: String): Unit = {
    import spark.implicits._
    spark.read.parquet(path)
      .select("template_name", "template")
      .as[(String, String)].collect()
      .foreach { case (n, t) => putTemplate(n, t) }
  }
}
