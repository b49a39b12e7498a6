package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{FieldSpec, SchemaRegistry}

class SchemaRegistrySpec extends AnyFunSuite {
  import SparkTest._

  private val schema = Seq(
    FieldSpec("NAME"),
    FieldSpec("D", dataType = "date", transformation = "parse_date"),
    FieldSpec("MV", transformation = "string-join('|')"))

  test("registry CRUD + compile-and-run") {
    import spark.implicits._
    SchemaRegistry.put("PROC_TEST", schema)
    assert(SchemaRegistry.list().contains("PROC_TEST"))
    val raw = Seq(("1", Map("NAME" -> "A", "D" -> "20240131", "MV" -> "1:x#2:y")))
      .toDF("RECID", "XMLRECORD")
    val out = SchemaRegistry.run(raw, "PROC_TEST").collect()
    assert(out.head.getString(1) == "A" && out.head.getString(3) == "x|y")
    SchemaRegistry.remove("PROC_TEST")
    assert(!SchemaRegistry.list().contains("PROC_TEST"))
  }

  test("schemas persist to parquet and load back identically") {
    val dir = Files.createTempDirectory("graft_reg").toString
    SchemaRegistry.put("PROC_A", schema)
    SchemaRegistry.put("PROC_B", Seq(FieldSpec("ONLY")))
    SchemaRegistry.save(spark, s"$dir/schemas")
    SchemaRegistry.remove("PROC_A")
    SchemaRegistry.remove("PROC_B")
    SchemaRegistry.load(spark, s"$dir/schemas")
    assert(SchemaRegistry.get("PROC_A").map(_.toSet) == Some(schema.toSet))
    assert(SchemaRegistry.get("PROC_B") == Some(Seq(FieldSpec("ONLY"))))
    SchemaRegistry.remove("PROC_A")
    SchemaRegistry.remove("PROC_B")
  }

  test("template CRUD + PUT /api/template/all semantics") {
    try {
      SchemaRegistry.putTemplate("T_A", "select ${x}")
      SchemaRegistry.putTemplate("T_B", "drop me")
      assert(SchemaRegistry.listTemplates().count(_.startsWith("T_")) == 2)
      // updateAllTemplates: present upserts, absent removes (reference
      // services/index.js:53-68)
      SchemaRegistry.updateAllTemplates(Seq(
        "T_A" -> Some("select ${x} from ${y}"),
        "T_B" -> None))
      assert(SchemaRegistry.getTemplate("T_A") == Some("select ${x} from ${y}"))
      assert(SchemaRegistry.getTemplate("T_B").isEmpty)
      // interpolation substitutes known vars, leaves unknown refs visible
      val out = SchemaRegistry.render("T_A", "unused", Map("x" -> "1"))
      assert(out == "select 1 from ${y}")
      // single-pass: a ${ref} inside a substituted VALUE is literal
      // output, never re-expanded against the other vars
      val nested = SchemaRegistry.render("T_NONE", "v=${x}",
        Map("x" -> "uses ${y} verbatim", "y" -> "BOOM"))
      assert(nested == "v=uses ${y} verbatim")
      // an unregistered name renders the caller's default
      assert(SchemaRegistry.render("T_NONE", "d ${x}", Map("x" -> "2")) == "d 2")
    } finally {
      SchemaRegistry.removeTemplate("T_A")
      SchemaRegistry.removeTemplate("T_B")
    }
  }

  test("templates persist to parquet and load back identically") {
    val dir = Files.createTempDirectory("graft_tpl").toString
    try {
      SchemaRegistry.putTemplate("T_P", "CREATE ${tableName} WITH (${options})")
      SchemaRegistry.saveTemplates(spark, s"$dir/templates")
      SchemaRegistry.removeTemplate("T_P")
      SchemaRegistry.loadTemplates(spark, s"$dir/templates")
      assert(SchemaRegistry.getTemplate("T_P") ==
        Some("CREATE ${tableName} WITH (${options})"))
    } finally SchemaRegistry.removeTemplate("T_P")
  }

  test("createTestData seeds a collection with the live template set (routes/index.js:12)") {
    val dir = Files.createTempDirectory("graft_seed").toString
    try {
      SchemaRegistry.putTemplate("T_S1", "SELECT ${cols} FROM ${src}")
      SchemaRegistry.putTemplate("T_S2", "CREATE STREAM ${name}")
      val seeded = SchemaRegistry.createTestData(spark, s"$dir/coll")
      // the endpoint returns the upserted set ...
      assert(seeded.toMap.view.filterKeys(_.startsWith("T_S")).toMap == Map(
        "T_S1" -> "SELECT ${cols} FROM ${src}",
        "T_S2" -> "CREATE STREAM ${name}"))
      // ... and the target collection is a real table the registry can
      // load back from a cold start
      SchemaRegistry.removeTemplate("T_S1")
      SchemaRegistry.removeTemplate("T_S2")
      SchemaRegistry.loadTemplates(spark, s"$dir/coll")
      assert(SchemaRegistry.getTemplate("T_S1") == Some("SELECT ${cols} FROM ${src}"))
      assert(SchemaRegistry.getTemplate("T_S2") == Some("CREATE STREAM ${name}"))
    } finally {
      SchemaRegistry.removeTemplate("T_S1")
      SchemaRegistry.removeTemplate("T_S2")
    }
  }
}
