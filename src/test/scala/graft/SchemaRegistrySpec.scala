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
}
