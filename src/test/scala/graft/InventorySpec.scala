package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Guards the coverage contract: SURVEY.md §2's checklist names must
  * equal `SparkEntry.queries` keys exactly (the round-5 verdict found
  * d36_gopher_rules oracled and green but missing from the inventory —
  * this spec makes that drift impossible to recommit). Checklist items
  * that are not driver-oracled query keys (streaming pipelines, source
  * layouts, registry CRUD, interop-evidence lines) use non-key naming
  * and are excluded by the key shape itself.
  */
class InventorySpec extends AnyFunSuite {

  private val KeyShape = "^(q\\d+|d\\d+b?|e\\d+|m\\d+|t24)_[a-z0-9_]+$".r

  private def surveySection2Names: Set[String] = {
    val lines = Files.readAllLines(Paths.get("SURVEY.md")).asScala
    val start = lines.indexWhere(_.startsWith("## §2 "))
    val end = lines.indexWhere(_.startsWith("## §3 "))
    require(start >= 0 && end > start, "SURVEY.md §2/§3 headers not found")
    val Item = "^- \\[[xX ]\\] `([^`]+)`.*$".r
    lines.slice(start, end).collect {
      case Item(name) if KeyShape.matches(name) => name
    }.toSet
  }

  test("SURVEY §2 checklist names equal SparkEntry.queries keys") {
    val survey = surveySection2Names
    val keys = SparkEntry.queries.keySet.filter(KeyShape.matches)
    val missingFromSurvey = keys -- survey
    val missingFromCode = survey -- keys
    assert(missingFromSurvey.isEmpty,
      s"queries implemented but absent from SURVEY §2: ${missingFromSurvey.toSeq.sorted.mkString(", ")}")
    assert(missingFromCode.isEmpty,
      s"SURVEY §2 claims queries that do not exist: ${missingFromCode.toSeq.sorted.mkString(", ")}")
  }

  test("every query key has the key shape the inventory check relies on") {
    val offShape = SparkEntry.queries.keySet.filterNot(KeyShape.matches)
    assert(offShape.isEmpty,
      s"query keys outside the inventory key shape (rename or extend KeyShape): ${offShape.toSeq.sorted.mkString(", ")}")
  }

  test("every oracleSql key names an existing query") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracleSql without a query: ${dangling.toSeq.sorted.mkString(", ")}")
  }
}
