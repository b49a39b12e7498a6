package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * AQE's skew-join handling (on by default) splits oversized partitions
  * at runtime; salting is the static complement for joins where one
  * side's hot keys are known to dwarf a task — e.g. a fact⋈fact join on
  * a power-law key at 100 TB. The build (smaller) side is replicated
  * `saltFactor` times; the probe side scatters each row to one salt
  * deterministically, so hot keys fan out over `saltFactor` tasks while
  * total build-side volume grows only by the factor.
  */
object SkewJoin {

  /** @param probe     the large, skewed side
    * @param build     the smaller side (replicated `saltFactor`×)
    * @param keys      equi-join key columns present on both sides
    * @param scatterOn probe column whose hash spreads rows over salts
    *                  (any well-distributed column; the row's identity)
    * @return inner-join result, bit-identical to the unsalted join */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 scatterOn: Column, saltFactor: Int = 8): DataFrame = {
    val p = probe.withColumn("__salt", pmod(xxhash64(scatterOn), lit(saltFactor)).cast("int"))
    val b = build.withColumn("__salt", explode(sequence(lit(0), lit(saltFactor - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
