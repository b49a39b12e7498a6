package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row with the
  * same key and `right.ts <= left.ts`.
  *
  * Implemented as a union-merge: tag both sides, shuffle ONCE on the
  * key, sort within the partition, and carry the latest right values
  * forward with `last(_, ignoreNulls)` — the merge-based plan. The
  * alternative (range-condition join) degenerates into a per-key cross
  * product at scale; this shape is one shuffle + one window sort
  * regardless of time-range density, and AQE handles key skew.
  *
  * Tie rule: a right row at exactly `left.ts` matches (<=), with the
  * right side ordered before the left at equal timestamps.
  */
object AsOfJoin {

  /** @param rightValueCols right columns to carry (renamed as given)
    * @return left rows + matched right value columns (null when no
    *         right row precedes the left row) */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightValueCols: Map[String, String]): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side"
    val leftCols = left.columns.toSeq
    val carried = rightValueCols.toSeq.sortBy(_._2)

    val l = left.select(
      (keys.map(col) :+ col(leftTs).as(ts) :+ lit(1).as(side)) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        carried.map { case (_, out) => lit(null).as(s"__r_$out") }: _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as(ts) :+ lit(0).as(side)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")) ++
        carried.map { case (in, out) => col(in).as(s"__r_$out") }: _*)

    // right rows sort before left at equal ts (side 0 < 1) => `<=` match.
    // Carried columns travel as ONE struct per right row: per-column
    // last(_, ignoreNulls) would pull each column from its most recent
    // NON-NULL row independently, resurrecting stale values (and mixing
    // rows) whenever the matched right row holds a null — the struct is
    // non-null exactly for right rows, so every carried field comes from
    // the same (latest) right row, nulls included.
    val rowStruct = "__asof_row"
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    l.unionByName(r)
      .withColumn(rowStruct, when(col(side) === 0,
        struct(carried.map { case (_, out) => col(s"__r_$out").as(out) }: _*)))
      .withColumn(rowStruct, last(col(rowStruct), ignoreNulls = true).over(w))
      .filter(col(side) === 1)
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        carried.map { case (_, out) => col(rowStruct).getField(out).as(out) }: _*)
  }

  /** Nearest as-of join (pandas merge_asof `direction='nearest'` with
    * a `tolerance`): for each left row, the right row minimizing
    * |Δts| among those within `tolerance`, equal distances resolving
    * BACKWARD (the ≤ match — an exact-timestamp right row is distance
    * 0 backward by the same side-ordering rule as [[asOf]]). Same
    * merge-based plan run in BOTH directions over ONE key shuffle and
    * one sort: a backward `last` window and a forward `first` window
    * carry the two candidate structs (each with its own ts), and the
    * pick is a pure in-row comparison — no range join, no per-key
    * cross product, any time-range density. */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightValueCols: Map[String, String],
                  tolerance: Long): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side"
    val leftCols = left.columns.toSeq
    val carried = rightValueCols.toSeq.sortBy(_._2)

    val l = left.select(
      (keys.map(col) :+ col(leftTs).as(ts) :+ lit(1).as(side)) ++
        leftCols.filterNot(keys.contains).map(c => col(c).as(s"__l_$c")) ++
        carried.map { case (_, out) => lit(null).as(s"__r_$out") } :+
        lit(null).cast("long").as("__r_ts"): _*)
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as(ts) :+ lit(0).as(side)) ++
        leftCols.filterNot(keys.contains).map(c => lit(null).as(s"__l_$c")) ++
        carried.map { case (in, out) => col(in).as(s"__r_$out") } :+
        col(rightTs).cast("long").as("__r_ts"): _*)

    val rowStruct = struct(
      (carried.map { case (_, out) => col(s"__r_$out").as(out) } :+
        col("__r_ts").as("__ts")): _*)
    val wB = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wF = Window.partitionBy(keys.map(col): _*).orderBy(col(ts), col(side))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val u = l.unionByName(r)
      .withColumn("__cand", when(col(side) === 0, rowStruct))
      .withColumn("__b", last(col("__cand"), ignoreNulls = true).over(wB))
      .withColumn("__f", first(col("__cand"), ignoreNulls = true).over(wF))
      .filter(col(side) === 1)
    val db = col(ts) - col("__b")("__ts")
    val df = col("__f")("__ts") - col(ts)
    val bOk = col("__b").isNotNull && db <= tolerance
    val fOk = col("__f").isNotNull && df <= tolerance
    u.withColumn("__c",
        when(bOk && (!fOk || db <= df), col("__b")).when(fOk, col("__f")))
      .select(keys.map(col) ++
        leftCols.filterNot(keys.contains).map(c => col(s"__l_$c").as(c)) ++
        carried.map { case (_, out) => col("__c")(out).as(out) }: _*)
  }
}
