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
}
