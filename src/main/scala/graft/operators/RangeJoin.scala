package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-range join WITHOUT an equi-key: pair every left row with every
  * right row whose timestamp falls in `[lts - before, lts + after]`.
  *
  * Spark has no native interval join; with no equality predicate the
  * built-in planner's only options are BroadcastNestedLoopJoin (driver
  * OOM once the small side stops being small) or a cartesian product —
  * both O(|L|·|R|) at 100 TB. The granule trick manufactures the
  * missing equi-key: quantize time into granules of width
  * `g = before + after` (so a left window, whose width is exactly g,
  * overlaps AT MOST TWO granules), explode each left row into the one
  * or two granules its window covers, map each right row to the single
  * granule containing it, and equi-join on the granule with the precise
  * interval test as the residual filter. Every qualifying pair is found
  * exactly once — the right row lives in exactly one granule — so no
  * dedup pass is needed.
  *
  * Scale shape: ≤ 2× expansion of the left side, then ONE shuffle of
  * each side on the granule key into a standard shuffled equi-join —
  * sort-merge or shuffled-hash, AQE-skew-splittable when some time
  * granule is hot (a flash-crowd minute), executor-sized partitions
  * instead of a nested loop. All granule arithmetic is integer (`div`
  * on µs epoch longs — truncating, which equals floor for the positive
  * timestamps here) — no double rounding can move a row across a
  * granule boundary.
  *
  * Output: one row per qualifying pair, as two structs `l` and `r`
  * (the caller selects/aggregates fields from either side).
  */
object RangeJoin {

  def timeRange(left: DataFrame, right: DataFrame,
      leftTs: Column, rightTs: Column,
      beforeUs: Long, afterUs: Long): DataFrame = {
    require(beforeUs >= 0 && afterUs >= 0 && beforeUs + afterUs > 0,
      s"window must be non-degenerate: before=$beforeUs after=$afterUs")
    val g = beforeUs + afterUs
    val l = left
      .select(struct(left.columns.map(col): _*).as("l"),
        leftTs.cast("long").as("_lts"))
      .withColumn("_gran", explode(sequence(
        expr(s"(_lts - ${beforeUs}L) div ${g}L"),
        expr(s"(_lts + ${afterUs}L) div ${g}L"))))
    val r = right
      .select(struct(right.columns.map(col): _*).as("r"),
        rightTs.cast("long").as("_rts"))
      .withColumn("_gran", expr(s"_rts div ${g}L"))
    l.join(r, l("_gran") === r("_gran") &&
        col("_rts") >= col("_lts") - beforeUs &&
        col("_rts") <= col("_lts") + afterUs)
      .select(col("l"), col("r"))
  }
}
