package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Table profiling — the `ANALYZE`-class data-quality pass a pipeline
  * runs before trusting an input drop: per-column non-null count,
  * exact distinct count, and min/max, plus the table row count, in ONE
  * scan. The reference has no analogue (goka state is opaque bytes);
  * this is the relational capability a 100 TB ingest needs to catch a
  * half-written partition or a cardinality explosion before it
  * poisons downstream joins.
  */
object Profiling {

  /** One row per profiled column: `(col_name, n_nonnull, ndv, min_val,
    * max_val, n_rows)`, min/max canonicalized to strings so columns of
    * any type can share the output schema.
    *
    * Scale shape: ONE scan, ONE aggregation — the multiple exact
    * `count(DISTINCT)`s plan as Catalyst's Expand (one duplicate of
    * each PRUNED row per distinct aggregate) into a single shuffle,
    * the standard exact-ANALYZE cost of #cols × column-width. The
    * unpivot to rows is a `stack` over the single aggregated row.
    * When exact ndv is not required at scale, swap
    * `approx_count_distinct` (HLL, no Expand) — q30 documents the
    * mergeable-sketch path; exact is kept here so the whole profile is
    * oracle-checkable. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs: Seq[Column] = count(lit(1)).as("n_rows") +: cols.flatMap(c =>
      Seq(
        count(col(c)).as(s"nn_$c"),
        count_distinct(col(c)).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c")))
    val one = df.agg(aggs.head, aggs.tail: _*)
    one.select(
      expr(s"stack(${cols.length}, " +
        cols.map(c => s"'$c', nn_$c, ndv_$c, min_$c, max_$c")
          .mkString(", ") +
        ") as (col_name, n_nonnull, ndv, min_val, max_val)"),
      col("n_rows"))
  }
}
