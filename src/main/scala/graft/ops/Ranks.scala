package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global rank + running sum — the order-statistics
  * primitive a single-partition `Window.orderBy(...)` cannot provide
  * at scale (Spark funnels an unpartitioned window through ONE task;
  * at 100 TB that is the whole job).
  *
  * The classic two-exchange sort-rank instead:
  *   1. bucket rows by VALUE RANGE — boundaries come from
  *      `approxQuantile` (a distributed sketch; its accuracy affects
  *      only bucket balance, never correctness, because bucketing by
  *      value keeps the buckets order-aligned and all ties of one
  *      value inside one bucket);
  *   2. per-bucket `(count, Σweight)` — a tiny aggregate — turns into
  *      cumulative OFFSETS on the driver (≤ nBuckets rows);
  *   3. a window WITHIN each bucket (parallel across buckets) finishes
  *      `rank = offset + row_number` and
  *      `cum = offset + running Σweight`.
  *
  * The result is the exact global `row_number()`/prefix-sum over
  * `ORDER BY value, tie` with maximum parallelism min(nBuckets,
  * cores). The reference has no ordered analytics at all (its state
  * is a per-key KV table, `/root/reference/storage/storage.go`); this
  * is the Spark-side primitive that unlocks Gini/Pareto/quantile-rank
  * queries over it. */
object Ranks {

  /** Bucket id of `v` under sorted cut points = count of cuts ≤ v, as
    * a chained `when` comparison ladder. NOT `size(filter(array(...)))`:
    * the lambda HOF evaluates interpreted and allocates a boxed
    * 63-element array PER ROW — at 600k rows that allocation storm
    * measured intermittent 8-13 s GC convoys in warm 32-thread
    * sessions (bench runs), while this branch ladder is pure
    * whole-stage-codegen compare/select with zero allocation. */
  private def bucketExpr(cuts: Array[Double], v: Column): Column =
    if (cuts.isEmpty) lit(0)
    else {
      val vd = v.cast("double")
      cuts.zipWithIndex.foldLeft(lit(0)) { case (acc, (c, i)) =>
        when(vd >= lit(c), lit(i + 1)).otherwise(acc)
      }
    }

  /** Append `rankCol` (1-based global rank by (value, tie) ascending,
    * ties broken by `tie` — pass a unique column for determinism) and
    * `cumCol` (inclusive running Σ `weight` in that order) to `df`.
    * `value` and `weight` must be non-null; `value` must be numeric
    * (it is ranked via its monotone cast to double for bucketing, but
    * compared exactly within buckets). `weight` must be INTEGRAL — it
    * is cast to long up front so the in-bucket running sums and the
    * driver-folded bucket offsets use the same arithmetic (a
    * fractional weight would otherwise truncate only on the offset
    * side and the two would disagree). */
  def rankedCumsum(df: DataFrame, value: Column, tie: Column,
      weight: Column, rankCol: String = "rank", cumCol: String = "cum",
      nBuckets: Int = 64): DataFrame =
    rankedCumsumTotals(df, value, tie, weight, rankCol, cumCol,
      nBuckets)._1

  /** As [[rankedCumsum]], but also returns the global `(n, Σweight)` —
    * both already known from the two driver folds the primitive runs
    * anyway, so a caller that needs the total (a quantile spec, a
    * share denominator) pays ZERO extra passes. The whole primitive
    * costs exactly two actions before the final plan executes: one
    * fused `(count, Σweight, bucket-boundary sketch)` aggregate and
    * one ≤nBuckets-row offsets fold. */
  def rankedCumsumTotals(df: DataFrame, value: Column, tie: Column,
      weight: Column, rankCol: String = "rank", cumCol: String = "cum",
      nBuckets: Int = 64, pin: Boolean = false): (DataFrame, Long, Long) =
    rankedCumsumTotalsTies(df, value, Seq(tie), weight, rankCol, cumCol,
      nBuckets, pin)

  /** As [[rankedCumsumTotals]] with a MULTI-COLUMN tiebreak: global
    * order is (value, ties...) ascending — callers negate numeric tie
    * columns for descending legs. The bucketing still keys on `value`
    * alone (ties only order within equal values, which always share a
    * bucket), so the two-exchange shape is unchanged. */
  /** `pin = true` localCheckpoints the prepared input before the
    * folds: the primitive scans its input THREE times (the fused
    * count/Σweight/sketch fold, the per-bucket offsets fold, the
    * final plan), so a caller feeding a RAW corpus-scale frame should
    * pin to pay the scan once; callers feeding small aggregates keep
    * the default (a pin is an eager job and executor storage). */
  def rankedCumsumTotalsTies(df: DataFrame, value: Column,
      ties: Seq[Column], weight: Column, rankCol: String = "rank",
      cumCol: String = "cum", nBuckets: Int = 64, pin: Boolean = false)
      : (DataFrame, Long, Long) = {
    require(ties.nonEmpty, "at least one tie column required")
    val tieNames = ties.indices.map(i => s"__rk_t$i")
    val base0 = ties.zip(tieNames).foldLeft(df.withColumn("__rk_v", value)) {
      case (d, (t, n)) => d.withColumn(n, t)
    }.withColumn("__rk_w", weight.cast("long"))
    val base = if (pin) base0.localCheckpoint() else base0
    // Order-aligned range bucketing: long→double is monotone, so
    // comparing against fixed double cut points can never invert the
    // value order, and equal values always share a bucket. The sketch
    // (ApproximatePercentile) affects only bucket BALANCE, never
    // correctness — any cut set yields the same global order — and is
    // fused with the count/Σweight into ONE pass.
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets)
    val head = base.select(count(lit(1)), sum(col("__rk_w")),
        percentile_approx(col("__rk_v").cast("double"),
          array(probs.map(lit(_)): _*), lit(10000)))
      .head()
    val n = head.getLong(0)
    val totalW = if (head.isNullAt(1)) 0L else head.getLong(1)
    val cuts =
      if (head.isNullAt(2)) Array.empty[Double]
      else head.getSeq[Double](2).toArray.distinct.sorted
    val withB = base.withColumn("__rk_b", bucketExpr(cuts, col("__rk_v")))
    // Tiny per-bucket totals → cumulative offsets, broadcast back.
    val perBucket = withB.groupBy(col("__rk_b"))
      .agg(count(lit(1)).as("__rk_n"), sum(col("__rk_w")).as("__rk_s"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var (rOff, cOff) = (0L, 0L)
    val offsets = perBucket.map { case (b, bn, bs) =>
      val row = (b, rOff, cOff); rOff += bn; cOff += bs; row
    }
    val offDf = df.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("__rk_b", "__rk_roff", "__rk_coff")
    val w = Window.partitionBy(col("__rk_b"))
      .orderBy(col("__rk_v") +: tieNames.map(col): _*)
    val out = withB.join(broadcast(offDf), Seq("__rk_b"))
      .withColumn(rankCol, col("__rk_roff") + row_number().over(w))
      .withColumn(cumCol, col("__rk_coff") +
        sum(col("__rk_w")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .drop("__rk_v" +: "__rk_w" +: "__rk_b" +: "__rk_roff" +:
        "__rk_coff" +: tieNames: _*)
    (out, n, totalW)
  }

  /** Append `outCol` = running MIN of `of` over all STRICTLY-preceding
    * rows in global (value, tie) order — null for the global first
    * row(s' prefix). Same two-exchange bucketed construction as
    * [[rankedCumsum]]: per-bucket minima become broadcast prefix
    * offsets, a within-bucket window covers the local strict prefix,
    * and `least` (null-skipping) combines the two. The primitive
    * behind frontier/skyline sweeps that would otherwise need an
    * unpartitioned window. `of` must be a non-null long. */
  def prefixMin(df: DataFrame, value: Column, tie: Column, of: Column,
      outCol: String, nBuckets: Int = 64): DataFrame = {
    val base = df.withColumn("__rk_v", value)
      .withColumn("__rk_t", tie).withColumn("__rk_o", of.cast("long"))
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val cuts = base.select(col("__rk_v").cast("double").as("__rk_d"))
      .stat.approxQuantile("__rk_d", probs, 0.001)
      .distinct.sorted
    val withB = base.withColumn("__rk_b", bucketExpr(cuts, col("__rk_v")))
    val perBucket = withB.groupBy(col("__rk_b"))
      .agg(min(col("__rk_o")).as("__rk_m"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var run = Option.empty[Long]
    val offsets = perBucket.map { case (b, m) =>
      val row = (b, run.map(java.lang.Long.valueOf).orNull)
      run = Some(run.fold(m)(math.min(_, m)))
      row
    }
    val spark = df.sparkSession
    val offDf = spark.createDataFrame(
      spark.sparkContext.parallelize(offsets.toSeq.map {
        case (b, m) => org.apache.spark.sql.Row(b, m)
      }),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__rk_b",
          org.apache.spark.sql.types.IntegerType, nullable = false),
        org.apache.spark.sql.types.StructField("__rk_poff",
          org.apache.spark.sql.types.LongType, nullable = true))))
    val w = Window.partitionBy(col("__rk_b"))
      .orderBy(col("__rk_v"), col("__rk_t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    withB.join(broadcast(offDf), Seq("__rk_b"))
      .withColumn(outCol,
        least(min(col("__rk_o")).over(w), col("__rk_poff")))
      .drop("__rk_v", "__rk_t", "__rk_o", "__rk_b", "__rk_poff")
  }
}
