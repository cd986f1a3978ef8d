package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.Hashes

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
    * Scale shape: one independent TWO-PHASE aggregation per column —
    * `groupBy(value).count` (map-side partial dedup, the shuffle
    * carries only each partition's distinct values) rolled up into the
    * four stats. Columnar input makes the per-column branches read the
    * SAME total bytes as a single all-columns pass, while the
    * single-pass alternative (multi-`count_distinct` → Catalyst
    * Expand) multiplies every row ×(#cols+1) through the aggregation —
    * measured 12.7 s vs 1.3 s on this very query at sf0.1. Branches
    * are independent jobs, so a scheduler overlaps them. When exact
    * ndv is not required at scale, swap `approx_count_distinct` (HLL,
    * single pass, no dedup shuffle) — q30 documents the
    * mergeable-sketch path; exact is kept here so the whole profile is
    * oracle-checkable. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.map { c =>
      df.groupBy(col(c).as("v")).agg(count(lit(1)).as("cnt"))
        .agg(
          coalesce(sum(when(col("v").isNotNull, col("cnt"))
            .otherwise(lit(0L))), lit(0L)).as("n_nonnull"),
          count(col("v")).as("ndv"), // non-null groups = exact distinct
          min(col("v")).cast("string").as("min_val"),
          max(col("v")).cast("string").as("max_val"),
          coalesce(sum(col("cnt")), lit(0L)).as("n_rows"))
        .select(lit(c).as("col_name"), col("n_nonnull"), col("ndv"),
          col("min_val"), col("max_val"), col("n_rows"))
    }.reduce(_ unionByName _)

  /** PARTIAL (mergeable) profile of one slice — the streaming-DQ twin
    * of [[profile]]: per column, the algebraic stats (row/non-null
    * counts, typed min/max slots) plus a k-minimum-values ndv sketch
    * (sorted k smallest md5 hashes of the column's distinct values).
    * Every field is MERGEABLE: counts add, min/max combine, and the
    * global k-minima are a subset of the union of per-slice k-minima —
    * so a profile maintained as "append one partial per micro-batch,
    * merge on read" ([[kmvProfileMerge]]) is exactly the profile of
    * the whole stream. This is q33's partial-aggregate-merge lifecycle
    * applied to data-quality monitoring, with the KMV sketch standing
    * in for exact ndv precisely because exact distinct does NOT merge
    * (q34's two-phase dedup needs all values co-shuffled) and a
    * sketch does.
    *
    * min/max live in per-type slots (long / string) because the
    * canonical-string form [[profile]] outputs does not ORDER like the
    * native type ("10" < "9" lexically); canonicalization happens once
    * at merge time, after the typed combine.
    *
    * Scale shape: one scan of the slice; the sketch is
    * `slice(array_sort(collect_set(h32)))` per column — per-slice
    * distinct sets here (fixture-sized); a huge-cardinality deployment
    * swaps in [[TextAnalysis.kmvDistinct]]'s two-level salted
    * k-minima, same artifact schema. The artifact itself is
    * #columns × (k+6) values regardless of slice size. */
  def kmvProfilePartial(df: DataFrame, longCols: Seq[String],
      strCols: Seq[String], k: Int = 512): DataFrame = {
    def one(c: String, isLong: Boolean) = {
      val v = col(c)
      df.agg(
        count(lit(1)).as("n_rows"),
        count(v).as("n_nonnull"),
        (if (isLong) min(v) else lit(null).cast("long")).as("min_l"),
        (if (isLong) max(v) else lit(null).cast("long")).as("max_l"),
        (if (isLong) lit(null).cast("string") else min(v)).as("min_s"),
        (if (isLong) lit(null).cast("string") else max(v)).as("max_s"),
        slice(array_sort(collect_set(
          when(v.isNotNull, Hashes.h32(v.cast("string"))))), 1, k)
          .as("mins"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nonnull"),
          col("min_l"), col("max_l"), col("min_s"), col("max_s"),
          col("mins"))
    }
    (longCols.map(one(_, isLong = true)) ++
      strCols.map(one(_, isLong = false))).reduce(_ unionByName _)
  }

  /** Merge any number of [[kmvProfilePartial]] rows into the final
    * profile: counts add, typed min/max combine then canonicalize to
    * strings ([[profile]]'s convention), per-column k-minima union →
    * re-take-k, and the t14 KMV estimator gives `est_ndv` (exact in
    * the hash-distinct sense while a column is below sketch
    * capacity). The merge is #columns×#partials-sized — free — and
    * associative, so partials can themselves be pre-merged in any
    * grouping (micro-batch → hourly → daily rollups). */
  def kmvProfileMerge(partials: DataFrame, k: Int = 512): DataFrame =
    partials.groupBy(col("col_name"))
      .agg(sum(col("n_rows")).as("n_rows"),
        sum(col("n_nonnull")).as("n_nonnull"),
        min(col("min_l")).as("min_l"), max(col("max_l")).as("max_l"),
        min(col("min_s")).as("min_s"), max(col("max_s")).as("max_s"),
        slice(array_sort(array_distinct(flatten(collect_list(col("mins"))))),
          1, k).as("mins"))
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        coalesce(col("min_l").cast("string"), col("min_s")).as("min_val"),
        coalesce(col("max_l").cast("string"), col("max_s")).as("max_val"),
        size(col("mins")).cast("long").as("n_mins"),
        when(size(col("mins")) >= k,
          lit((k - 1L) * 4294967296L).cast("double")
            / element_at(col("mins"), k).cast("double"))
          .otherwise(size(col("mins")).cast("double")).as("est_ndv"))

  /** Per-partition Misra-Gries heavy-hitters summary (Misra & Gries
    * 1982; the "space-saving"/frequent-items sketch family) — the
    * bounded-memory ONE-PASS answer to "top users by volume" that
    * never shuffles raw values: each task folds its partition into a
    * ≤ `m`-entry (key, count) map (new key on a full map decrements
    * every counter and evicts zeros — the MG step), and only those
    * ≤ m·#partitions summary rows ever reach the wire, vs a
    * `groupBy(key)` whose exchange carries every distinct key. The
    * `exact` flag reports whether the MG decrement ever fired in that
    * partition: while a partition's distinct-key count stays ≤ m the
    * summary IS its exact count map (the regime the oracle checks);
    * past capacity the counts become lower bounds with total error
    * ≤ n/m — the documented 100 TB trade, tuned by m.
    *
    * [[heavyHittersTopK]] merges partials (counts add; in the exact
    * regime the merge is exact) and ranks the global top k. */
  def heavyHittersPartial(df: DataFrame, key: Column, m: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("k")).as[String]
      .mapPartitions { it =>
        val cnt = scala.collection.mutable.HashMap.empty[String, Long]
        var exact = true
        it.foreach { x =>
          cnt.get(x) match {
            case Some(c) => cnt(x) = c + 1
            case None if cnt.size < m => cnt(x) = 1L
            case None =>
              exact = false
              val dead = scala.collection.mutable.Buffer.empty[String]
              cnt.mapValuesInPlace((_, c) => c - 1)
              cnt.foreach { case (k, c) => if (c == 0L) dead += k }
              dead.foreach(cnt.remove)
          }
        }
        cnt.iterator.map { case (k, c) => (k, c, exact) }
      }
      .toDF("k", "cnt", "exact")
  }

  /** Global top-k heavy hitters from [[heavyHittersPartial]] rows:
    * counts add per key, ranked by (count desc, key). `exact` is the
    * GLOBAL AND of every partial's flag — a decrement in ANY partition
    * can have evicted counts of any key, so exactness is a whole-run
    * property, not per-key. The merged summary (≤ m·#partitions keys)
    * is localCheckpoint-pinned, then ranked by the bucketed
    * [[Ranks]] pass — no unpartitioned window anywhere, so the plan
    * passes the strict scale guard even when m·#partitions is large. */
  def heavyHittersTopK(partials: DataFrame, k: Int): DataFrame = {
    val merged = partials.groupBy(col("k"))
      .agg(sum(col("cnt")).as("cnt"))
      .crossJoin(broadcast(
        partials.agg(coalesce(min(col("exact")), lit(true)).as("exact"))))
      .localCheckpoint()
    Ranks.rankedCumsum(merged, -col("cnt"), col("k"), lit(1L),
        rankCol = "__hh_rank", cumCol = "__hh_cum")
      .filter(col("__hh_rank") <= k)
      .select(col("k"), col("cnt"), col("exact"),
        col("__hh_rank").cast("int").as("rank"))
  }

  /** Profile DRIFT between two snapshots of the same table — the
    * data-quality regression gate (the Deequ / Great-Expectations
    * check class, public) every recurring 100 TB ingest runs before
    * promoting a new drop: [[profile]] computed on both versions,
    * joined per column, with the drift signals a gate thresholds on —
    * row-count and ndv ratios (a cardinality explosion or collapse),
    * and min/max identity flags (a domain shift: new enum value, a
    * timestamp from 1970, an id range restart). Ratios are emitted
    * rather than pass/fail verdicts so the GATE's thresholds stay
    * policy, not engine, semantics — c01's keep-rules pattern.
    *
    * Scale shape: two independent [[profile]] passes (each one scan of
    * its snapshot, per-column two-phase aggs) joined on the
    * #columns-sized profile rows — the compare itself is free; nothing
    * about the snapshots is ever co-shuffled. */
  def profileDrift(old: DataFrame, nw: DataFrame,
      cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      profile(df, cols).select(col("col_name"),
        col("n_nonnull").as(s"n_nonnull_$sfx"), col("ndv").as(s"ndv_$sfx"),
        col("min_val").as(s"min_$sfx"), col("max_val").as(s"max_$sfx"),
        col("n_rows").as(s"n_rows_$sfx"))
    side(old, "old").join(side(nw, "new"), Seq("col_name"))
      .select(col("col_name"),
        col("n_rows_old"), col("n_rows_new"),
        col("n_nonnull_old"), col("n_nonnull_new"),
        col("ndv_old"), col("ndv_new"),
        (col("ndv_new").cast("double") / col("ndv_old").cast("double"))
          .as("ndv_ratio"),
        (col("n_rows_new").cast("double") / col("n_rows_old").cast("double"))
          .as("rowcount_ratio"),
        (col("min_old") =!= col("min_new")).as("min_changed"),
        (col("max_old") =!= col("max_new")).as("max_changed"))
  }

  /** KMV/theta-sketch SET ALGEBRA — per-segment-pair distinct-element
    * intersection / union / difference estimates computed from the two
    * segments' k-minimum-values sketches alone (Dasgupta et al. 2016,
    * "Theta-Sketch Framework", public; t14 is the single-set
    * cardinality special case). This is the capability HLL
    * fundamentally lacks: HLL unions losslessly but cannot intersect;
    * a theta/KMV sketch supports the full algebra because it carries a
    * uniform SAMPLE of the hash space below a threshold. Per pair:
    * θ = min(θ_a, θ_b) (a segment's θ is its k-th smallest hash, or
    * 2^32 while unsaturated), every estimate is
    * `|sample ∩ [0,θ)| · 2^32 / θ`, and the exact per-segment and
    * intersection counts ride along as the fixture-scale error audit
    * (the t14 pattern). All hashing is the portable md5-derived
    * [[Hashes.h32]], so every register and estimate is bit-identical
    * in the DuckDB oracle.
    *
    * Scale shape: the sketches are the ONLY thing the pairwise stage
    * touches — ≤ k rows per segment (the two-level k-minima selection
    * of [[TextAnalysis.kmvDistinct]] applies verbatim when a segment's
    * distinct set is huge), so the pair joins are (#segments² · k)-
    * sized regardless of corpus size. The exact ride-alongs are the
    * one corpus-sized stage; a 100 TB deployment drops them and keeps
    * the sketch algebra, which is the entire point — set overlap
    * across segment pairs without ever co-shuffling the segments'
    * raw element sets. */
  def kmvSetOps(df: DataFrame, segment: Column, element: Column,
      k: Int = 64): DataFrame = {
    val el = df.select(segment.as("s"), element.cast("string").as("e"))
      .distinct()
    val hs = el.select(col("s"), Hashes.h32(col("e")).as("hw")).distinct()
    val nh = hs.groupBy(col("s")).agg(count(lit(1)).as("n_hashes"))
    val wS = Window.partitionBy(col("s")).orderBy(col("hw"))
    val mins = hs.withColumn("rn", row_number().over(wS))
      .filter(col("rn") <= k).select(col("s"), col("hw"))
      .localCheckpoint() // the sketch artifact: <= k rows per segment
    val meta = mins.groupBy(col("s")).agg(max(col("hw")).as("kth"))
      .join(nh, Seq("s"))
      .select(col("s"),
        when(col("n_hashes") >= k, col("kth"))
          .otherwise(lit(4294967296L)).as("theta"))
    val exact = el.groupBy(col("s")).agg(count(lit(1)).as("n_exact"))
    val interExact = el.as("a")
      .join(el.as("b"),
        col("a.e") === col("b.e") && col("a.s") < col("b.s"))
      .groupBy(col("a.s").as("sa"), col("b.s").as("sb"))
      .agg(count(lit(1)).as("inter_exact"))
    // per-segment 1-row metadata: segments number in the thousands at
    // any corpus size, so the pair frame builds off a broadcast
    val pairs = meta.as("ma")
      .join(broadcast(meta).as("mb"), col("ma.s") < col("mb.s"))
      .select(col("ma.s").as("sa"), col("mb.s").as("sb"),
        least(col("ma.theta"), col("mb.theta")).as("theta"))
    def sideSample(side: String, out: String) = pairs
      .join(mins, col("s") === col(side) && col("hw") < col("theta"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as(out))
    val aS = sideSample("sa", "a_sample")
    val bS = sideSample("sb", "b_sample")
    val iS = pairs
      .join(mins.as("x"),
        col("x.s") === col("sa") && col("x.hw") < col("theta"))
      .join(mins.as("y"),
        col("y.s") === col("sb") && col("y.hw") === col("x.hw"))
      .groupBy(col("sa"), col("sb"))
      .agg(count(lit(1)).as("inter_sample"))
    def est(sample: Column) =
      sample.cast("double") * lit(4294967296.0) / col("theta").cast("double")
    pairs
      .join(exact.select(col("s").as("sa"), col("n_exact").as("n_a_exact")),
        Seq("sa"))
      .join(exact.select(col("s").as("sb"), col("n_exact").as("n_b_exact")),
        Seq("sb"))
      .join(interExact, Seq("sa", "sb"), "left")
      .join(aS, Seq("sa", "sb"))
      .join(bS, Seq("sa", "sb"))
      .join(iS, Seq("sa", "sb"), "left")
      .select(col("sa").as("type_a"), col("sb").as("type_b"),
        col("n_a_exact"), col("n_b_exact"),
        coalesce(col("inter_exact"), lit(0L)).as("inter_exact"),
        col("theta"), col("a_sample"), col("b_sample"),
        coalesce(col("inter_sample"), lit(0L)).as("inter_sample"),
        est(col("a_sample")).as("est_a"),
        est(col("b_sample")).as("est_b"),
        est(coalesce(col("inter_sample"), lit(0L))).as("est_inter"),
        est(col("a_sample") + col("b_sample")
          - coalesce(col("inter_sample"), lit(0L))).as("est_union"),
        est(col("a_sample")
          - coalesce(col("inter_sample"), lit(0L))).as("est_diff_ab"))
  }

  /** k-anonymity risk report (Sweeney 2002, public) — the privacy
    * audit run before a corpus release: rows are grouped into
    * EQUIVALENCE CLASSES by their quasi-identifier tuple, and a class
    * smaller than k re-identifies its members. Reported per release
    * unit (here: per language): row count, class count, the smallest
    * class, and how many classes/rows sit below the k threshold — the
    * "suppress or generalize these" worklist.
    *
    * Scale shape: two chained aggregations (QI-class counts with
    * map-side partials, then the per-unit rollup over class-count
    * rows). Nothing besides group counts ever shuffles. */
  def kAnonymityReport(df: DataFrame, unit: Column, quasiIds: Seq[Column],
      k: Int): DataFrame = {
    val classes = df
      .groupBy((unit.as("unit") +: quasiIds.zipWithIndex.map {
        case (c, i) => c.as(s"qi$i")
      }): _*)
      .agg(count(lit(1)).as("sz"))
    classes.groupBy(col("unit"))
      .agg(sum(col("sz")).as("n_rows"),
        count(lit(1)).as("n_classes"),
        min(col("sz")).as("min_k"),
        count(when(col("sz") < k, 1)).as("risky_classes"),
        coalesce(sum(when(col("sz") < k, col("sz"))), lit(0L))
          .as("risky_rows"))
  }

  /** Largest-remainder (Hamilton) apportionment — exact integer
    * allocation of a token budget across domains proportional to their
    * supply: quota_i = B·w_i div W, then the leftover B − Σquota units
    * go one each to the largest remainders (B·w_i mod W; ties by
    * domain asc). Σalloc == B EXACTLY — the property float-rate
    * mixture scaling (t19's temperature sampling) cannot give — and
    * every step is integer, so any engine lands on the same
    * allocation.
    *
    * Scale shape: the supply aggregation is the only corpus-scale
    * stage; apportionment itself runs over #domains rows
    * (localCheckpoint-pinned so the corpus is scanned once), with the
    * remainder rank via the bucketed [[Ranks]] pass — no unpartitioned
    * window even when the domain count is itself large. */
  def largestRemainderAlloc(df: DataFrame, domain: Column,
      weight: Column, budget: Long): DataFrame = {
    val supply = df.groupBy(domain.as("domain"))
      .agg(sum(weight.cast("long")).as("w"))
    // two-pass: quotas need the total first, the leftover needs Σquota
    val wTot = supply.select(sum(col("w")).as("tw"))
    val quotas = supply.crossJoin(broadcast(wTot))
      .withColumn("quota", expr(s"$budget * w div tw"))
      .withColumn("rem", expr(s"($budget * w) % tw"))
      .localCheckpoint()
    val leftover = quotas.select(
      (lit(budget) - sum(col("quota"))).as("d"))
    Ranks.rankedCumsum(quotas, -col("rem"), col("domain"), lit(1L),
        rankCol = "rr", cumCol = "__lr_cum")
      .crossJoin(broadcast(leftover))
      .select(col("domain"), col("w").as("supply"),
        (col("quota") + when(col("rr") <= col("d"), 1L).otherwise(0L))
          .as("alloc"))
  }

  /** c22: data-quality EXPECTATIONS gate (the Deequ/Great-Expectations
    * contract check c06's drift report complements): named rules, each
    * a violation predicate, evaluated in ONE aggregate pass over the
    * table — every rule is a conditional sum riding the same scan, the
    * optional uniqueness rule is the one `count − count_distinct` the
    * q34 two-phase lesson allows (a single distinct never plans the
    * Expand that multiple would). The single agg row unpivots map-side
    * into the (rule, violations, pass) report; a CI gate keys off
    * `pass`. At 100 TB the cost is exactly one table scan regardless
    * of rule count. */
  def expectationsGate(df: DataFrame, rules: Seq[(String, Column)],
      uniqueKey: Option[(String, Column)] = None): DataFrame = {
    val aggs = rules.map { case (n, pred) =>
      sum(when(pred, 1L).otherwise(0L)).as(s"v_$n")
    } ++ uniqueKey.map { case (n, c) =>
      (count(lit(1)) - count_distinct(c)).as(s"v_$n")
    }
    val names = rules.map(_._1) ++ uniqueKey.map(_._1)
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(names.map(n => struct(lit(n).as("rule"),
        col(s"v_$n").as("violations"))): _*)).as("r"))
      .select(col("r.rule").as("rule"),
        col("r.violations").as("violations"),
        (col("r.violations") === 0L).as("pass"))
  }
}
