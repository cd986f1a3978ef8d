package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Engine-portable transcendentals. `Math.log` and DuckDB `ln` disagree
  * in the last ulp on ~0.07% of inputs (measured on this host: 35 of
  * 50 000 BM25-idf-shaped arguments), so a score that passes through a
  * library `ln` can never be hash-checked against a SQL oracle. This
  * `ln` is instead a PINNED expression tree of plain IEEE `+ - * /`
  * and comparisons — operations every engine rounds identically — so
  * its result is bit-identical wherever the same tree is evaluated:
  *
  *   1. range-reduce by the exact binary exponent: a CASE ladder over
  *      exact power-of-two literals finds k with 2^k <= x < 2^(k+1);
  *      m = x / 2^k is EXACT (scaling by a power of two perturbs no
  *      mantissa bit), so m lands in [1, 2) with zero rounding error;
  *   2. atanh series on z = (m-1)/(m+1), |z| <= 1/3:
  *      ln(m) = 2(z + z^3/3 + ... + z^19/19), truncation error
  *      bounded by 2*(1/3)^21/21 < 1e-11;
  *   3. ln(x) = k*LN2 + 2p, LN2 the correctly-rounded double literal —
  *      both engines parse the same decimal to the same bits.
  *
  * Accuracy vs `Math.log` is ~1e-11 absolute (PortableMathSpec sweeps
  * and pins the measured max error); determinism is exact by
  * construction. The Column pipeline and the SQL fragments are
  * generated from the same ladder/coefficient constants so the two
  * trees cannot drift.
  *
  * Cost note: the ladder is a 61-way CASE, so callers should evaluate
  * it on ALREADY-AGGREGATED tiny frames (e.g. one row per query term
  * for an idf), never per corpus row — [[graft.ops.Retrieval.bm25]]
  * computes it on the per-term df table, cardinality = |query
  * vocabulary|. Supported domain: x in [2^-20, 2^40] — corpus-count
  * ratios sit well inside it even at 10^12 documents. */
object PortableMath {

  private val kMin = -20
  private val kMax = 40

  /** ln 2, correctly rounded; Double.toString round-trips exactly and
    * DuckDB parses the same decimal to the same bits. */
  private val Ln2 = 0.6931471805599453

  /** Odd denominators of the atanh series, 1/3 .. 1/19, kept as
    * divisions so both engines perform the identical rounded divide. */
  private val coefDenoms = Seq(3, 5, 7, 9, 11, 13, 15, 17, 19)

  /** floor(log2(x)) as a double Column — the exact binary exponent via
    * the descending power-of-two ladder. */
  def kLadder(x: Column): Column = coalesce(
    (kMax to kMin by -1).map { e =>
      when(x >= lit(math.pow(2.0, e)), lit(e.toDouble))
    } :+ lit(kMin.toDouble - 1.0): _*)

  /** x scaled into [1, 2) by its exact binary exponent — one ladder,
    * each branch dividing by an exact power of two. */
  def mLadder(x: Column): Column = coalesce(
    (kMax to kMin by -1).map { e =>
      when(x >= lit(math.pow(2.0, e)), x / lit(math.pow(2.0, e)))
    } :+ x / lit(math.pow(2.0, kMin - 1)): _*)

  /** Append column `out` = portable ln of `x` to `df` through a chain
    * of named single-use projections (no tree duplication, each
    * intermediate computed once per row). */
  def withLn(df: DataFrame, x: Column, out: String): DataFrame = {
    val horner = coefDenoms.reverse.foldLeft(lit(0.0): Column) {
      (acc, d) => lit(1.0) / lit(d.toDouble) + col("__ln_z2") * acc
    }
    df.withColumn("__ln_k", kLadder(x))
      .withColumn("__ln_m", mLadder(x))
      .withColumn("__ln_z",
        (col("__ln_m") - lit(1.0)) / (col("__ln_m") + lit(1.0)))
      .withColumn("__ln_z2", col("__ln_z") * col("__ln_z"))
      .withColumn(out, col("__ln_k") * lit(Ln2) +
        lit(2.0) * (col("__ln_z") * (lit(1.0) + col("__ln_z2") * horner)))
      .drop("__ln_k", "__ln_m", "__ln_z", "__ln_z2")
  }

  // ---- SQL renderings of the identical tree ---------------------------

  /** SQL for [[kLadder]] over SQL expression `x`. */
  def kLadderSql(x: String): String =
    (kMax to kMin by -1).map { e =>
      s"WHEN ($x) >= ${lit2(e)} THEN ${e.toDouble}"
    }.mkString("CASE ", " ", s" ELSE ${kMin.toDouble - 1.0} END")

  /** SQL for [[mLadder]] over SQL expression `x`. */
  def mLadderSql(x: String): String =
    (kMax to kMin by -1).map { e =>
      s"WHEN ($x) >= ${lit2(e)} THEN ($x) / ${lit2(e)}"
    }.mkString("CASE ", " ",
      s" ELSE ($x) / ${lit2(kMin - 1)} END")

  /** SQL for the final recombination over named columns `k`, `z`,
    * `z2` (as produced by the ladder/z stages — mirror of withLn's
    * last projection). */
  def recombineSql(k: String, z: String, z2: String): String = {
    val horner = coefDenoms.reverse.foldLeft("0.0") { (acc, d) =>
      s"(1.0 / ${d.toDouble} + ($z2) * $acc)"
    }
    s"($k) * $Ln2 + 2.0 * (($z) * (1.0 + ($z2) * $horner))"
  }

  /** Exact power-of-two double literal; Double.toString round-trips so
    * both engines parse identical bits. */
  private def lit2(e: Int): String = math.pow(2.0, e).toString

  // ---- fixed-point log2: the FMA-proof alternative ---------------------
  //
  // withLn's parity contract assumes both engines round every `a*b + c`
  // as two operations. Measured on this host, DuckDB 1.0.0 evaluates
  // the recombination's mul-add shape differently by one ulp depending
  // on the surrounding query shape (observed on ln(582.0) inside the
  // t34 model chain vs the identical expression over a parquet-fed
  // row) — i.e. somewhere in its stack the multiply-add is CONTRACTED.
  // A score that must hash-match cross-engine therefore cannot ride
  // any mul+add of data-dependent doubles. This primitive computes
  // floor(log2(x) · 2^fracBits) as an exact INTEGER using only
  // operations no compiler may legally contract or reorder:
  //   - the kLadder/mLadder range reduction (comparisons + divisions
  //     by exact powers of two),
  //   - then `fracBits` rounds of the classic bit-by-bit log:
  //     m ← m²; if m ≥ 2 emit bit 1 and halve, else emit bit 0.
  // Each round is one correctly-rounded multiply feeding a COMPARISON
  // and a division by 2 (exponent-only, exact) — there is no add for
  // an FMA to fuse into. The integer result sums/compares exactly, so
  // downstream aggregation needs no ordered-fold discipline at all.
  // The squaring round-off keeps the result within ~1 ulp of the true
  // fixed-point log2 — and bit-identical across engines regardless,
  // which is the property that matters.

  /** Append `out` = floor(log2(x)·2^fracBits) (LongType) to `df` via
    * named single-use projections. Domain: kLadder's [2^-20, 2^40]. */
  def withLog2Fixed(df: DataFrame, x: Column, out: String,
      fracBits: Int = 16): DataFrame = {
    require(fracBits >= 1 && fracBits <= 40, s"fracBits $fracBits")
    var d = df.withColumn("__l2_k", kLadder(x))
      .withColumn("__l2_m", mLadder(x))
      .withColumn("__l2_f", lit(0L))
    for (_ <- 1 to fracBits) {
      d = d.withColumn("__l2_m2", col("__l2_m") * col("__l2_m"))
        .withColumn("__l2_f", col("__l2_f") * lit(2L) +
          when(col("__l2_m2") >= lit(2.0), lit(1L)).otherwise(lit(0L)))
        .withColumn("__l2_m",
          when(col("__l2_m2") >= lit(2.0), col("__l2_m2") / lit(2.0))
            .otherwise(col("__l2_m2")))
        .drop("__l2_m2")
    }
    d.withColumn(out,
        col("__l2_k").cast("long") * lit(1L << fracBits) + col("__l2_f"))
      .drop("__l2_k", "__l2_m", "__l2_f")
  }

  /** Driver-side constant evaluation of [[withLog2Fixed]] — the
    * IDENTICAL op sequence (exponent ladder = repeated exact
    * halvings/doublings, then the squaring rounds) in plain Scala
    * doubles, so the result is bit-equal to what the Column chain
    * would produce for the same input. Use this for LITERAL inputs:
    * feeding a foldable expression into the 16-round column ladder
    * lets projection collapse inline every round into the next
    * (3^rounds tree growth) and hangs the optimizer — a constant
    * belongs in a `lit`, not a ladder. */
  def log2FixedLong(x: Double, fracBits: Int = 16): Long = {
    require(x > 0.0 && fracBits >= 1 && fracBits <= 40, s"log2Fixed($x)")
    var k = 0L
    var m = x
    while (m >= 2.0) { m /= 2.0; k += 1 }
    while (m < 1.0) { m *= 2.0; k -= 1 }
    var f = 0L
    for (_ <- 1 to fracBits) {
      m = m * m
      if (m >= 2.0) { f = f * 2 + 1; m /= 2.0 } else f = f * 2
    }
    k * (1L << fracBits) + f
  }

  /** Exact DECIMAL(38,0)→BIGINT cast that FAILS LOUDLY on overflow —
    * Spark's non-ANSI cast silently nulls a decimal that exceeds the
    * long range, while the DuckDB oracle errors; a silent null is a
    * corrupted result that still "passes" any rows>0 smoke check.
    * This guard matches the oracle's behavior: in range → the exact
    * long, out of range → a raised error naming the column. */
  def exactLong(c: Column, what: String): Column =
    when(c >= lit(Long.MinValue) && c <= lit(Long.MaxValue),
        c.cast("long"))
      .otherwise(raise_error(concat(
        lit(s"$what overflows BIGINT: "), c.cast("string"))).cast("long"))

  /** SQL rendering of [[withLog2Fixed]] as chained CTE stages — the
    * identical op sequence, one named stage per squaring round.
    * Returns the CTE-body fragment `<p>0 AS (...), ..., <p>N AS (...)`;
    * the final stage exposes every input column plus `outCol`.
    * `src` is the relation to read; `xCol` the input expression. */
  def log2FixedSqlStages(src: String, xCol: String, outCol: String,
      prefix: String, fracBits: Int = 16): String = {
    require(fracBits >= 1 && fracBits <= 40, s"fracBits $fracBits")
    val s0 =
      s"""${prefix}0 AS (SELECT *, ${kLadderSql(xCol)} AS l2k,
         ${mLadderSql(xCol)} AS l2m, CAST(0 AS BIGINT) AS l2f FROM $src)"""
    val rounds = (1 to fracBits).map { i =>
      s"""$prefix$i AS (SELECT * EXCLUDE (l2m, l2f),
           CASE WHEN l2m * l2m >= 2.0 THEN l2m * l2m / 2.0
                ELSE l2m * l2m END AS l2m,
           l2f * 2 + CASE WHEN l2m * l2m >= 2.0 THEN 1 ELSE 0 END AS l2f
         FROM $prefix${i - 1})"""
    }
    val fin =
      s"""${prefix}out AS (SELECT * EXCLUDE (l2k, l2m, l2f),
           CAST(l2k AS BIGINT) * ${1L << fracBits} + l2f AS $outCol
         FROM $prefix$fracBits)"""
    (s0 +: rounds :+ fin).mkString(",\n")
  }
}
