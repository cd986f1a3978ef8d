package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized parity for the bucketed distributed rank: the production
  * two-exchange rank/cumsum must equal the single-partition
  * `row_number()`/prefix-sum it replaces — on skewed, tie-heavy data,
  * where bucket boundaries land ON tied values. */
class RanksSpec extends AnyFunSuite with SparkFixture {

  test("rankedCumsum == single-partition window on tie-heavy random data") {
    import spark.implicits._
    for (seed <- Seq(7, 41, 1234)) {
      val rnd = new scala.util.Random(seed)
      // Few distinct values → every bucket boundary collides with ties.
      val rows = (0L until 500L).map { i =>
        (i, rnd.nextInt(12).toLong, rnd.nextInt(1000).toLong + 1L)
      }
      val df = rows.toDF("id", "v", "w")
      val got = Ranks.rankedCumsum(df, col("v"), col("id"), col("w"),
          nBuckets = 8)
        .select(col("id"), col("rank"), col("cum"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      var cum = 0L
      val want = rows.sortBy(r => (r._2, r._1)).zipWithIndex.map {
        case ((id, _, w), i) => cum += w; id -> ((i + 1L, cum))
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("rankedCumsum handles all-equal values (one bucket, pure ties)") {
    import spark.implicits._
    val df = (0L until 50L).map(i => (i, 5L, 2L)).toDF("id", "v", "w")
    val got = Ranks.rankedCumsum(df, col("v"), col("id"), col("w"))
      .select(col("id"), col("rank"), col("cum"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(got.zipWithIndex.forall { case ((id, r, c), i) =>
      id == i && r == i + 1 && c == 2L * (i + 1) })
  }

  test("prefixMin == brute strict-prefix minimum on tie-heavy random data") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    for (seed <- Seq(9, 53)) {
      val rnd = new scala.util.Random(seed)
      // unique (v) keys with random payloads; boundaries land on values
      val rows = rnd.shuffle((0L until 300L).toVector)
        .map(v => (v, rnd.nextInt(500).toLong))
      val got = Ranks.prefixMin(rows.toDF("v", "o"), col("v"), col("v"),
          col("o"), "pm", nBuckets = 8)
        .select(col("v"), col("pm")).collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val sorted = rows.sortBy(_._1)
      var run = Option.empty[Long]
      val want = sorted.map { case (v, o) =>
        val r = v -> run
        run = Some(run.fold(o)(math.min(_, o)))
        r
      }.toMap
      assert(got == want, s"seed=$seed")
    }
  }

  test("rankedCumsumTotals returns the exact global (n, sum-weight) " +
    "alongside the identical ranked frame — zero extra passes") {
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val rows = (0L until 250L).map(i =>
      (i, rnd.nextInt(30).toLong, rnd.nextInt(9).toLong + 1L))
    val df = rows.toDF("id", "v", "w")
    val (ranked, n, tw) = Ranks.rankedCumsumTotals(df, col("v"),
      col("id"), col("w"), nBuckets = 8)
    assert(n == 250L)
    assert(tw == rows.map(_._3).sum)
    val viaPlain = Ranks.rankedCumsum(df, col("v"), col("id"), col("w"),
        nBuckets = 8)
      .select(col("id"), col("rank"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaTotals = ranked
      .select(col("id"), col("rank"), col("cum")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaTotals == viaPlain)
  }

  test("rankedCumsum casts the weight to long up front — a fractional " +
    "weight truncates IDENTICALLY in the in-bucket sums and the " +
    "driver-folded offsets") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0L until 300L).map(i =>
      (i, rnd.nextInt(50).toLong, rnd.nextInt(5) + 0.9d))
    val df = rows.toDF("id", "v", "w")
    val got = Ranks.rankedCumsum(df, col("v"), col("id"), col("w"),
        nBuckets = 8)
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var cum = 0L
    val want = rows.sortBy(r => (r._2, r._1)).map { case (id, _, w) =>
      cum += w.toLong
      id -> cum
    }.toMap
    assert(got == want)
  }

  test("rankedCumsum descending via negated value (q62's form)") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (0L until 200L).map(i => (i, rnd.nextInt(40).toLong))
    val df = rows.toDF("id", "v").withColumn("neg", -col("v"))
    val got = Ranks.rankedCumsum(df, col("neg"), col("id"), col("v"))
      .select(col("id"), col("rank")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = rows.sortBy(r => (-r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got == want)
  }
}
