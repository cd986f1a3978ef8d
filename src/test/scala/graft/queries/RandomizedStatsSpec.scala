package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Seeded randomized from-definition checks for the round-13 statistics
  * (q91 KS, q92 Spearman): the distributed tie-collapsed/midrank
  * implementations are compared against brute-force single-threaded
  * references on inputs the implementations' author did not pick —
  * including heavy ties, the case the collapse machinery exists for. */
class RandomizedStatsSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new scala.util.Random(20260815L)

  test("q91 KS: random two-sample data matches the brute-force ECDF " +
      "max-gap, including the cross-multiplied decision") {
    import spark.implicits._
    for (round <- 1 to 3) {
      // small value domain → heavy ties
      val rows = (1 to 400).map { i =>
        ("t" + (i % 2), rnd.nextInt(12).toDouble / 2.0,
          rnd.nextInt(2).toLong)
      }
      val counts = rows.toDF("event_type", "value", "arm")
        .groupBy(col("event_type"), col("value"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("ca"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("cb"))
      val got = Relational.ksCollapsed(counts).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      rows.groupBy(_._1).foreach { case (t, g) =>
        val a = g.filter(_._3 == 0L).map(_._2).sorted
        val b = g.filter(_._3 == 1L).map(_._2).sorted
        val (na, nb) = (a.length.toLong, b.length.toLong)
        val vals = (a ++ b).distinct.sorted
        val dNum = vals.map(v =>
          math.abs(a.count(_ <= v) * nb - b.count(_ <= v) * na)).max
        val sig =
          if (BigInt(10000) * BigInt(dNum) * BigInt(dNum) >=
            BigInt(18496) * BigInt(na + nb) * BigInt(na) * BigInt(nb)) 1L
          else 0L
        assert(got(t) == ((na, nb, dNum, sig)), s"round $round type $t")
      }
    }
  }

  test("q92 Spearman: random tied data matches Pearson on tie-averaged " +
      "ranks computed by brute force") {
    import spark.implicits._
    // Exercise the op's moment pipeline on a synthetic frame shaped
    // like lineitem's (flag, x, y) — spearmanOver is what spearman()
    // feeds from the fixture.
    for (round <- 1 to 3) {
      val rows = (1 to 300).map { _ =>
        ("F" + rnd.nextInt(2), rnd.nextInt(8).toDouble,
          rnd.nextInt(20).toDouble)
      }
      val got = Relational.spearmanOver(
        rows.toDF("flag", "x", "y")).collect()
        .map(r => r.getString(0) -> r.getDouble(5)).toMap
      rows.groupBy(_._1).foreach { case (f, g) =>
        def midranks(vs: Seq[Double]): Map[Double, Double] = {
          val sorted = vs.sorted
          vs.distinct.map { v =>
            val lo = sorted.indexWhere(_ == v) + 1
            val hi = sorted.lastIndexWhere(_ == v) + 1
            v -> (lo + hi) / 2.0
          }.toMap
        }
        val rx = midranks(g.map(_._2))
        val ry = midranks(g.map(_._3))
        val xs = g.map(r => rx(r._2))
        val ys = g.map(r => ry(r._3))
        val n = g.length.toDouble
        val (mx, my) = (xs.sum / n, ys.sum / n)
        val num = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
        val den = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum) *
          math.sqrt(ys.map(y => (y - my) * (y - my)).sum)
        val want = num / den
        assert(math.abs(got(f) - want) < 1e-9,
          s"round $round flag $f: got ${got(f)} want $want")
      }
    }
  }
}
