package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized parity for the session's ordered-fold operators: seeded
  * random timelines driven through the PRODUCTION folds (q48 EWMA,
  * q49 TWA, q45 sweep-line) and compared against independent
  * brute-force Scala references. The references share no code with
  * the implementations — the EWMA reference is a plain loop, the TWA
  * reference sorts and sums, the concurrency reference scans every
  * boundary instant and counts open intervals directly. */
class RandomizedFoldSpec extends AnyFunSuite with SparkFixture {

  private val dayUs = 86400000000L

  test("q83 lindley closed form == sequential max(0, h+x) fold on " +
      "random signed timelines") {
    import spark.implicits._
    import java.sql.Timestamp
    for (seed <- Seq(11, 61, 2024)) {
      val rnd = new scala.util.Random(seed)
      val timelines = (1L to 30L).map { u =>
        u -> (0 until rnd.nextInt(50)).map(_ =>
          rnd.nextInt(200).toLong - 100L)
      }.toMap
      val rows = timelines.toSeq.flatMap { case (u, ds) =>
        ds.zipWithIndex.map { case (d, i) =>
          (u, new Timestamp(i * 1000L), u * 1000 + i, d)
        }
      }
      val got = Relational.flooredBalanceOver(
        rows.toDF("user_id", "ts", "event_id", "delta"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      timelines.foreach { case (u, ds) =>
        if (ds.nonEmpty) {
          var h = 0L; var peak = 0L
          ds.foreach { d => h = math.max(0L, h + d)
            peak = math.max(peak, h) }
          assert(got(u) == ((h, peak)), s"seed=$seed user=$u")
        }
      }
    }
  }

  test("c38 fk edge audit: synthetic orphans are counted and the " +
      "smallest one is the repro handle") {
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 7L, 9L, 9L, 9L).toDF("k0")
    val parent = Seq(1L, 2L, 3L).toDF("p0")
    val got = graft.queries.PipelineQueries.fkEdgeAudit(
      "t", child, col("k0"), parent, col("p0")).head()
    assert((got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) == ((7L, 4L, 2L, 7L)))
    // clean edge → zero orphans, -1 handle
    val clean = graft.queries.PipelineQueries.fkEdgeAudit(
      "t", parent, col("p0"), parent, col("p0")).head()
    assert(clean.getLong(3) == 0L && clean.getLong(4) == -1L)
  }

  test("q86 kruskal-wallis h' == from-definition midrank reference " +
      "on tie-heavy random samples") {
    import spark.implicits._
    for (seed <- Seq(13, 47, 901)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 500).map { _ =>
        (s"t${rnd.nextInt(3)}", rnd.nextInt(15).toDouble,
          rnd.nextInt(4).toLong)
      }
      val got = Relational.kruskalWallisOver(
        rows.toDF("event_type", "value", "arm"))
        .collect().map(r => r.getString(0) -> r.getDouble(6)).toMap
      rows.groupBy(_._1).foreach { case (t, grp) =>
        // textbook definition: average ranks of the pooled sample
        val sorted = grp.map(_._2).sorted
        val midrank = sorted.distinct.map { v =>
          val lo = sorted.indexOf(v) + 1
          val hi = sorted.lastIndexOf(v) + 1
          v -> (lo + hi) / 2.0
        }.toMap
        val n = grp.size.toDouble
        val hRaw = 12.0 / (n * (n + 1)) * (0 to 3).map { a =>
          val arm = grp.filter(_._3 == a)
          val rsum = arm.map(e => midrank(e._2)).sum
          rsum * rsum / arm.size
        }.sum - 3 * (n + 1)
        val ties = grp.map(_._2).groupBy(identity).values
          .map(_.size.toDouble).map(c => c * c * c - c).sum
        val want = hRaw / (1.0 - ties / (n * n * n - n))
        assert(math.abs(got(t) - want) < 1e-9 * math.max(1.0, want.abs),
          s"seed=$seed type=$t got=${got(t)} want=$want")
      }
    }
  }

  test("q81 mann-whitney == direct pair counting on tie-heavy " +
      "random samples") {
    import spark.implicits._
    for (seed <- Seq(5, 23, 77)) {
      val rnd = new scala.util.Random(seed)
      // few distinct values → heavy ties, the hard case for midranks
      val rows = (0 until 400).map { _ =>
        (s"t${rnd.nextInt(3)}", rnd.nextInt(12).toDouble,
          rnd.nextInt(2).toLong)
      }
      val got = Relational.mannWhitneyOver(
        rows.toDF("event_type", "value", "arm"))
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      rows.groupBy(_._1).foreach { case (t, g) =>
        val a = g.filter(_._3 == 0L).map(_._2)
        val b = g.filter(_._3 == 1L).map(_._2)
        // 2U_a = 2·#{x∈a, y∈b: x > y} + #{x = y}
        val u2 = a.map(x =>
          2L * b.count(x > _) + b.count(x == _).toLong).sum
        val tc = g.map(_._2).groupBy(identity).values
          .map(v => v.size.toLong).map(c => c * c * c - c).sum
        assert(got(t) == ((a.size.toLong, b.size.toLong, u2, tc)),
          s"seed=$seed type=$t got=${got(t)} " +
            s"want=(${a.size},${b.size},$u2,$tc)")
      }
    }
  }

  test("q48 ewma fold == loop reference on random daily series") {
    import spark.implicits._
    for (seed <- Seq(3, 17, 99)) {
      val rnd = new scala.util.Random(seed)
      val rows = for {
        u <- 0L until 20L
        d <- (0L until 40L).filter(_ => rnd.nextInt(3) > 0)
      } yield (u, d, rnd.nextInt(1000).toLong + 1L)
      val got = Relational.ewmaOver(rows.toDF("user_id", "d", "x"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      val want = rows.groupBy(_._1).map { case (u, rs) =>
        val xs = rs.sortBy(_._2).map(_._3)
        var s = -1L
        xs.foreach(x => s = if (s < 0) x * 64 else (x * 64 + 7 * s) >> 3)
        u -> ((xs.length.toLong, s))
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("q49 twa rollup == brute reference on random in-day timelines") {
    import spark.implicits._
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0L until 400L).map { i =>
        val u = rnd.nextInt(10).toLong
        val day = rnd.nextInt(3).toLong
        val t = day * dayUs + rnd.nextLong(dayUs)
        (u, t, i, rnd.nextInt(10000).toLong)
      }
      val got = Relational.twaOver(rows.toDF("user_id", "t", "event_id", "vc"))
        .collect().map(r => (r.getLong(0), r.getString(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val want = rows.groupBy(r => (r._1, r._2 / dayUs)).map {
        case ((u, day), rs) =>
          val ordered = rs.sortBy(r => (r._2, r._3))
          val dayEnd = (day + 1) * dayUs
          val durs = ordered.zip(
            ordered.drop(1).map(_._2) :+ dayEnd).map {
            case ((_, t, _, vc), tn) => (vc, tn - t)
          }
          val dstr = java.time.LocalDate.ofEpochDay(day).toString
          (u, dstr) -> ((durs.map { case (vc, d) => vc * d }.sum,
            durs.map(_._2).sum, ordered.length.toLong))
      }
      assert(got == want, s"seed=$seed")
    }
  }

  test("q55 grid join is LOSSLESS — == brute-force all-pairs on " +
      "random clustered points (cell-boundary pairs included)") {
    import spark.implicits._
    for (seed <- Seq(13, 77)) {
      val rnd = new scala.util.Random(seed)
      // cluster around cell boundaries so cross-cell pairs are common
      val pts = (0L until 250L).map { i =>
        val bx = rnd.nextInt(5) * 1000L
        (i, bx + rnd.nextInt(400) - 200L + 2000L,
          rnd.nextInt(5) * 1000L + rnd.nextInt(400) - 200L + 2000L)
      }
      val r2 = 900L * 900L
      val got = Relational.closePairStats(
        pts.toDF("id", "x", "y"), cellSide = 1000L, r2 = r2)
        .collect().head
      val brute = for {
        (i, xi, yi) <- pts; (j, xj, yj) <- pts
        if i < j
        d2 = (xi - xj) * (xi - xj) + (yi - yj) * (yi - yj)
        if d2 < r2
      } yield d2
      assert(got.getLong(0) == brute.length.toLong, s"seed=$seed count")
      assert(got.getLong(1) == brute.min, s"seed=$seed min")
      assert(got.getLong(2) == brute.sum, s"seed=$seed sum")
    }
  }

  test("q45 sweep == instant-scan reference on random bursts " +
      "(midnight-crossing included)") {
    import spark.implicits._
    for (seed <- Seq(7, 41)) {
      val rnd = new scala.util.Random(seed)
      // cluster starts so overlaps are dense; push some starts near
      // midnight so the day-clip branches execute
      val starts = (0L until 300L).map { i =>
        val day = rnd.nextInt(4).toLong
        val base = if (rnd.nextInt(5) == 0) dayUs - 1800000000L / 2
                   else rnd.nextLong(dayUs - 1)
        (i, day * dayUs + base)
      }
      val df = starts.map { case (i, t) =>
        (i, java.sql.Timestamp.from(java.time.Instant.EPOCH
          .plus(java.time.Duration.ofNanos(t * 1000))))
      }.toDF("event_id", "ts")
      val got = Relational.peakOver(df)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reference: at every interval-start instant, count open
      // intervals [s, s+30m) containing it; per-day max over the
      // day's instants (the maximum is always attained at a start —
      // and for a day entered only by carried-over intervals, at the
      // clipped day-start boundary point, which the construction adds)
      val iv = starts.map { case (_, s) => (s, s + 1800000000L) }
      val instants = iv.map(_._1) ++
        iv.map { case (s, e) => (s / dayUs + 1) * dayUs }
          .filter(t => iv.exists { case (s, e) => s < t && t < e })
      val want = instants.map { t =>
        (t / dayUs, iv.count { case (s, e) => s <= t && t < e })
      }.groupBy(_._1).map { case (d, xs) =>
        java.time.LocalDate.ofEpochDay(d).toString -> xs.map(_._2).max.toLong
      }
      assert(got == want, s"seed=$seed")
    }
  }
}
