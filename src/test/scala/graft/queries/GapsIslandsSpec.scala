package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized parity for the SCD2 gaps-and-islands semantic shared by
  * q32 (batch window plan) and st22 (streaming keyed fold): the
  * declarative lag+running-sum+rollup+lead pipeline must equal a
  * straight single-threaded reference fold for ANY event stream. The
  * fixture oracle can only witness the tier sequences the generator
  * happened to produce; this spec sweeps seeded random streams with
  * adversarial shapes (immediate flip-flops, long constant runs,
  * single-event users, duplicate timestamps resolved by event id). */
class GapsIslandsSpec extends AnyFunSuite with SparkFixture {

  private def reference(rows: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long, Option[Long])] = {
    // rows: (user, eventId, tsUs, tier) — the brute-force fold
    rows.groupBy(_._1).flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._2))
      val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      for ((_, _, ts, tier) <- ordered)
        if (runs.isEmpty || runs.last._1 != tier) runs += ((tier, ts))
      runs.zipWithIndex.map { case ((tier, from), i) =>
        (u, i + 1L, tier,
          from, runs.lift(i + 1).map(_._2))
      }
    }.toSet
  }

  private def declarative(rows: Seq[(Long, Long, Long, Long)])
      : Set[(Long, Long, Long, Long, Option[Long])] = {
    import spark.implicits._
    val e = rows.toDF("user_id", "event_id", "ts_us", "tier")
    val byTime = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val byStart = Window.partitionBy(col("user_id")).orderBy(col("valid_from"))
    e.withColumn("prev", lag(col("tier"), 1).over(byTime))
      .withColumn("chg",
        when(col("prev").isNull || col("prev") =!= col("tier"), 1L)
          .otherwise(0L))
      .withColumn("version", sum(col("chg")).over(byTime))
      .groupBy(col("user_id"), col("version"))
      .agg(min(col("tier")).as("tier"), min(col("ts_us")).as("valid_from"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byStart))
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))
      }.toSet
  }

  test("scd2 islands: declarative plan equals the reference fold on " +
    "seeded random streams with flip-flops, ties, and singletons") {
    for (seed <- 1 to 4) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 400).map { i =>
        val user = rnd.nextInt(12).toLong
        // coarse ts with frequent exact ties; event id breaks them
        val ts = rnd.nextInt(40).toLong * 1000000L
        val tier = rnd.nextInt(3).toLong
        (user, i.toLong, ts, tier)
      } ++ Seq((99L, 9001L, 0L, 7L)) // singleton user, one open version
      assert(declarative(rows) == reference(rows), s"seed $seed")
    }
  }
}
