package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class RangeJoinSpec extends AnyFunSuite with SparkFixture {

  test("time range join: inclusive bounds, granule-boundary pairs found once") {
    import spark.implicits._
    // granule width = before + after = 100; pairs deliberately straddle
    // a granule boundary (ts 95 vs 105) to prove the explode covers it
    val left = Seq((1L, 100L), (2L, 1000L)).toDF("lid", "ts")
    val right = Seq(
      (10L, 50L),   // l1 - 50: inclusive lower bound
      (11L, 150L),  // l1 + 50: inclusive upper bound
      (12L, 151L),  // just outside
      (13L, 49L),   // just outside
      (14L, 95L),   // same granule as l1
      (15L, 1049L)) // l2 window, different granule than l2's ts
      .toDF("rid", "ts")
    val r = RangeJoin.timeRange(left, right, col("ts"), col("ts"), 50L, 50L)
      .select(col("l.lid"), col("r.rid")).as[(Long, Long)].collect().sorted
    assert(r.toSeq == Seq((1L, 10L), (1L, 11L), (1L, 14L), (2L, 15L)))
  }

  test("time range join: asymmetric window, no duplicate pairs") {
    import spark.implicits._
    val left = Seq((1L, 500L)).toDF("lid", "ts")
    val right = (0L to 1000L by 10).map(t => (t, t)).toDF("rid", "ts")
    val r = RangeJoin.timeRange(left, right, col("ts"), col("ts"), 0L, 200L)
      .select(col("r.ts")).as[Long].collect().sorted
    assert(r.toSeq == (500L to 700L by 10).toSeq) // [ts, ts+200], each once
  }
}
