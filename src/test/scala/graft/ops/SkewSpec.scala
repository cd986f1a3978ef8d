package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Skew.saltedJoin: result parity with the plain join (the q98 oracle
  * relation, pinned here at unit scale too), left-join semantics, and
  * the plan shape the operator exists for — the shuffle hashes on
  * (key, salt), so a hot key spreads over `salts` reducers. */
class SkewSpec extends AnyFunSuite with SparkFixture {

  private def frames = {
    import spark.implicits._
    // hot key: 1 owns half the rows
    val skewed = (1 to 400).map { i =>
      (if (i % 2 == 0) 1L else (i % 37).toLong + 2L, i.toLong, i * 10L)
    }.toDF("k", "row_id", "v")
    val build = (1L to 40L).map(k => (k, k * 100L)).toDF("k", "b")
    (skewed, build)
  }

  test("salted inner join == plain inner join, row for row") {
    val (skewed, build) = frames
    val salted = Skew.saltedJoin(skewed, build, "k", col("row_id"),
      salts = 8).select(col("k"), col("row_id"), col("v"), col("b"))
    val plain = skewed.join(build, Seq("k"))
      .select(col("k"), col("row_id"), col("v"), col("b"))
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted left join keeps unmatched skewed rows exactly once") {
    import spark.implicits._
    val skewed = Seq((1L, 1L, 10L), (99L, 2L, 20L))
      .toDF("k", "row_id", "v")
    val build = Seq((1L, 100L)).toDF("k", "b")
    val out = Skew.saltedJoin(skewed, build, "k", col("row_id"),
      salts = 4, joinType = "left")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(out == Set((1L, 1L, 100L), (99L, 2L, -1L)))
  }

  test("the exchange hashes on (k, __salt) — the hot key spreads " +
      "across salts reducers instead of one") {
    val (skewed, build) = frames
    // force the shuffled regime the operator exists for (at unit scale
    // stats would otherwise broadcast the build side and hide the
    // exchange shape)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val plan =
      try Skew.saltedJoin(skewed, build, "k", col("row_id"), salts = 8)
        .queryExecution.executedPlan.toString
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    val exchangeOnSalt = plan.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("k#") &&
        l.contains("__salt"))
    assert(exchangeOnSalt,
      s"the shuffle must hash on (k, __salt), not k alone:\n$plan")
    // distribution check: the hot key's rows really scatter
    val scatter = skewed
      .withColumn("__salt", pmod(xxhash64(col("row_id")), lit(8L)))
      .filter(col("k") === 1L)
      .select(col("__salt")).distinct().count()
    assert(scatter >= 6, s"hot key used only $scatter of 8 salts")
  }
}
