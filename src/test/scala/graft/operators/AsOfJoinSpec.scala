package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions.col
import graft.SparkFixture

class AsOfJoinSpec extends AnyFunSuite with SparkFixture {

  private def dfs = {
    import spark.implicits._
    val left = Seq(("k1", 10L, "L1"), ("k1", 20L, "L2"), ("k2", 5L, "L3"))
      .toDF("k", "t", "lv")
    val right = Seq(("k1", 10L, "R10"), ("k1", 15L, "R15"), ("k1", 15L, "R15b"),
      ("k2", 9L, "R9"))
      .toDF("k", "rt", "rv")
    (left, right)
  }

  test("inclusive: right row at equal time matches") {
    val (l, r) = dfs
    val out = AsOfJoin.leftAsOf(l, r, "k", "k", col("t"), col("rt"), "rv")
      .collect().map(row => (row.getString(2), row.getString(4))).toMap
    assert(out("L1") == "R10") // equal-time match
    assert(out("L2") == "R15b") // latest <= 20; tie at 15 -> max tieBreak
    assert(out("L3") == null) // 9 > 5: nothing at or before
  }

  test("strict: equal-time right row is excluded") {
    val (l, r) = dfs
    val out = AsOfJoin.leftAsOf(l, r, "k", "k", col("t"), col("rt"), "rv",
      strict = true)
      .collect().map(row => (row.getString(2), row.getString(4))).toMap
    assert(out("L1") == null) // only candidate was AT t=10
    assert(out("L2") == "R15b")
  }

  test("left columns preserved, one output row per left row") {
    val (l, r) = dfs
    val out = AsOfJoin.leftAsOf(l, r, "k", "k", col("t"), col("rt"), "rv")
    assert(out.count() == 3)
    assert(out.columns.toSeq == Seq("k", "t", "lv", "rt", "rv"))
  }
}
