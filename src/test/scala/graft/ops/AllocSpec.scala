package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** c11/c12 governance ops: Hamilton apportionment exactness and the
  * k-anonymity rollup on hand-built tables. */
class AllocSpec extends AnyFunSuite with SparkFixture {

  test("largest remainder: sum(alloc) == budget exactly, remainders ranked") {
    import spark.implicits._
    // weights 3:3:4 over budget 10 -> quotas 3,3,4 exact, no leftover;
    // weights 1:1:1 over budget 10 -> quotas 3,3,3 + 1 to the smallest
    // domain name (all remainders equal).
    val a = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("d", "w")
    val outA = Profiling.largestRemainderAlloc(a, col("d"), col("w"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(outA == Map("a" -> 3L, "b" -> 3L, "c" -> 4L))

    val b = Seq(("x", 1L), ("y", 1L), ("z", 1L)).toDF("d", "w")
    val outB = Profiling.largestRemainderAlloc(b, col("d"), col("w"), 10L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(outB == Map("x" -> 4L, "y" -> 3L, "z" -> 3L))
    assert(outB.values.sum == 10L)
  }

  test("largest remainder: skewed weights still land exactly on budget") {
    import spark.implicits._
    val df = Seq(("a", 999L), ("b", 1L), ("c", 7L), ("d", 13L))
      .toDF("d", "w")
    val out = Profiling.largestRemainderAlloc(df, col("d"), col("w"), 1000L)
      .collect().map(r => r.getLong(2))
    assert(out.sum == 1000L)
  }

  test("k-anonymity: risky classes and rows roll up per unit") {
    import spark.implicits._
    // unit u1: classes {q=1: 3 rows, q=2: 1 row} -> 1 risky class,
    // 1 risky row at k=2... use k=3: sizes 3 and 1 -> risky = the
    // 1-row class only.
    val df = Seq(
      ("u1", 1), ("u1", 1), ("u1", 1), ("u1", 2),
      ("u2", 9), ("u2", 9), ("u2", 9)).toDF("u", "q")
    val out = Profiling.kAnonymityReport(df, col("u"), Seq(col("q")), 3)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5)))).toMap
    assert(out("u1") == ((4L, 2L, 1L, 1L, 1L)))
    assert(out("u2") == ((3L, 1L, 3L, 0L, 0L)))
  }
}
