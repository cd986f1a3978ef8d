package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The q43 semantics on synthetic data: `NOT IN` is three-valued —
  * one NULL in the subquery set makes the predicate UNKNOWN for every
  * outer row, so the correct answer flips from "the complement" to
  * "empty". A LeftAnti rewrite would wrongly keep rows; the null-aware
  * plan must not. */
class NullAwareAntiJoinSpec extends AnyFunSuite with SparkFixture {

  private def run(sub: Seq[java.lang.Long]): Seq[Long] = {
    import spark.implicits._
    Seq(1L, 2L, 3L).toDF("k").createOrReplaceTempView("naaj_outer")
    sub.map(Option(_).map(Long.unbox)).toDF("v")
      .createOrReplaceTempView("naaj_inner")
    spark.sql(
      "SELECT k FROM naaj_outer WHERE k NOT IN (SELECT v FROM naaj_inner)")
      .as[Long].collect().toSeq.sorted
  }

  test("null-free set: NOT IN is the plain complement") {
    assert(run(Seq(2L, 9L)) == Seq(1L, 3L))
  }

  test("one NULL in the set empties the result — UNKNOWN, not TRUE") {
    assert(run(Seq(2L, null)) == Seq.empty)
  }

  test("empty set keeps everything (vacuous NOT IN)") {
    assert(run(Seq.empty) == Seq(1L, 2L, 3L))
  }
}
