package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** q37's greedy non-overlapping pattern count (MATCH_RECOGNIZE
  * after-match-skip-past-last-row semantics) against hand-built
  * sequences, including the cases that separate it from q26's
  * first-occurrence funnel. */
class CepMatchSpec extends AnyFunSuite with SparkFixture {

  private def run(seqs: (Long, Seq[String])*): Map[Long, Long] = {
    import spark.implicits._
    val rows = seqs.flatMap { case (u, evs) =>
      evs.zipWithIndex.map { case (t, i) =>
        (u, u * 1000 + i, new Timestamp(1700000000000L + i * 1000), t)
      }
    }
    Relational.cepMatchOver(
      rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("two completed journeys count twice; q26 would count once") {
    val m = run(1L -> Seq("view", "click", "purchase",
      "view", "click", "purchase"))
    assert(m(1L) == 2L)
  }

  test("greedy non-overlap: interleaved steps cannot be reused") {
    // view view click purchase: the second view is swallowed while the
    // machine waits for a click (stage stays 1), so exactly one match
    assert(run(2L -> Seq("view", "view", "click", "purchase"))(2L) == 1L)
    // after a match the machine resets: a dangling prefix adds nothing
    assert(run(3L -> Seq("view", "click", "purchase", "view", "click"))(3L)
      == 1L)
  }

  test("out-of-pattern and unknown events are neutral") {
    assert(run(4L -> Seq("click", "purchase", "view", "scroll", "click",
      "purchase"))(4L) == 1L)
    assert(run(5L -> Seq("purchase", "click", "view"))(5L) == 0L)
  }

  test("order comes from (ts, event_id), not arrival order") {
    import spark.implicits._
    // same ts for all rows: event_id breaks the tie; reversed insertion
    val rows = Seq(
      (6L, 3L, new Timestamp(1700000000000L), "purchase"),
      (6L, 2L, new Timestamp(1700000000000L), "click"),
      (6L, 1L, new Timestamp(1700000000000L), "view"))
    val m = Relational.cepMatchOver(
      rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(6L) == 1L)
  }
}
