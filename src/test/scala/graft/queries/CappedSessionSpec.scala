package graft.queries

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** q39's duration-capped sessionization recurrence against hand-built
  * timelines — the arms a gap-only session window cannot express, plus
  * the strict-inequality boundaries the oracle must agree on. */
class CappedSessionSpec extends AnyFunSuite with SparkFixture {

  private val H = 3600L * 1000000L // one hour in micros

  /** Run the production fold with gap 24 h / cap 48 h over per-user
    * hour offsets; returns user -> (n_sessions, n_cap_splits). */
  private def run(seqs: (Long, Seq[Long])*): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val rows = seqs.flatMap { case (u, hours) =>
      hours.zipWithIndex.map { case (h, i) =>
        (u, u * 1000 + i, new Timestamp(1700000000000L + h * 3600 * 1000))
      }
    }
    Relational.cappedSessionOver(
      rows.toDF("user_id", "event_id", "ts"),
      gapUs = 24 * H, capUs = 48 * H)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("single event is one session, no cap splits") {
    assert(run(1L -> Seq(0L))(1L) == ((1L, 0L)))
  }

  test("gap break opens a session without counting as a cap split") {
    // 0h, 10h (same session), 40h (> 24h after 10h: gap break)
    assert(run(2L -> Seq(0L, 10L, 40L))(2L) == ((2L, 0L)))
  }

  test("steady sub-gap activity is split only by the duration cap") {
    // every 23h: never a gap break; anchor resets at each cap split.
    // t=0 opens; 23,46 extend; 69 > 48 past anchor 0 -> cap split
    // (anchor 69); 92,115 extend; 138 > 48 past 69 -> cap split.
    assert(run(3L -> Seq(0L, 23L, 46L, 69L, 92L, 115L, 138L))(3L)
      == ((3L, 2L)))
  }

  test("boundaries are strict: exactly-at-gap and exactly-at-cap extend") {
    // second event exactly 24h later: NOT a gap break.
    assert(run(4L -> Seq(0L, 24L))(4L) == ((1L, 0L)))
    // 0, 24, 48: 48 - anchor 0 = exactly the cap -> still one session.
    assert(run(5L -> Seq(0L, 24L, 48L))(5L) == ((1L, 0L)))
    // ...but 49 is past it.
    assert(run(6L -> Seq(0L, 24L, 48L, 49L))(6L) == ((2L, 1L)))
  }

  test("gap break wins over cap when both would fire") {
    // 0, then 100h later: gap (> 24h) fires first -> plain new
    // session, ncap stays 0 even though 100 > 48 too.
    assert(run(7L -> Seq(0L, 100L))(7L) == ((2L, 0L)))
  }

  test("users fold independently") {
    val m = run(8L -> Seq(0L, 23L, 46L, 69L), 9L -> Seq(0L))
    assert(m(8L) == ((2L, 1L)) && m(9L) == ((1L, 0L)))
  }
}
