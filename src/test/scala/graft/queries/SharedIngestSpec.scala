package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The round-15 one-ingest-many-readouts memoization
  * ([[StreamingQueries.sharedIngest]]): the reference's serving
  * topology is ONE processor maintaining the group table with many
  * Views reading it (view.go:42-52), so readouts of a shared-shape
  * family must fold over ONE maintained state table, not re-run the
  * replay — and the cache must never leak across sessions, fixture
  * dirs, or state shapes (that would let one query's state feed
  * another's verdict). */
class SharedIngestSpec extends AnyFunSuite with SparkFixture {

  test("same (session, dir, shape) builds once and returns the same table") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((1L, 2L)).toDF("k", "v") }
    val a = StreamingQueries.sharedIngest(spark, "/fixture/A", "specShape")(build)
    val b = StreamingQueries.sharedIngest(spark, "/fixture/A", "specShape")(build)
    assert(builds == 1)
    assert(a eq b) // the SAME maintained table, not a re-run
  }

  test("different dir or shape is a different ingest") {
    import spark.implicits._
    var builds = 0
    def build = { builds += 1; Seq((1L, 2L)).toDF("k", "v") }
    StreamingQueries.sharedIngest(spark, "/fixture/B", "shapeX")(build)
    StreamingQueries.sharedIngest(spark, "/fixture/C", "shapeX")(build)
    StreamingQueries.sharedIngest(spark, "/fixture/B", "shapeY")(build)
    assert(builds == 3)
  }

  test("cache keys carry the session identity (no cross-session reuse)") {
    import spark.implicits._
    // the key includes sessionUUID (stable, never reused — unlike the
    // identity hash r15 keyed on, which GC can recycle), so a
    // different session can never observe this one's entries
    StreamingQueries.sharedIngest(spark, "/fixture/D", "shapeZ")(
      Seq((1L, 1L)).toDF("k", "v"))
    val key = StreamingQueries.sharedIngestCache.keySet
      .find(k => k._2 == "/fixture/D" && k._3 == "shapeZ")
    assert(key.exists(_._1 == StreamingQueries.sessionId(spark)))
    // a sibling session with its own UUID sees a miss on the same
    // (dir, shape)
    val sibling = spark.newSession()
    var builds = 0
    StreamingQueries.sharedIngest(sibling, "/fixture/D", "shapeZ") {
      builds += 1; sibling.range(1).toDF("k")
    }
    assert(builds == 1)
  }
}
