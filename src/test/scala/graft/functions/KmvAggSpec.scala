package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.ops.TextAnalysis

/** Parity: the native TypedImperativeAggregate KMV sketch must land on
  * exactly the table the declarative two-level-window formulation
  * produces (t14's oracle contract), and the raw aggregate must equal
  * sort-distinct-take-k on randomized inputs — the bounded TreeSet
  * buffer, the skip-past-kth fast path and the O(k) merge all have to
  * be invisible in the result. */
class KmvAggSpec extends AnyFunSuite with SparkFixture {

  test("graft_kmv == sorted distinct take-k over randomized grouped longs") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 20000).map { _ =>
      (rnd.nextInt(7), rnd.nextInt(500).toLong)
    }
    val got = rows.toDF("g", "h").repartition(13)
      .groupBy(col("g"))
      .agg(call_function("graft_kmv", col("h"), lit(16)).as("mins"))
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1).toList)).toMap
    val want = rows.groupBy(_._1).map { case (g, vs) =>
      g -> vs.map(_._2).distinct.sorted.take(16).toList
    }
    assert(got == want)
  }

  test("kmv sketch is exact below capacity and returns ascending arrays") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val got = Seq((0, 9L), (0, 3L), (0, 9L), (0, 7L)).toDF("g", "h")
      .groupBy(col("g"))
      .agg(call_function("graft_kmv", col("h"), lit(16)).as("mins"))
      .head().getSeq[Long](1).toList
    assert(got == List(3L, 7L, 9L))
  }

  test("native kmvDistinct table == declarative two-level-window table " +
      "on a random corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (1 to 300).map { i =>
      val words = Seq.fill(rnd.nextInt(30) + 1)("w" + rnd.nextInt(200))
      (i.toLong, words.mkString(" "), s"l${i % 5}")
    }.toDF("doc_id", "text", "lang")
    val a = TextAnalysis.kmvDistinct(docs, col("text"), col("lang"), k = 8)
      .orderBy("stratum").collect().toSeq
    val b = TextAnalysis.kmvDistinctNative(docs, col("text"), col("lang"),
        k = 8)
      .orderBy("stratum").collect().toSeq
    assert(a == b)
  }
}
