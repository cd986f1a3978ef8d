package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The injected optimizer scale guard: strict mode fails global
  * windows over unbounded inputs at PLAN time, allows the sanctioned
  * bounded (limit / one-row-aggregate) rank-stamp pattern, and stays
  * a no-op when off. */
class PlanGuardSpec extends AnyFunSuite with SparkFixture {

  private def withStrict[A](body: => A): A = {
    spark.conf.set("spark.graft.strictGlobalWindows", "true")
    try body
    finally spark.conf.set("spark.graft.strictGlobalWindows", "false")
  }

  test("strict mode fails an unpartitioned window over an unbounded " +
      "input at plan time") {
    import spark.implicits._
    val df = (1 to 1000).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict {
      val e = intercept[Exception](df.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("strict mode allows the bounded rank-stamp pattern (limit, " +
      "then a global window over the k survivors)") {
    import spark.implicits._
    val top = (1 to 1000).toDF("x").orderBy(col("x").desc).limit(10)
      .withColumn("rn", row_number().over(Window.orderBy(col("x").desc)))
    withStrict {
      assert(top.collect().length == 10)
    }
  }

  test("the driver-session contract pins the guard ON: every Verify " +
      "and Bench session plans under strictGlobalWindows=true") {
    assert(graft.GraftSessions.common
      .contains("spark.graft.strictGlobalWindows" -> "true"),
      "GraftSessions.common must carry the strict guard — Verify and " +
        "Bench both build from it")
    assert(graft.GraftSessions.common
      .contains("spark.sql.extensions" -> "graft.plans.GraftExtensions"),
      "the guard rule only fires if GraftExtensions is injected")
  }

  test("guard is off by default and rewrites nothing") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    assert(df.count() == 100)
  }

  test("strict mode fails the pre-fix t27 shape: a corpus-wide " +
      "cumulative-sum window with a broadcast scalar attached") {
    import spark.implicits._
    val docs = (1 to 1000).map(i => (i.toLong, (i % 97).toLong))
      .toDF("doc_id", "w")
    val tot = docs.select(sum(col("w")).as("t"))
    val df = docs
      .withColumn("cum", sum(col("w")).over(Window.orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(tot))
    withStrict {
      val e = intercept[Exception](df.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("a join of limit(k) with an unbounded table does NOT count as " +
      "bounded — one bounded leg must not launder an unbounded window " +
      "input") {
    import spark.implicits._
    val big = (1 to 1000).toDF("x")
    val small = big.limit(5).withColumnRenamed("x", "y")
    val joined = big.join(small, col("x") === col("y"))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict {
      val e = intercept[Exception](joined.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("a union with one limited leg does NOT count as bounded") {
    import spark.implicits._
    val big = (1 to 1000).toDF("x")
    val u = big.limit(5).union(big)
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict {
      val e = intercept[Exception](u.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  // File-backed frames for the sanctioned shapes: over a
  // LocalRelation the optimizer EXECUTES limits at plan time and the
  // Limit node the guard keys on disappears — a parquet scan (the
  // only input shape that exists at scale) keeps the plan honest.
  private def nations =
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

  test("a union of all-bounded legs and a join of two bounded sides " +
      "stay sanctioned") {
    val big = nations.select(col("n_nationkey").as("x"))
    val u = big.limit(5).union(big.limit(7))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict { assert(u.collect().length == 12) }
    val j = big.limit(5)
      .join(big.limit(25).withColumnRenamed("x", "y"),
        col("x") === col("y"))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict { assert(j.collect().length == 5) }
  }

  test("a semi-join keeps the LEFT bound (output <= left) even when " +
      "the right side is unbounded") {
    val big = nations.select(col("n_nationkey").as("x"))
    val semi = big.limit(5)
      .join(big.withColumnRenamed("x", "y"), col("x") === col("y"),
        "left_semi")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict { assert(semi.collect().length == 5) }
  }
}
