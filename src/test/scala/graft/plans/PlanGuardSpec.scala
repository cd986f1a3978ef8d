package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The injected optimizer scale guard: strict mode fails global
  * windows over unbounded inputs and keyless (cartesian/nested-loop)
  * joins of unbounded inputs at PLAN time, allows the sanctioned
  * shapes (bounded rank-stamp, broadcast scalar attach, explicit
  * shuffle_replicate_nl opt-in), and stays a no-op when off. */
class PlanGuardSpec extends AnyFunSuite with SparkFixture {

  private def withStrict[A](body: => A): A = {
    spark.conf.set("spark.graft.strictGlobalWindows", "true")
    try body
    finally spark.conf.set("spark.graft.strictGlobalWindows", "false")
  }

  private def withStrictCartesian[A](body: => A): A = {
    spark.conf.set("spark.graft.strictCartesian", "true")
    try body
    finally spark.conf.set("spark.graft.strictCartesian", "false")
  }

  // File-backed frames for every unbounded-input case: a LocalRelation
  // is literal driver-side data — bounded by construction (it already
  // fits on the driver), so the guard rightly sanctions it, and the
  // optimizer additionally EXECUTES limits over it at plan time. A
  // parquet scan (the only input shape that exists at scale) keeps the
  // plans honest.
  private def nations =
    spark.read.parquet("/root/testdata/sf0.001/nation.parquet")

  test("strict mode fails an unpartitioned window over an unbounded " +
      "input at plan time") {
    val df = nations.select(col("n_nationkey").as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict {
      val e = intercept[Exception](df.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("strict mode allows the bounded rank-stamp pattern (limit, " +
      "then a global window over the k survivors)") {
    val top = nations.select(col("n_nationkey").as("x"))
      .orderBy(col("x").desc).limit(10)
      .withColumn("rn", row_number().over(Window.orderBy(col("x").desc)))
    withStrict {
      assert(top.collect().length == 10)
    }
  }

  test("a global window over a LocalRelation stays sanctioned — " +
      "literal driver-side data is bounded by construction") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict { assert(df.collect().length == 100) }
  }

  test("the driver-session contract pins the guard ON: every Verify " +
      "and Bench session plans under strictGlobalWindows=true AND " +
      "strictCartesian=true") {
    assert(graft.GraftSessions.common
      .contains("spark.graft.strictGlobalWindows" -> "true"),
      "GraftSessions.common must carry the strict guard — Verify and " +
        "Bench both build from it")
    assert(graft.GraftSessions.common
      .contains("spark.graft.strictCartesian" -> "true"),
      "GraftSessions.common must carry the cartesian guard too")
    assert(graft.GraftSessions.common
      .contains("spark.sql.extensions" -> "graft.plans.GraftExtensions"),
      "the guard rule only fires if GraftExtensions is injected")
  }

  test("guard is off by default and rewrites nothing") {
    val df = nations.select(col("n_nationkey").as("x"))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    assert(df.count() == 25)
  }

  test("strict mode fails the pre-fix t27 shape: a corpus-wide " +
      "cumulative-sum window with a broadcast scalar attached") {
    val docs = nations.select(col("n_nationkey").cast("long").as("doc_id"),
      (col("n_nationkey") % 7).cast("long").as("w"))
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
    val big = nations.select(col("n_nationkey").as("x"))
    val small = big.limit(5).withColumnRenamed("x", "y")
    val joined = big.join(small, col("x") === col("y"))
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict {
      val e = intercept[Exception](joined.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("a union with one limited leg does NOT count as bounded") {
    val big = nations.select(col("n_nationkey").as("x"))
    val u = big.limit(5).union(big)
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    withStrict {
      val e = intercept[Exception](u.collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

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

  // ------------------------------------------------------------------ //
  //  strictCartesian                                                    //
  // ------------------------------------------------------------------ //

  test("strictCartesian fails a bare cross join of two unbounded " +
      "inputs at plan time") {
    val a = nations.select(col("n_nationkey").as("x"))
    val b = nations.select(col("n_nationkey").as("y"))
    withStrictCartesian {
      val e = intercept[Exception](a.crossJoin(b).collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("strictCartesian fails a purely non-equi (range) join of two " +
      "unbounded inputs — it plans as a nested-loop product") {
    val a = nations.select(col("n_nationkey").as("x"))
    val b = nations.select(col("n_nationkey").as("y"))
    withStrictCartesian {
      val e = intercept[Exception](
        a.join(b, col("x") < col("y")).collect())
      assert(e.getMessage.contains("strict plan guard"), e.getMessage)
    }
  }

  test("strictCartesian allows the broadcast scalar-attach idiom: " +
      "crossJoin(broadcast(one-row aggregate))") {
    val a = nations.select(col("n_nationkey").as("x"))
    val tot = a.agg(sum(col("x")).as("t"))
    withStrictCartesian {
      assert(a.crossJoin(broadcast(tot)).collect().length == 25)
    }
  }

  test("strictCartesian allows the explicit opt-in: " +
      "hint(\"shuffle_replicate_nl\") marks a documented exact " +
      "all-pairs tier") {
    val a = nations.select(col("n_nationkey").as("x"))
    val b = nations.select(col("n_nationkey").as("y"))
    withStrictCartesian {
      assert(a.hint("shuffle_replicate_nl").crossJoin(b)
        .collect().length == 625)
    }
  }

  test("strictCartesian allows a keyless join when one side is " +
      "bounded (limit) — O(k*n), not quadratic") {
    val a = nations.select(col("n_nationkey").as("x"))
    val b = nations.select(col("n_nationkey").as("y")).limit(3)
    withStrictCartesian {
      assert(a.crossJoin(b).collect().length == 75)
    }
  }

  test("strictCartesian allows a join whose condition carries an " +
      "equi-key next to non-equi conjuncts — hash-join keys extract") {
    val a = nations.select(col("n_nationkey").as("x"),
      col("n_regionkey").as("rx"))
    val b = nations.select(col("n_nationkey").as("y"),
      col("n_regionkey").as("ry"))
    withStrictCartesian {
      assert(a.join(b, col("rx") === col("ry") && col("x") < col("y"))
        .count() > 0)
    }
  }

  test("the exact all-pairs tiers plan under both strict flags: " +
      "nearDupPairs carries its own shuffle_replicate_nl opt-in") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    withStrict { withStrictCartesian {
      val pairs = graft.ops.Vectors.nearDupPairs(
        emb, col("vec_id"), col("embedding"), threshold = 0.99)
      assert(pairs.count() >= 0)
    } }
  }
}
