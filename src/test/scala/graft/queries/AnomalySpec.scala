package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** q41's integer cross-multiplied z-test, checked against the float
  * z-score it encodes on hand-built series: (n·x − s)² > 4·(n·q − s²)
  * iff |x − μ| > 2σ over the trailing window. */
class AnomalySpec extends AnyFunSuite with SparkFixture {

  private def flag(history: Seq[Long], x: Long): Boolean = {
    val n = history.length.toLong
    val s = history.sum
    val q = history.map(v => v * v).sum
    n >= 3 &&
      (n * x - s) * (n * x - s) > 4 * (n * q - s * s)
  }

  private def floatFlag(history: Seq[Long], x: Long): Boolean = {
    val n = history.length.toDouble
    if (n < 3) false
    else {
      val mu = history.sum / n
      val sigma2 = history.map(v => v * v).sum / n - mu * mu
      (x - mu) * (x - mu) > 4 * sigma2
    }
  }

  test("integer form agrees with the float z-score on varied series") {
    val cases = Seq(
      (Seq(10L, 10L, 10L), 10L), (Seq(10L, 10L, 10L), 11L),
      (Seq(60L, 70L, 65L, 68L, 72L), 140L),
      (Seq(60L, 70L, 65L, 68L, 72L), 75L),
      (Seq(5L, 100L, 50L), 200L), (Seq(5L, 100L, 50L), 60L),
      (Seq(1L, 1L), 100L), // n < 3: never flags
      (Seq(7L, 7L, 7L, 7L, 7L, 7L, 7L), 8L))
    cases.foreach { case (h, x) =>
      assert(flag(h, x) == floatFlag(h, x), s"history=$h x=$x")
    }
  }

  test("zero-variance history flags any deviation, not the same value") {
    assert(!flag(Seq(10L, 10L, 10L), 10L))
    assert(flag(Seq(10L, 10L, 10L), 11L))
    assert(flag(Seq(10L, 10L, 10L), 9L))
  }

  test("the decimal widening in the production query keeps huge counts exact") {
    import spark.implicits._
    // daily counts ~1e9: (n*x - s) ~ 7e9, squared ~ 4.9e19 > Long.Max.
    val big = 1000000000L
    val rows = (1 to 8).map(d => (d, if (d == 8) 3 * big else big))
    val df = rows.toDF("day", "cnt")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(-7, -1)
    val d19 = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(19, 0))
    val out = df
      .withColumn("n", count(col("cnt")).over(w))
      .withColumn("s", coalesce(sum(col("cnt")).over(w), lit(0L)))
      .withColumn("q",
        coalesce(sum(col("cnt") * col("cnt")).over(w), lit(0L)))
      .select(col("day"),
        (col("n") >= 3 &&
          d19(col("n") * col("cnt") - col("s")) *
            d19(col("n") * col("cnt") - col("s")) >
          lit(4) * (d19(col("n")) * d19(col("q")) -
            d19(col("s")) * d19(col("s")))).as("f"))
      .collect().map(r => r.getInt(0) -> r.getBoolean(1)).toMap
    assert(out(8), "the 3x spike on 1e9-scale counts must flag")
    assert(!out(7), "steady 1e9-scale counts must not flag")
  }
}
