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

  test("guard is off by default and rewrites nothing") {
    import spark.implicits._
    val df = (1 to 100).toDF("x")
      .withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    assert(df.count() == 100)
  }
}
