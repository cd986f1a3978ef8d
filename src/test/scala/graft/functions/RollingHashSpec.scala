package graft.functions

import org.apache.spark.sql.functions.{call_function, col}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.plans.GraftExtensions

class RollingHashSpec extends AnyFunSuite with SparkFixture {

  private def reference(s: String, base: Long = RollingHash.DefaultBase): Long = {
    var h = 0L
    s.getBytes("UTF-8").foreach(b => h = h * base + (b & 0xFF))
    h
  }

  test("generated code matches interpreted eval and the reference loop") {
    import spark.implicits._
    GraftExtensions.register(spark)
    val data = Seq("", "a", "hello world", "héllo → 世界",
      "the same string", "the same string").toDF("s")
    val hashed = data.select(col("s"),
      call_function("graft_rolling_hash", col("s")).as("h"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    hashed.foreach { case (s, h) => assert(h == reference(s), s"for '$s'") }
    assert(hashed.filter(_._1 == "the same string").map(_._2).distinct.length == 1)
  }

  test("SQL registration via extensions object") {
    GraftExtensions.register(spark)
    spark.range(1).createOrReplaceTempView("one")
    val h = spark.sql("SELECT graft_rolling_hash('abc') AS h FROM one")
      .head().getLong(0)
    assert(h == reference("abc"))
    val hb = spark.sql("SELECT graft_rolling_hash('abc', 31) AS h FROM one")
      .head().getLong(0)
    assert(hb == reference("abc", 31L))
  }

  test("whole-stage codegen path stays enabled for the expression") {
    GraftExtensions.register(spark)
    val df = spark.range(100)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("doc "),
        col("id").cast("string")).as("s"))
      .select(call_function("graft_rolling_hash", col("s")).as("h"))
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    val plan = df.queryExecution.executedPlan
    val fused = plan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(fused.nonEmpty, plan.toString())
    assert(plan.toString().contains("*(1) Project [graft_rolling_hash"),
      plan.toString())
    assert(df.distinct().count() == 100)
  }
}
