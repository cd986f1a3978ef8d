package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.ops.Dedup

/** Parity: the native map-only SimHash kernel must produce EXACTLY the
  * declarative explode + 60-conditional-sums aggregation it replaces —
  * the d03/d06 DuckDB oracles mirror that declarative arithmetic. */
class SimHashSpec extends AnyFunSuite with SparkFixture {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c a b c a b c",              // duplicates collapse before voting
    "",                               // one empty token
    "one",
    "trailing space ",                // empty trailing token
    " leading",
    "double  space here now",
    "héllo wörld ünïcode tokens",     // multi-byte UTF-8
    "tie a b")                        // even token counts exercise 2c > n

  test("native kernel matches declarative aggregation on all edge cases") {
    import spark.implicits._
    val df = cases.zipWithIndex.map(_.swap).toDF("id", "text")
    val declarative = Dedup.simhashDeclarative(df, col("text"), col("id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val native = Dedup.simhash(df, col("text"), col("id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(native == declarative)
  }

  test("null docs are dropped, matching the exploded form") {
    import spark.implicits._
    val df = Seq((1, "a b"), (2, null.asInstanceOf[String])).toDF("id", "text")
    assert(Dedup.simhash(df, col("text"), col("id"))
      .collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("interpreted eval matches codegen and the h60 column function") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    // single token: simhash == h60(token)
    val tok = "solo"
    val interpreted = SimHash60(Literal(UTF8String.fromString(tok),
      org.apache.spark.sql.types.StringType)).eval(null)
    val viaSql = Seq(tok).toDF("t")
      .select(Hashes.h60(col("t"))).head().getLong(0)
    assert(interpreted == viaSql)
    graft.plans.GraftExtensions.register(spark)
    val codegen = spark.sql(s"SELECT graft_simhash('$tok')").head().getLong(0)
    assert(codegen == viaSql)
  }
}
