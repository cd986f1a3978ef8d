package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.ops.Dedup

/** Parity: the native codegen shingle kernel must produce EXACTLY the
  * declarative `array_distinct(transform(...))` form, element order
  * included, on every edge case — otherwise the DuckDB oracles (which
  * mirror the declarative form) lose their meaning. */
class ShinglesSpec extends AnyFunSuite with SparkFixture {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c a b c a b c",              // duplicate shingles
    "",                               // empty doc
    "one",                            // below n
    "one two",                        // below n
    "one two three",                  // exactly n
    "trailing space ",                // empty trailing token
    " leading",                       // empty leading token
    "double  space here now",         // empty middle token
    "héllo wörld ünïcode tokens")

  test("native kernel matches declarative form on all edge cases incl. NULL") {
    import spark.implicits._
    val df = (cases.zipWithIndex.map(_.swap) :+
      ((cases.length, null.asInstanceOf[String]))).toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val declarative = df.select(col("id"),
        Dedup.shingleArray(col("text"), n).as("sa"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      val native = df.select(col("id"),
        Dedup.nativeShingles(df, col("text"), n).as("sa"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      assert(native == declarative, s"mismatch at n=$n")
    }
  }

  test("positional mode matches the plain transform(sequence(...)) form") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val df = (cases.zipWithIndex.map(_.swap) :+
      ((cases.length, null.asInstanceOf[String]))).toDF("id", "text")
    for (n <- Seq(1, 3, 8)) {
      val w = split(col("text"), " ")
      val declarative = df.select(col("id"),
        when(size(w) >= n,
          transform(sequence(lit(1), size(w) - (n - 1)),
            i => concat_ws(" ", slice(w, i, lit(n)))))
          .otherwise(array().cast("array<string>")).as("sa"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      val native = df.select(col("id"),
        call_function("graft_shingles", col("text"), lit(n), lit(false)).as("sa"))
        .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
      assert(native == declarative, s"mismatch at n=$n")
    }
  }

  test("interpreted eval matches codegen output") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    val e = ShingleArray(Literal(UTF8String.fromString("a b c d"),
      org.apache.spark.sql.types.StringType), 2)
    val interpreted = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](org.apache.spark.sql.types.StringType)
      .map(_.toString).toSeq
    assert(interpreted == Seq("a b", "b c", "c d"))
  }

  test("sql surface: graft_shingles registered by extensions") {
    graft.plans.GraftExtensions.register(spark)
    val out = spark.sql(
      "SELECT graft_shingles('x y z w', 3) AS s").head().getSeq[String](0)
    assert(out == Seq("x y z", "y z w"))
  }
}
