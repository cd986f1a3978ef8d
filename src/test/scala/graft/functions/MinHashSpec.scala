package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.ops.Dedup

/** Parity: the native map-only MinHash kernel must produce EXACTLY the
  * shingle-explode + k-conditional-min aggregation it replaces — the
  * d02/d07/d11 DuckDB oracles mirror that declarative arithmetic. */
class MinHashSpec extends AnyFunSuite with SparkFixture {

  private val cases = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b c a b c a b c",              // repeated shingles collapse
    "exactly three words",            // exactly one shingle
    "double  space here now inside",  // empty tokens inside shingles
    "héllo wörld ünïcode shingle tokens") // multi-byte UTF-8 md5 input

  test("native kernel matches declarative aggregation, k=16 n=3") {
    import spark.implicits._
    val df = cases.zipWithIndex.map(_.swap).toDF("id", "text")
    val declarative = Dedup.minhashSignatures(
        Dedup.shingles(df, col("text"), col("id"), 3), 16)
      .collect()
      .map(r => r.getInt(0) -> (0 until 16).map(j => r.getLong(j + 1)).toSeq)
      .toMap
    val native = Dedup.minhashSignaturesNative(df, col("text"), col("id"),
        3, 16)
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq)
      .toMap
    assert(native == declarative)
  }

  test("short and null docs yield no signature row, like the aggregation") {
    import spark.implicits._
    val df = Seq((1, "a b"), (2, null.asInstanceOf[String]), (3, ""),
      (4, "one two three")).toDF("id", "text")
    val ids = Dedup.minhashSignaturesNative(df, col("text"), col("id"), 3, 16)
      .collect().map(_.getInt(0)).toSeq
    assert(ids == Seq(4))
  }

  test("interpreted eval matches codegen; single shingle = perm of h32") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.unsafe.types.UTF8String
    import spark.implicits._
    val doc = "exactly three words"
    val interpreted = MinHashSig(Literal(UTF8String.fromString(doc),
        org.apache.spark.sql.types.StringType), 3, 16).eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toLongArray().toSeq
    // one shingle → mh_j is just perm_j(h32(shingle)), via the column fns
    val h = Seq(doc).toDF("s").select(Hashes.h32(col("s"))).head().getLong(0)
    val expect = (0 until 16).map(j => ((2L * j + 1) * h + j * 12345L) % 4294967311L)
    assert(interpreted == expect)
    graft.plans.GraftExtensions.register(spark)
    val codegen = spark.sql(s"SELECT graft_minhash('$doc', 3, 16)")
      .head().getSeq[Long](0).toSeq
    assert(codegen == expect)
  }
}
