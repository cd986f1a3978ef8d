package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

class SaltedJoinSpec extends AnyFunSuite with SparkFixture {

  test("salted join is row-identical to the plain join under skew") {
    import spark.implicits._
    // 10k rows, 90% on one hot key — the classic straggler shape
    val big = (1 to 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 7 else 42L, s"p$i"))
      .toDF("k", "payload")
    val small = Seq((42L, "hot"), (0L, "a"), (1L, "b"), (99L, "absent"))
      .toDF("sk", "name")
    val plain = big.join(small, col("k") === col("sk")).drop("sk")
      .collect().map(_.toString).sorted
    val salted = SaltedJoin.inner(big, small, col("k"), "sk", salts = 8)
      .collect().map(_.toString).sorted
    assert(salted.length == plain.length)
    assert(salted.toSeq == plain.toSeq)
  }

  test("salt spreads a hot key even when its rows are bit-identical") {
    import spark.implicits._
    // 1000 IDENTICAL rows on the hot key — a row-hash salt would send
    // them all to one salt and keep the straggler
    val big = (1 to 1000).map(_ => (42L, "same")).toDF("k", "payload")
    val salts = big.withColumn("_gsalt",
      pmod(monotonically_increasing_id(), lit(8L)))
      .select("_gsalt").distinct().count()
    assert(salts == 8, s"expected the hot key spread over all 8 salts, got $salts")
  }
}
