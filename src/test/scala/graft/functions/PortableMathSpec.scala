package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class PortableMathSpec extends AnyFunSuite with SparkFixture {

  test("portable ln tracks Math.log to ~1e-11 across the idf domain") {
    import spark.implicits._
    // idf-odds-shaped arguments across 12 decades, incl. x<1 (negative
    // ln) and exact powers of two (ladder boundary cases)
    val xs = ((1 to 2000).map(i => (100000.0 - i + 0.5) / (i + 0.5)) ++
      (1 to 2000).map(i => (i + 0.5) / (100000.0 - i + 0.5)) ++
      Seq(1.0, 2.0, 0.5, 1024.0, 9.5367431640625e-7, 1.0995116277760e12,
        1.5, 0.75, 3.5 / 1.5)).distinct
    val got = PortableMath.withLn(xs.toDF("x"), col("x"), "lnx")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    val maxErr = got.map { case (x, l) => math.abs(l - math.log(x)) }.max
    // measured 2026-08-13: 3.64e-12 over this sweep; bound with slack
    assert(maxErr < 5e-11, s"max |portableLn - Math.log| = $maxErr")
  }

  test("ladder boundaries: exact powers of two reduce exactly") {
    import spark.implicits._
    val xs = (-20 to 40).map(e => math.pow(2.0, e))
    val got = PortableMath.withLn(xs.toDF("x"), col("x"), "lnx")
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toMap
    // at x = 2^e, m = 1, z = 0, so ln = e * Ln2 exactly — bit-equal
    (-20 to 40).foreach { e =>
      assert(got(math.pow(2.0, e)) == e.toDouble * 0.6931471805599453,
        s"2^$e")
    }
  }
}
