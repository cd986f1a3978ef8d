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

  test("fixed-point log2 tracks log2 to within 2 grid steps, exact at 2^e") {
    import spark.implicits._
    val xs = ((1 to 1000).map(i => (100000.0 - i + 0.5) / (i + 0.5)) ++
      (-20 to 40).map(e => math.pow(2.0, e)) ++
      Seq(1.5, 3.0, 582.0 / 1.0, 30.040955631399317)).distinct
    val got = PortableMath.withLog2Fixed(xs.toDF("x"), col("x"), "fx")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
    got.foreach { case (x, fx) =>
      val want = math.log(x) / math.log(2.0) * 65536.0
      assert(math.abs(fx - want) <= 2.0,
        s"log2fx($x) = $fx, expected ~$want")
    }
    // exact powers of two: k·2^16 exactly, all fraction bits zero
    val byX = got.toMap
    (-20 to 40).foreach { e =>
      assert(byX(math.pow(2.0, e)) == e.toLong * 65536L, s"2^$e")
    }
  }

  test("log2FixedLong (driver constant mirror) is bit-equal to the " +
      "column ladder across the domain") {
    import spark.implicits._
    val xs = ((1 to 500).map(i => (100000.0 - i + 0.5) / (i + 0.5)) ++
      (-20 to 40).map(e => math.pow(2.0, e)) ++
      Seq(1.5, 3.0, 582.0, 1000000.0, 999999.0, 1.0e-6)).distinct
    val ladder = PortableMath.withLog2Fixed(xs.toDF("x"), col("x"), "fx")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toMap
    xs.foreach { x =>
      assert(PortableMath.log2FixedLong(x) == ladder(x),
        s"driver mirror diverges from ladder at $x")
    }
  }

  test("fixed-point log2 is monotone over a dense ratio sweep") {
    import spark.implicits._
    val xs = (1 to 4000).map(i => 1.0 + i / 700.0)
    val got = PortableMath.withLog2Fixed(xs.toDF("x"), col("x"), "fx")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy(_._1)
    got.sliding(2).foreach { case Array((x1, f1), (x2, f2)) =>
      assert(f1 <= f2, s"non-monotone: $x1->$f1 vs $x2->$f2")
    }
  }
}
