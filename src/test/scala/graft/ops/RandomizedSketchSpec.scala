package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Seeded randomized sweeps for the sketch/CEP operators, beyond what
  * the fixtures witness: each property is checked against a
  * brute-force single-threaded reference on inputs the operator's
  * author did not pick. */
class RandomizedSketchSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new scala.util.Random(20260814L)

  test("kmv set algebra: random segments, exact regime — every estimate " +
      "equals the brute-force set arithmetic") {
    import spark.implicits._
    for (_ <- 1 to 3) {
      val segs = Seq("A", "B", "C").map { s =>
        s -> (0 until 60 + rnd.nextInt(120))
          .map(_ => rnd.nextInt(250).toLong).toSet
      }.toMap
      val df = segs.toSeq
        .flatMap { case (s, es) => es.map(e => (s, e)) }
        .toDF("seg", "uid")
      val out = Profiling.kmvSetOps(df, col("seg"), col("uid"), k = 4096)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
      for (Seq(a, b) <- Seq("A", "B", "C").combinations(2)) {
        val (sa, sb) = (segs(a), segs(b))
        val r = out((a, b))
        assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
        assert(r.getLong(4) == (sa & sb).size)
        assert(r.getDouble(11) == (sa & sb).size.toDouble, "est_inter")
        assert(r.getDouble(12) == (sa | sb).size.toDouble, "est_union")
        assert(r.getDouble(13) == (sa -- sb).size.toDouble, "est_diff")
      }
    }
  }

  test("misra-gries: random stream with m >= ndv reproduces every exact " +
      "count; the top-k ranking matches brute force") {
    import spark.implicits._
    val keys = (1 to 2000).map(_ => s"k${rnd.nextInt(80)}")
    val exact = keys.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val top = Profiling.heavyHittersTopK(
      Profiling.heavyHittersPartial(
        keys.toDF("k2").repartition(5), col("k2"), m = 256), k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(top.forall(_._3))
    assert(top.forall(x => exact(x._1) == x._2))
    val bruteTop = exact.toSeq.sortBy { case (k, c) => (-c, k) }
      .take(10).toSet
    assert(top.map(x => (x._1, x._2)).toSet == bruteTop.map(identity))
  }

  test("cep: random event sequences — the distributed integer machine " +
      "equals a plain Scala greedy fold") {
    import spark.implicits._
    val types = Seq("view", "click", "purchase", "signup", "error")
    val rows = (1L to 40L).flatMap { u =>
      (0 until 5 + rnd.nextInt(40)).map { i =>
        (u, u * 1000 + i, new Timestamp(1700000000000L + i * 1000),
          types(rnd.nextInt(types.length)))
      }
    }
    def brute(evs: Seq[String]): Long = {
      var stage = 0; var n = 0L
      evs.foreach {
        case "view" if stage == 0     => stage = 1
        case "click" if stage == 1    => stage = 2
        case "purchase" if stage == 2 => stage = 0; n += 1
        case _                        =>
      }
      n
    }
    val expected = rows.groupBy(_._1).view
      .mapValues(g => brute(g.sortBy(x => (x._3.getTime, x._2)).map(_._4)))
      .toMap
    val got = graft.queries.Relational.cepMatchOver(
        rows.toDF("user_id", "event_id", "ts", "event_type"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("kmv profile: random slicing never changes the merged profile") {
    import spark.implicits._
    val d = (1 to 300)
      .map(i => (rnd.nextInt(150).toLong, s"t${rnd.nextInt(12)}"))
      .toDF("id", "tag")
    def partial(f: org.apache.spark.sql.Column) =
      Profiling.kmvProfilePartial(d.filter(f), Seq("id"), Seq("tag"), 32)
    val whole = Profiling.kmvProfileMerge(partial(lit(true)), 32)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    val cut = 30 + rnd.nextInt(90)
    val sliced = Profiling.kmvProfileMerge(
      partial(col("id") < cut).unionByName(partial(col("id") >= cut)), 32)
      .collect().map(r => r.getString(0) -> r.toSeq.drop(1)).toMap
    assert(whole == sliced)
  }
}
