package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Randomized parity for q63's degree-ordered triangle counting and
  * q64's closed-form CUSUM — each checked against an independent
  * brute-force reference sharing no code with the implementation. */
class GraphStatsSpec extends AnyFunSuite with SparkFixture {

  /** The production orientation+wedge pipeline, extracted over an
    * arbitrary edge list for the spec (the q63 query builds edges from
    * lineitem then applies exactly this shape). */
  private def sparkTriangles(edges: Seq[(Long, Long)]): Long = {
    import spark.implicits._
    val e = edges.toDF("a", "b").distinct()
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.withColumnRenamed("node", "a")
        .withColumnRenamed("deg", "da"), Seq("a"))
      .join(deg.withColumnRenamed("node", "b")
        .withColumnRenamed("deg", "db"), Seq("b"))
    val directed = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("src"), col("b").as("dst"),
          col("da").as("dsrc"), col("db").as("ddst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"),
          col("db").as("dsrc"), col("da").as("ddst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"),
        col("e.dsrc").as("dsrc"), col("e.ddst").as("ddst"))
    val wedges = directed.as("p").join(directed.as("q"),
        col("p.src") === col("q.src") &&
          struct(col("p.ddst"), col("p.dst")) <
            struct(col("q.ddst"), col("q.dst")))
      .select(col("p.dst").as("v"), col("q.dst").as("w"))
    wedges.join(directed,
      col("v") === col("src") && col("w") === col("dst"), "left_semi")
      .count()
  }

  test("degree-ordered triangle count == brute triple-loop on random graphs") {
    for (seed <- Seq(2, 19, 77)) {
      val rnd = new scala.util.Random(seed)
      val n = 30
      val edges = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextInt(100) < 20
      } yield (a, b)).toSeq
      val es = edges.toSet
      val brute = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if es((a, b)); c <- (b + 1) until n.toLong
        if es((b, c)) && es((a, c))
      } yield 1).size.toLong
      assert(sparkTriangles(edges) == brute, s"seed=$seed")
    }
  }

  test("closed-form cusum == sequential recurrence on random series") {
    // s_i = max(0, s_{i-1} + d_i)  vs  cum_i - min(0, min_{j<=i} cum_j)
    for (seed <- Seq(4, 31)) {
      val rnd = new scala.util.Random(seed)
      val d = Seq.fill(300)(rnd.nextInt(201).toLong - 100L)
      var s = 0L
      val seq = d.map { x => s = math.max(0L, s + x); s }
      var cum = 0L; var mn = 0L
      val closed = d.map { x =>
        cum += x; mn = math.min(mn, cum); cum - math.min(0L, mn)
      }
      assert(seq == closed, s"seed=$seed")
    }
  }
}
