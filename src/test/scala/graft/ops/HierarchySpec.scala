package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pointer-jumping hierarchy flattening vs Spark 4.1's own recursive
  * CTE (UnionLoop) — the two strategies must agree on every forest.
  * Randomized: seeded random forests where node i's parent is drawn
  * uniformly from 0..i-1 (guarantees acyclicity, produces skewed
  * depths), plus the edge shapes (all roots, one chain). */
class HierarchySpec extends AnyFunSuite with SparkFixture {

  private def viaRecursiveCte(edges: Seq[(Long, Option[Long])]) = {
    import spark.implicits._
    edges.toDF("node", "parent").createOrReplaceTempView("h_edges")
    spark.sql(
      """WITH RECURSIVE walk(node, root, depth) AS (
           SELECT node, node, CAST(0 AS BIGINT) FROM h_edges
             WHERE parent IS NULL
           UNION ALL
           SELECT e.node, w.root, w.depth + 1
             FROM h_edges e JOIN walk w ON e.parent = w.node)
         SELECT node, root, depth FROM walk""")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private def viaDoubling(edges: Seq[(Long, Option[Long])]) = {
    import spark.implicits._
    Hierarchy.flattenForest(edges.toDF("node", "parent"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("random forests: doubling == Spark recursive CTE (3 seeds)") {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = (0L until n).map { i =>
        if (i < 3 || rnd.nextInt(10) == 0) (i, None) // extra roots
        else (i, Some(rnd.nextInt(i.toInt).toLong))
      }
      assert(viaDoubling(edges) == viaRecursiveCte(edges), s"seed=$seed")
    }
  }

  test("all-roots forest: every node is its own root at depth 0") {
    val edges = (0L until 10L).map(i => (i, None: Option[Long]))
    assert(viaDoubling(edges) == edges.map { case (i, _) => (i, i, 0L) }.toSet)
  }

  test("single chain of depth 64 resolves (7 doubling rounds, not 64)") {
    val edges = (0L until 65L).map(i =>
      (i, if (i == 0) None else Some(i - 1)))
    val got = viaDoubling(edges)
    assert(got == edges.map { case (i, _) => (i, 0L, i) }.toSet)
  }

  private def viaRecursiveCteWeighted(
      edges: Seq[(Long, Option[Long], Long)]) = {
    import spark.implicits._
    edges.toDF("node", "parent", "qty").createOrReplaceTempView("hw_edges")
    spark.sql(
      """WITH RECURSIVE walk(node, root, depth, pq) AS (
           SELECT node, node, CAST(0 AS BIGINT), CAST(1 AS BIGINT)
             FROM hw_edges WHERE parent IS NULL
           UNION ALL
           SELECT e.node, w.root, w.depth + 1, w.pq * e.qty
             FROM hw_edges e JOIN walk w ON e.parent = w.node)
         SELECT node, root, depth, pq FROM walk""")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
  }

  test("weighted random forests: qty-product doubling == recursive CTE") {
    import spark.implicits._
    for (seed <- Seq(3, 11, 99)) {
      val rnd = new scala.util.Random(seed)
      val n = 200
      val edges = (0L until n).map { i =>
        if (i < 3 || rnd.nextInt(10) == 0)
          (i, None: Option[Long], rnd.nextInt(3) + 1L)
        else (i, Some(rnd.nextInt(i.toInt).toLong), rnd.nextInt(3) + 1L)
      }
      val got = Hierarchy
        .flattenForestWeighted(edges.toDF("node", "parent", "qty"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got == viaRecursiveCteWeighted(edges), s"seed=$seed")
    }
  }

  test("weighted roots carry path_qty 1 regardless of their edge qty") {
    import spark.implicits._
    val edges = Seq((0L, None: Option[Long], 3L),
      (1L, Some(0L), 2L), (2L, Some(1L), 3L))
    val got = Hierarchy
      .flattenForestWeighted(edges.toDF("node", "parent", "qty"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == Set((0L, 0L, 0L, 1L), (1L, 0L, 1L, 2L), (2L, 0L, 2L, 6L)))
  }

  test("a cycle fails loudly instead of looping forever") {
    val edges = Seq((0L, Some(1L)), (1L, Some(0L)), (2L, None: Option[Long]))
    val e = intercept[IllegalStateException] {
      import spark.implicits._
      Hierarchy.flattenForest(edges.toDF("node", "parent"), maxRounds = 6)
    }
    assert(e.getMessage.contains("cycle"))
  }
}
