package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Hierarchy / transitive-closure flattening over a forest.
  *
  * Input: `(node, parent)` edges where `parent` is NULL for roots.
  * Output: `(node, root, depth)` — every node resolved to its tree
  * root with its distance.
  *
  * Two executable strategies exist for this in Spark 4.x:
  *
  *   1. `WITH RECURSIVE` (new in Spark 4): the declarative form,
  *      planned as a UnionLoop that joins the edge table once per
  *      LEVEL — O(depth) passes. Fine for shallow hierarchies; at
  *      100 TB a depth-1000 chain means a thousand shuffle rounds.
  *   2. POINTER JUMPING (this implementation): keep per-node
  *      `(ancestor, distance)` state and square the reach each round
  *      (`anc ← anc's anc`, `dist ← dist + dist(anc)`), so a depth-d
  *      forest resolves in ⌈log₂ d⌉ equi-join rounds — 10 shuffles
  *      for depth 1000. Roots are their own fixpoint (`anc = self,
  *      dist = 0`), so convergence needs no special casing: the
  *      total-distance sum is monotone and stabilizes exactly when
  *      every node has reached its root.
  *
  * HierarchySpec proves the two agree on seeded random forests; the
  * q46 oracle is DuckDB's own recursive CTE over the same edges.
  * Each round `localCheckpoint`s the state to truncate lineage (the
  * same discipline as the d07 connected-components loop — without it
  * the plan doubles every round).
  */
object Hierarchy {

  /** Flatten a forest of `(node, parent)` rows (parent NULL at roots)
    * to `(node, root, depth)` via pointer jumping. `maxRounds` bounds
    * runaway input (a CYCLE never converges — after `maxRounds`
    * doubling rounds, reach exceeds 2^maxRounds, and we fail loudly
    * rather than loop forever). */
  def flattenForest(edges: DataFrame, maxRounds: Int = 40): DataFrame = {
    var state = edges.select(
      col("node"),
      coalesce(col("parent"), col("node")).as("anc"),
      when(col("parent").isNull, 0L).otherwise(1L).as("dist"))
      .localCheckpoint()
    var total = sumDist(state)
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"hierarchy did not converge after $maxRounds doubling rounds " +
          "— the input contains a cycle or is deeper than 2^" + maxRounds)
      val a = state.as("a")
      val b = state.select(col("node").as("bnode"), col("anc").as("banc"),
        col("dist").as("bdist"))
      val next = a.join(b, col("a.anc") === col("bnode"))
        .select(col("a.node").as("node"), col("banc").as("anc"),
          (col("a.dist") + col("bdist")).as("dist"))
        .localCheckpoint()
      val nextTotal = sumDist(next)
      converged = nextTotal == total
      state = next
      total = nextTotal
    }
    state.select(col("node"), col("anc").as("root"), col("dist").as("depth"))
  }

  private def sumDist(state: DataFrame): Long =
    state.agg(sum(col("dist"))).first().getLong(0)

  /** Weighted flattening for BOM-style rollups: edges carry a per-edge
    * multiplier `qty` (units of `node` needed per unit of `parent`),
    * and the output adds `path_qty` = the PRODUCT of edge multipliers
    * along the node→root path — "total units of this component per
    * finished assembly". Same ⌈log₂ depth⌉ pointer-jumping rounds;
    * the doubling step composes multiplicatively (`qty ← qty ·
    * qty(anc)`) exactly as distance composes additively, because both
    * are path morphisms: combining the node→anc half with the
    * anc→anc' half. Roots are the fixpoint `(anc = self, dist = 0,
    * qty = 1)`. Products stay in Long: a depth-d path of ≤q-unit
    * edges is q^d, and d is logarithmic in the key domain here —
    * callers with hot deep chains should bound q^d or switch the
    * accumulator to log-space. */
  def flattenForestWeighted(edges: DataFrame, maxRounds: Int = 40)
      : DataFrame = {
    var state = edges.select(
      col("node"),
      coalesce(col("parent"), col("node")).as("anc"),
      when(col("parent").isNull, 0L).otherwise(1L).as("dist"),
      when(col("parent").isNull, 1L).otherwise(col("qty").cast("long"))
        .as("pq"))
      .localCheckpoint()
    var total = sumDist(state)
    var rounds = 0
    var converged = false
    while (!converged) {
      rounds += 1
      if (rounds > maxRounds)
        throw new IllegalStateException(
          s"hierarchy did not converge after $maxRounds doubling rounds " +
          "— the input contains a cycle or is deeper than 2^" + maxRounds)
      val a = state.as("a")
      val b = state.select(col("node").as("bnode"), col("anc").as("banc"),
        col("dist").as("bdist"), col("pq").as("bpq"))
      val next = a.join(b, col("a.anc") === col("bnode"))
        .select(col("a.node").as("node"), col("banc").as("anc"),
          (col("a.dist") + col("bdist")).as("dist"),
          (col("a.pq") * col("bpq")).as("pq"))
        .localCheckpoint()
      val nextTotal = sumDist(next)
      converged = nextTotal == total
      state = next
      total = nextTotal
    }
    state.select(col("node"), col("anc").as("root"),
      col("dist").as("depth"), col("pq").as("path_qty"))
  }
}
