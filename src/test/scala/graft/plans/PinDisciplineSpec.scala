package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Pin-discipline regression guard — makes the round-13
  * repeated-execution finding un-regressable.
  *
  * The finding (BASELINE.md round 13): multi-pass plans re-ran their
  * build pipelines once per consumer — q63's edge list 5×, d28/d29's
  * rank-attached occurrence tables once per verify/prefix/size
  * consumer — because Spark has no common-subexpression elimination
  * across DataFrame references: every consumer of an unpinned
  * intermediate embeds the intermediate's WHOLE build subtree in its
  * own plan. The fix pins the bounded intermediates with
  * `localCheckpoint()` (what any real graph/SSJoin implementation
  * materializes), bounding each build pipeline to ONE execution.
  *
  * This spec asserts the pin's plan-shape signature directly, so
  * removing any pin goes red without bench archaeology: with the pins
  * in place, every consumer reads a checkpointed RDD, so the FINAL
  * optimized logical plan contains ZERO scans of the source parquet
  * (the build ran once, eagerly, at pin time — the source scan lives
  * only in that already-executed job) and at least one `LogicalRDD`
  * leaf (the pin itself). Remove a pin and the build subtree — source
  * scan included — reappears once PER CONSUMER in the final plan
  * (q63: 10 lineitem scans; d28: 7+ documents scans), which this spec
  * rejects. Counting the optimized LOGICAL plan keeps the check
  * deterministic and AQE-immune. */
class PinDisciplineSpec extends AnyFunSuite with SparkFixture {

  private val sfDir = "/root/testdata/sf0.001"

  /** Number of parquet-scan leaves over `table` in df's final
    * optimized plan. */
  private def scansOf(df: DataFrame, table: String): Int =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case f: HadoopFsRelation if f.location.rootPaths
            .exists(_.toString.contains(s"/$table.parquet")) => 1
        case _ => 0
      }
    }.sum

  private def rddLeaves(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case _: LogicalRDD => 1
    }.sum

  private def checkPinned(query: String, sourceTable: String): Unit = {
    val df = graft.SparkEntry.queries(query)(spark, sfDir)
    val scans = scansOf(df, sourceTable)
    val rdds = rddLeaves(df)
    assert(scans == 0,
      s"$query: final plan scans $sourceTable.parquet $scans time(s) — " +
        "a localCheckpoint pin was removed, so a build pipeline now " +
        "re-executes once per consumer (the round-13 q63/d28/d29 " +
        "regression)")
    assert(rdds >= 1,
      s"$query: final plan has no LogicalRDD leaf — expected the " +
        "pinned (localCheckpoint) intermediates to feed every consumer")
    assert(df.count() > 0, s"$query returned no rows at sf0.001")
  }

  test("q63 triangles: the edge list is pinned — the final plan " +
      "re-scans lineitem zero times (unpinned: 10 scans, one per " +
      "consumer per self-join side)") {
    checkPinned("q63_triangles", "lineitem")
  }

  test("d28 prefix join: the rank-attached occurrence table and doc " +
      "sizes are pinned — the final plan re-scans documents zero times") {
    checkPinned("d28_prefix_join", "documents")
  }

  test("d29 containment join: same pin discipline as d28") {
    checkPinned("d29_containment_join", "documents")
  }

  test("q103 PSI: the collapsed two-window frame is pinned — the " +
      "final plan re-scans events zero times (unpinned: the raw scan " +
      "re-executes for the edge pass, the bin pass and both ladder " +
      "consumers)") {
    checkPinned("q103_psi", "events")
  }

  test("q108 PageRank: the edge list is pinned — the final plan " +
      "re-scans events zero times (unpinned: the distinct-edge build " +
      "re-executes for deg, the seed and all three iterations)") {
    checkPinned("q108_pagerank", "events")
  }

  test("d37 block dedup: the block-cutting pipeline is pinned — the " +
      "final plan re-scans documents zero times (unpinned: the " +
      "explode + ordered fold re-executes for the keeper argmin and " +
      "the rewrite)") {
    checkPinned("d37_block_dedup", "documents")
  }
}
