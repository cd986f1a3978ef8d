package graft

import org.apache.spark.sql.functions._

/** q55 hot-cell stress probe (r18 verdict item 4 / "What's wrong" #2):
  * the grid join pins its build side with `shuffle_hash`, and the
  * in-code boundedness claim is that cell occupancy is capped by the
  * grid design (md5-uniform coordinates). This rig measures what
  * happens when that assumption is deliberately violated: `n` uniform
  * points plus `hot` extra points packed into ONE cell — a single key
  * carrying `hot`× the median occupancy — through the production
  * [[graft.queries.Relational.closePairStats]] kernel, next to the
  * uniform control. Evidence sought: the hot run completes without
  * OOM (the per-partition hash build holds one cell's points, which
  * RESIDES in one partition no matter the join strategy — sort-merge
  * would hold the same rows in its sort buffer), and the wall ratio
  * tracks the pair volume the hot cell adds (≈ hot²/2 extra candidate
  * pairs), not a memory collapse.
  *
  * Env: Q55_N (uniform points, default 1,000,000), Q55_HOT (hot-cell
  * points, default 20,000 → 2×10⁸ extra candidate pairs), reps 2.
  * Prints one JSON line per variant. */
object Q55HotCell {
  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("Q55_N", "1000000").toLong
    val hot = sys.env.getOrElse("Q55_HOT", "20000").toLong
    val spark = GraftSessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Deterministic md5-uniform points in the production coordinate
    // space (cells 1000x1000 over [0, 100000)²) — same derivation
    // family as the query's spatialPoints.
    def uniform(count: Long, idOffset: Long) = spark.range(count)
      .select((col("id") + lit(idOffset)).as("id"))
      .select(col("id"),
        (graft.functions.Hashes.h32(col("id").cast("string"))
          % 100000L).as("x"),
        (conv(substring(md5(col("id").cast("string")), 9, 8), 16, 10)
          .cast("long") % 100000L).as("y"))
    // Hot cell: `hot` points all inside cell (50, 50), spread over its
    // 1000x1000 interior so the distance filter still does real work.
    def hotCell(count: Long, idOffset: Long) = spark.range(count)
      .select((col("id") + lit(idOffset)).as("id"))
      .select(col("id"),
        (lit(50000L) + graft.functions.Hashes.h32(
          col("id").cast("string")) % 1000L).as("x"),
        (lit(50000L) + conv(substring(md5(col("id").cast("string")), 9, 8),
          16, 10).cast("long") % 1000L).as("y"))

    def run(tag: String, pts: org.apache.spark.sql.DataFrame): Unit = {
      val best = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val row = graft.queries.Relational
          .closePairStats(pts, cellSide = 1000L, r2 = 1000000L).head()
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[q55hot] $tag pairs=${row.getLong(0)}")
        dt
      }.min
      println(f"""{"variant":"$tag","n":$n,"hot":$hot,"best_sec":$best%.2f}""")
    }
    run("uniform", uniform(n, 0L))
    run("hot_cell", uniform(n, 0L).unionByName(hotCell(hot, 10000000L)))
    spark.stop()
  }
}
