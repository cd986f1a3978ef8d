package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Heavy-tail scaling-exponent sweep — the r14 verdict's item 6: the
  * one-SF bench cannot show how d28/d29/m16/d37 GROW, so this rig
  * measures each against synthetic corpora at 1×/3×/10× the sf0.1
  * document count and fits the cost-vs-rows exponent
  * e = ln(t2/t1) / ln(n2/n1) between consecutive scales.
  *
  * Synthetic construction (replica r of the sf0.1 documents table):
  * doc_id offset by r·10⁷ (stays far under d37's 2⁴⁰ packing bound)
  * and every word prefixed `r<r>_` for r ≥ 1, so replicas share NO
  * tokens/shingles/blocks: cross-replica similarity is zero BY
  * CONSTRUCTION and the near-dup DENSITY stays constant as rows grow —
  * a 10× corpus of the same character, not a pathological one where
  * every doc suddenly has 10 exact copies. What the sweep therefore
  * measures is the candidate-generation + join machinery's growth with
  * corpus size at constant duplicate density — the design claim
  * (banded LSH, prefix filter + doc-freq cap, bucketed ranks) is that
  * this is ~linear, and the fitted exponent is the evidence.
  *
  * The sweep dirs also carry a scaled LINEITEM (for q63's triangle
  * plan): replica r shifts both l_orderkey and l_partkey by r·10⁸,
  * producing k DISJOINT copies of the co-purchase graph — degree
  * distribution, wedge density and triangle density all preserved
  * per copy, edge count k×. Read the fitted exponent accordingly: a
  * disjoint-replica graph scales the wedge work ~linearly BY
  * CONSTRUCTION (the E^1.5 worst case is a single densifying graph,
  * which replication deliberately does not model — a real 100×
  * retail corpus adds mostly-new orders/parts, not 100× the degree
  * on the same parts), so the design claim under test is "cost
  * tracks edge volume when density holds", exponent ≈ 1.
  *
  * Bench-child discipline: one session at 32 cores, warm-up read,
  * blocking unpersist + GC between measurements, best-of-REPS per
  * cell. Run while nothing else is on the host (BASELINE.md rule 5).
  *
  * Env: SPARK_GRAFT_QUERIES (default the four heavy-tail queries),
  * SPARK_GRAFT_SCALES (default "1,3,10"), SPARK_GRAFT_REPS (default
  * 2), SPARK_GRAFT_SF_DIR (base fixture, default sf0.1). Prints one
  * JSON line per (query, scale) and a final fitted-exponent line per
  * query.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries = sys.env.getOrElse("SPARK_GRAFT_QUERIES",
      "d28_prefix_join,d29_containment_join,m16_phash_clusters,d37_block_dedup")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val scales = sys.env.getOrElse("SPARK_GRAFT_SCALES", "1,3,10")
      .split(",").map(_.trim.toInt).toSeq.sorted
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    val spark = GraftSessions.builder(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Built INSIDE the try: if a later scale's write throws (disk
    // pressure is the likely failure at 100×), the scales already on
    // disk — the very multi-× /tmp footprint the finally sweeps — must
    // still be swept (r16 ADVICE: building before the try leaked them
    // on exactly that path).
    val dirs = scala.collection.mutable.LinkedHashMap.empty[Int, String]
    try {
      // The dir is registered BEFORE the parquet write inside
      // buildSynthetic (r17 ADVICE: registering on return leaked a
      // partially-written multi-GB dir when the write itself failed
      // at the 100× scale — the one failure the registry exists for).
      scales.foreach(s => buildSynthetic(spark, base, s, p => dirs(s) = p))
      runSweep(spark, queries, scales, reps, dirs.toMap)
    } finally {
      // SPARK_GRAFT_KEEP_SWEEP_DIRS=1 keeps the synthetic dirs (and
      // prints them) for follow-up profiling of a single cell —
      // event-log captures, plan dumps at scale. The caller owns
      // cleanup then.
      if (sys.env.get("SPARK_GRAFT_KEEP_SWEEP_DIRS").contains("1"))
        dirs.foreach { case (s, p) => println(s"""{"kept_dir":"$p","scale":$s}""") }
      else dirs.values.foreach(deleteRecursively)
      spark.stop()
    }
  }

  private def runSweep(spark: org.apache.spark.sql.SparkSession,
      queries: Seq[String], scales: Seq[Int], reps: Int,
      dirs: Map[Int, String]): Unit = {
    val rows = scales.map(s =>
      s -> spark.read.parquet(s"${dirs(s)}/documents.parquet").count()).toMap

    val results = scala.collection.mutable.LinkedHashMap
      .empty[(String, Int), Double]
    for (q <- queries; s <- scales) {
      val fn = SparkEntry.queries(q)
      val best = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dirs(s)).count()
        val dt = (System.nanoTime() - t0) / 1e9
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        System.gc()
        dt
      }.min
      results((q, s)) = best
      println(f"""{"query":"$q","scale":$s,"rows":${rows(s)},"best_sec":$best%.2f}""")
    }
    queries.foreach { q =>
      val fits = scales.sliding(2).collect { case Seq(a, b) =>
        val e = math.log(results((q, b)) / results((q, a))) /
          math.log(rows(b).toDouble / rows(a).toDouble)
        f""""${a}x_to_${b}x":$e%.2f"""
      }.mkString(",")
      println(s"""{"query":"$q","fitted_exponents":{$fits}}""")
    }
  }

  private def deleteRecursively(dir: String): Unit =
    try {
      import java.nio.file.{Files, Paths, Path}
      import java.util.Comparator
      val root = Paths.get(dir)
      if (Files.exists(root))
        Files.walk(root).sorted(Comparator.reverseOrder[Path]())
          .forEach(p => { Files.deleteIfExists(p); () })
    } catch { case e: Throwable =>
      System.err.println(s"[sweep] cleanup of $dir failed: ${e.getMessage}")
    }

  /** Replicate the base documents table `k`× with disjoint token
    * namespaces per replica (see object doc); returns a fixture-shaped
    * dir containing only documents.parquet. */
  /** `register` receives the temp dir path BEFORE the write starts,
    * so the caller's cleanup registry covers a partially-written dir
    * if the write throws (r17 ADVICE). */
  private def buildSynthetic(spark: SparkSession, base: String,
      k: Int, register: String => Unit): Unit = {
    val out = java.nio.file.Files
      .createTempDirectory(s"graft_sweep_${k}x").toString
    register(out)
    val d = spark.read.parquet(s"$base/documents.parquet")
    val reps = (0 until k).map { r =>
      if (r == 0) d
      else d.select(
        (col("doc_id") + lit(r.toLong * 10000000L)).as("doc_id"),
        array_join(transform(split(col("text"), " "),
          w => concat(lit(s"r${r}_"), w)), " ").as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    reps.reduce(_ unionByName _).repartition(math.max(2, 2 * k))
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    // q63's graph fixture: k disjoint copies of the co-purchase
    // bipartite table (see the object doc for why disjoint and what
    // the exponent then means).
    val li = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val liReps = (0 until k).map { r =>
      if (r == 0) li
      else li.select(
        (col("l_orderkey") + lit(r.toLong * 100000000L)).as("l_orderkey"),
        (col("l_partkey") + lit(r.toLong * 100000000L)).as("l_partkey"))
    }
    liReps.reduce(_ unionByName _).repartition(math.max(2, 2 * k))
      .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
    // events (q103 PSI, q55 spatial, the st staging sources): replica
    // r offsets event_id and user_id by r·10⁹ — ts/type/value/props
    // are kept, so the per-type value distribution (q103's subject)
    // and the event-time axis are preserved while row volume grows k×.
    // For q55, note what that means: its md5-derived coordinates live
    // in a FIXED 100k×100k space, so k× points is k× density — the
    // close-pair OUTPUT grows ~k² by the query's own geometry (the
    // single-densifying case the documents/lineitem replicas
    // deliberately avoid); read its exponent against pair volume, not
    // rows.
    val ev = spark.read.parquet(s"$base/events.parquet")
    val evReps = (0 until k).map { r =>
      if (r == 0) ev
      else ev.select(
        (col("event_id") + lit(r.toLong * 1000000000L)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(r.toLong * 1000000000L)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }
    evReps.reduce(_ unionByName _).repartition(math.max(2, 2 * k))
      .write.mode("overwrite").parquet(s"$out/events.parquet")
    // orders + customer (c39's versioned-lake build): replica r
    // offsets the keys by r·10⁹, preserving the %3/%10 transaction
    // cohorts c39 derives from them (10⁹ ≡ 0 mod 10; 10⁹ ≡ 1 mod 3
    // shifts WHICH cohort a replica row lands in, never the cohort
    // SIZES, so merge/erase volume scales k× as intended).
    val ord = spark.read.parquet(s"$base/orders.parquet")
    val ordReps = (0 until k).map { r =>
      if (r == 0) ord
      else ord.withColumn("o_orderkey",
          col("o_orderkey") + lit(r.toLong * 1000000000L))
        .withColumn("o_custkey",
          col("o_custkey") + lit(r.toLong * 1000000000L))
    }
    ordReps.reduce(_ unionByName _).repartition(math.max(2, 2 * k))
      .write.mode("overwrite").parquet(s"$out/orders.parquet")
    val cust = spark.read.parquet(s"$base/customer.parquet")
    val custReps = (0 until k).map { r =>
      if (r == 0) cust
      else cust.withColumn("c_custkey",
        col("c_custkey") + lit(r.toLong * 1000000000L))
    }
    custReps.reduce(_ unionByName _).repartition(math.max(2, 2 * k))
      .write.mode("overwrite").parquet(s"$out/customer.parquet")
  }
}
