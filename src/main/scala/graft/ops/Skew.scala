package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation joins — the discipline that keeps a shuffled
  * equi-join alive when one key owns a disproportionate share of the
  * rows (the power-law reality of user/document/session keys at
  * 100 TB: an un-salted shuffle sends every row of the hot key to ONE
  * reducer task, and that task IS the job's wall clock).
  *
  * [[saltedJoin]] implements the classic fix: the skewed side's rows
  * scatter across `salts` sub-keys by a deterministic per-row hash,
  * the (replicable, much smaller) build side replicates once per
  * salt, and the join key becomes (key, salt) — the hot key's rows
  * now land on `salts` reducers instead of one, at the bounded cost
  * of `salts`× the build side's shuffle volume. Result rows are
  * provably those of the plain join (each skewed row meets each
  * matching build row in exactly one salt bucket); the q98 oracle
  * runs the UNSALTED join, so the hash match proves it.
  *
  * AQE's skew-join handles the SORT-MERGE case adaptively at runtime;
  * this explicit form is the planned-shape variant that also covers
  * hash joins, works under fixed partitioning, and documents the
  * intent in the plan (the exchange hashes on (key, salt) —
  * spec-pinned).
  *
  * Reference basis: goka partitions strictly by message key
  * (`partition.go`) and inherits whatever skew the keys carry; this
  * is the Spark-side answer the reference cannot express. */
object Skew {

  /** Join `skewed` (big, hot-keyed) with `build` (smaller, one or few
    * rows per key) on `skewed(key) === build(key)`, scattering the
    * skewed side over `salts` sub-keys. `rowId` must be a
    * deterministic per-row expression on the skewed side (a primary
    * key — determinism keeps the result reproducible run to run).
    * Build-side columns come through as-is; `joinType` supports
    * "inner" and "left" (the build side is the lookup side). */
  def saltedJoin(skewed: DataFrame, build: DataFrame, key: String,
      rowId: Column, salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    require(joinType == "inner" || joinType == "left",
      s"unsupported joinType $joinType (build side is the lookup side)")
    val s = skewed.withColumn("__salt",
      pmod(xxhash64(rowId), lit(salts.toLong)))
    val b = build.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    s.join(b, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
