package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-lake layout operators: hive-style partitioned parquet
  * artifacts and the targeted-rewrite maintenance they enable.
  *
  * The 100 TB shape this encodes: a lake is laid out so that the hot
  * maintenance operations (date-range serving reads, per-key erasure)
  * touch only the partitions they name — a date-range query prunes at
  * the DIRECTORY level before any file is opened, and a
  * right-to-be-forgotten pass rewrites only the shards that contain the
  * erased keys (Spark's dynamic partition overwrite), leaving every
  * other partition's files physically untouched. The reference's
  * analogue is goka's partition-table layout — state is owned
  * per-partition so maintenance is per-partition
  * (/root/reference/partition_table.go:91-117); here the same idea is
  * applied to the storage layout of a batch lake.
  */
object Lake {

  /** Result of a targeted key-erasure pass over one artifact. */
  final case class EraseAudit(rowsBefore: Long, rowsAfter: Long,
      shardsRewritten: Long, residual: Long)

  /** Write `df` as a parquet artifact hash-sharded on `key` into
    * `nShards` hive partitions (`shard=K/` directories). The shard
    * column is derived, not data: it exists so maintenance can address
    * a bounded partition set per key. */
  def writeSharded(df: DataFrame, key: Column, path: String,
      nShards: Int): Unit =
    df.withColumn("shard", pmod(key, lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Write `df` CLUSTERED on `key`: range-repartitioned into `nFiles`
    * splits and sorted within each, so every output file covers a
    * disjoint key range and its parquet row-group min/max statistics
    * become surgical — a point or range predicate on `key` skips every
    * non-matching file/row-group at the reader (ZORDER-lite on one
    * dimension). The layout property (disjoint per-file ranges) is
    * spec-verified; at 100 TB this is the difference between a point
    * lookup touching one file and touching all of them. */
  def writeClustered(df: DataFrame, key: Column, path: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Erase all rows whose `keyName` appears in `erase` from the
    * sharded artifact at `path`, rewriting ONLY the shards that
    * contain an erased key: the erase list (human-sized — an RTBF
    * request batch) is broadcast, the affected shard list is a
    * partition-count-bounded collect, and the rewrite runs under
    * dynamic partition overwrite so untouched shards keep their
    * original files bit-for-bit. Returns the audit a compliance gate
    * records: rows before/after, shards rewritten, and the residual
    * count of erased keys still present (must be 0).
    *
    * Caveat (documented, not hit by callers here): dynamic overwrite
    * replaces only partitions PRESENT in the written frame, so a shard
    * whose every row is erased would write nothing and keep its old
    * files — callers erasing whole shards must drop those directories
    * explicitly. */
  def eraseKeys(spark: SparkSession, path: String, keyName: String,
      erase: DataFrame, nShards: Int): EraseAudit = {
    val before = spark.read.parquet(path).count()
    val affected = erase
      .select(pmod(col(keyName), lit(nShards.toLong)).as("shard"))
      .distinct().collect().map(_.getLong(0)).sorted
    val prev = spark.conf.get(
      "spark.sql.sources.partitionOverwriteMode", "static")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.read.parquet(path)
        .filter(col("shard").isin(affected.toSeq: _*))
        .join(broadcast(erase.select(col(keyName)).distinct()),
          Seq(keyName), "left_anti")
        // break lineage from the path being overwritten — the rewrite
        // reads and replaces the same directory
        .localCheckpoint()
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val after = spark.read.parquet(path)
    val residual = after
      .join(broadcast(erase.select(col(keyName)).distinct()), Seq(keyName))
      .count()
    EraseAudit(before, after.count(), affected.length.toLong, residual)
  }
}
