package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.{BeforeAndAfterAll, Suite}

/** Shared local SparkSession for specs. */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>
  lazy val spark: SparkSession = SparkFixture.session
}

object SparkFixture {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // transformWithState requires RocksDB; also the right store at scale
    // (off-heap state, incremental changelog checkpointing).
    .config("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    .config("spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    // Checkpoint-file checksums (new in Spark 4.1, default on) convoy
    // in one-JVM local mode: every state-store commit's zip close
    // awaits a checksum future, measured +2.2 s on st01 at sf0.1/32
    // partitions (thread dumps: 32 tasks parked in
    // ChecksumCancellableFSDataOutputStream.close). Checkpoints here
    // are ephemeral local-fs dirs; re-enable for durable object-store
    // checkpoints in cluster deployments, where the cost spreads
    // across executors.
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    .getOrCreate()
}
