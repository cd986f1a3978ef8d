package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.Codecs._
import graft.sources.Sources
import graft.streaming.{MetricsListener, StreamExecutor}

/** Measures streaming throughput for the count-per-key processor — the
  * number BASELINE.md promises (msgs/s per core; the reference publishes
  * none). The whole events fixture is staged and consumed in ONE
  * micro-batch so the figure reflects steady-state keyed-state fold
  * throughput, not per-trigger fixed costs. Prints one JSON line. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
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
      // Same production knob as Bench: row accounting off in the hot path.
      .config("spark.sql.streaming.stateStore.rocksdb.trackTotalNumberOfRows", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val listener = new MetricsListener()
    spark.streams.addListener(listener)

    val graph = GroupGraph.define("bench-counter")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val cur = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(cur + 1L)
      }),
      Persist(Int64Codec))
    val staged = java.nio.file.Files
      .createTempDirectory("graft_stream_bench").toString
    Sources.eventMessages(spark, sfDir).write.mode("overwrite").parquet(staged)
    val stream = spark.readStream
      .schema(Sources.eventMessages(spark, sfDir).schema)
      .parquet(staged).as[Message]
    import graft.operators.BatchExecutor.SinkTable
    val out = new StreamExecutor(graph).run(spark, stream)
    val table = out.filter(_.sink == SinkTable)
      .map(e => (e.key, Int64Codec.decode(e.value))).toDF("key", "cnt")
    val q = table.writeStream.format("memory").queryName("stream_bench")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()

    // Listener events are delivered async; wait for the data batch's
    // progress to arrive before reading the stats.
    val deadline = System.currentTimeMillis() + 15000
    while (listener.snapshot.forall(_.numInputRows == 0) &&
        System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    val dataBatches = listener.snapshot.filter(_.numInputRows > 0)
    val rows = dataBatches.map(_.numInputRows).sum
    val ms = dataBatches.map(_.batchDurationMs).sum
    val msgsPerSec = if (ms > 0) rows * 1000.0 / ms else 0.0
    val perCore = msgsPerSec / cpus.toInt
    println(s"""{"metric":"stream_count_msgs_per_sec","value":$msgsPerSec,""" +
      s""""per_core":$perCore,"rows":$rows,"batch_ms":$ms,"cores":$cpus,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
