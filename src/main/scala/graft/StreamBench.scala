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
  * throughput, not per-trigger fixed costs.
  *
  * Beyond the headline run, the main SWEEPS KEY CARDINALITY at 1×, 10×
  * and 100× the fixture's user count (synthetic subkeys salted from the
  * message offset — deterministic, uniform). The 1× figure measures a
  * warm tiny-state fold; the 100× figure is the one that predicts
  * 100 TB behavior, because the state store becomes large relative to
  * the micro-batch and every state row is a genuine RocksDB key. State
  * rows + memory bytes come from the query's own state-operator
  * metrics. One untimed warmup run absorbs the RocksDB native load +
  * transformWithState codegen that otherwise lands on the first timed
  * run. Prints one JSON line. */
object StreamBench {

  private final case class SweepRow(mult: Int, rows: Long, batchMs: Long,
      msgsPerSec: Double, stateRows: Long, stateBytes: Long)

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
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val graph = GroupGraph.define("bench-counter")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val cur = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(cur + 1L)
      }),
      Persist(Int64Codec))
    val staged = java.nio.file.Files
      .createTempDirectory("graft_stream_bench").toString
    Sources.eventMessages(spark, sfDir).write.mode("overwrite").parquet(staged)
    val schema = Sources.eventMessages(spark, sfDir).schema

    def run(mult: Int, name: String): SweepRow = {
      val listener = new MetricsListener()
      spark.streams.addListener(listener)
      try {
        val stream0 = spark.readStream.schema(schema)
          .parquet(staged).as[Message]
        // Salt the key from the offset (event id): deterministic,
        // uniform, and inside the Message BEFORE the executor keys the
        // stream — cardinality scales without changing the topology.
        val stream = if (mult == 1) stream0 else stream0.map(m =>
          m.copy(key = m.key + "_" +
            java.lang.Long.remainderUnsigned(m.offset, mult.toLong)))
        import graft.operators.BatchExecutor.SinkTable
        val out = new StreamExecutor(graph).run(spark, stream)
        val table = out.filter(_.sink == SinkTable)
          .map(e => (e.key, Int64Codec.decode(e.value))).toDF("key", "cnt")
        val q = table.writeStream.format("memory").queryName(name)
          .outputMode("update").start()
        try q.processAllAvailable() finally q.stop()
        // Listener events are delivered async; wait for the data
        // batch's progress to arrive before reading the stats.
        val deadline = System.currentTimeMillis() + 15000
        while (listener.snapshot.forall(_.numInputRows == 0) &&
            System.currentTimeMillis() < deadline)
          Thread.sleep(100)
        val dataBatches = listener.snapshot.filter(_.numInputRows > 0)
        val rows = dataBatches.map(_.numInputRows).sum
        val ms = dataBatches.map(_.batchDurationMs).sum
        val st = listener.stateSnapshot.filter(_.queryName == name)
        // State row count from the sink itself (one upsert per key in
        // the single data batch) — trackTotalNumberOfRows is off in
        // this main (the production hot-path knob), so the operator
        // metric reads 0; memoryUsedBytes still reports.
        val stateRows = spark.table(name).select(col("key")).distinct().count()
        SweepRow(mult, rows, ms,
          if (ms > 0) rows * 1000.0 / ms else 0.0,
          stateRows,
          if (st.isEmpty) 0L else st.map(_.memoryUsedBytes).max)
      } finally {
        spark.streams.removeListener(listener)
        // Same provider-unload discipline as Bench/Verify (the r16
        // find): the stopped query's state-store providers linger
        // with live RocksDB instances + maintenance work until the
        // maintenance thread reaps them, taxing the NEXT sweep
        // point's measured batch. Without this, every msgs/s figure
        // after the first carries the previous cardinality's residue
        // — the floors recorded pre-r17 did (BASELINE.md notes the
        // comparability shift).
        org.apache.spark.sql.execution.streaming.state
          .GraftStateStoreAccess.unloadAll()
      }
    }

    run(1, "stream_bench_warmup") // untimed: native load + codegen
    // 1× ≈ 1.5k keys (warm tiny state) … 1000× ≈ the batch's own row
    // count — state as large as the data, the 100 TB-predictive point.
    val sweep = Seq(1, 10, 100, 1000).map(m => run(m, s"stream_bench_x$m"))
    val head = sweep.head
    val perCore = head.msgsPerSec / cpus.toInt
    val sweepJson = sweep.map(r =>
      s"""{"mult":${r.mult},"rows":${r.rows},"batch_ms":${r.batchMs},""" +
        s""""msgs_per_sec":${r.msgsPerSec},"state_rows":${r.stateRows},""" +
        s""""state_bytes":${r.stateBytes}}""").mkString("[", ",", "]")
    println(s"""{"metric":"stream_count_msgs_per_sec","value":${head.msgsPerSec},""" +
      s""""per_core":$perCore,"rows":${head.rows},"batch_ms":${head.batchMs},""" +
      s""""cores":$cpus,"cardinality_sweep":$sweepJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
