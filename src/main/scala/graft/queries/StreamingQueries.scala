package graft.queries

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core._
import graft.core.Codecs._
import graft.sources.Sources
import graft.streaming.StreamExecutor

/** Structured Streaming queries, oracle-checked: the events fixture is
  * replayed through a MemoryStream, processed by the *streaming* engine
  * (keyed state / watermarked windows), and the materialized result must
  * hash-match the same DuckDB oracle as its batch twin — proving the two
  * executors implement identical semantics. */
object StreamingQueries {

  private val nameSeq = new AtomicInteger(0)

  private def runToTable(spark: SparkSession, df: DataFrame): DataFrame = {
    val name = s"stream_result_${nameSeq.incrementAndGet()}"
    val q = df.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
  }

  /** Count-per-key through the streaming executor (keyed state store).
    * Fed in TWO micro-batches so state genuinely carries across batches
    * — the result still matches the single DuckDB GROUP BY. */
  def streamCount(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val graph = GroupGraph.define("stream-counter")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val cur = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(cur + 1L)
      }),
      Persist(Int64Codec))
    val events = Sources.eventMessages(spark, dir).collect().toSeq
    val (b1, b2) = events.splitAt(events.size / 2)
    val ms = MemoryStream[Message]
    val out = new StreamExecutor(graph).run(spark, ms.toDS())
    import graft.operators.BatchExecutor.SinkTable
    val table = out.filter(_.sink == SinkTable)
      .map(e => (e.key, Int64Codec.decode(e.value))).toDF("key", "cnt")
    val name = s"stream_result_${nameSeq.incrementAndGet()}"
    val q = table.writeStream.format("memory").queryName(name)
      .outputMode("update").start()
    try {
      ms.addData(b1); q.processAllAvailable()
      ms.addData(b2); q.processAllAvailable()
    } finally q.stop()
    // update-mode memory sink appends upserts; latest per key wins.
    // cnt only grows, so max(cnt) == last upsert.
    spark.table(name).groupBy(col("key")).agg(max(col("cnt")).as("cnt"))
  }

  private case class Ev(ts: Timestamp, event_type: String, user_id: Long,
      value: Double)

  /** Watermarked event-time tumbling window (daily) over the stream. */
  def streamTumble(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Sources.table(spark, dir, "events")
      .select(col("ts"), col("event_type"), col("user_id"), col("value"))
      .as[Ev].collect().toSeq
    val ms = MemoryStream[Ev]
    ms.addData(rows)
    val windowed = ms.toDS()
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(col("value").cast(DecimalType(12, 2))).cast("double")
          .as("total_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("cnt"), col("total_value"))
    runToTable(spark, windowed)
  }
}
