package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Event-time watermarking + late-data handling (SURVEY §2.5 additive
  * capability — the reference has none: processing is per-message,
  * immediate). Late rows behind the watermark must be DROPPED, not
  * silently aggregated. */
class WatermarkSpec extends AnyFunSuite with SparkFixture {

  test("late-data quarantine conserves every row: ontime + late = feed, " +
      "stragglers land in quarantine (st28)") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.queries.StreamingQueries.streamQuarantine(spark, dir)
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val total = spark.read.parquet(s"$dir/events.parquet").count()
    assert(out.map(x => x._1 + x._2).sum == total) // nothing silently lost
    assert(out.map(_._2).sum > 0)  // the OOO staging produces late rows
    assert(out.map(_._1).sum > 0)
  }

  test("rows behind the watermark are dropped from windowed aggregates") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Timestamp, String)]
    val agg = ms.toDS().toDF("ts", "k")
      .withWatermark("ts", "10 seconds")
      .groupBy(window(col("ts"), "1 minute"), col("k"))
      .count()
      .select(date_format(col("window.start"), "HH:mm").as("w"), col("k"),
        col("count"))
    val q = agg.writeStream.format("memory").queryName("wmspec")
      .outputMode("update").start()
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    try {
      // batch 1 advances event time to 10:05 -> watermark 10:04:50
      ms.addData((t("10:00:00"), "a"), (t("10:05:00"), "a"))
      q.processAllAvailable()
      // batch 2: a row 4.5 minutes behind the watermark -> dropped
      ms.addData((t("10:00:30"), "a"))
      q.processAllAvailable()
      // and a fresh on-time row -> kept
      ms.addData((t("10:05:10"), "a"))
      q.processAllAvailable()
    } finally q.stop()
    val counts = spark.table("wmspec").collect()
      .map(r => (r.getString(0), r.getLong(2)))
    // the 10:00 window never grows past its on-time single row
    assert(counts.filter(_._1 == "10:00").map(_._2).max == 1L)
    // the 10:05 window saw both on-time rows
    assert(counts.filter(_._1 == "10:05").map(_._2).max == 2L)
  }

  test("dropDuplicatesWithinWatermark: cross-batch duplicate dropped " +
    "from state, TTL-expired key re-admits") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val s = MemoryStream[(Long, Timestamp)]
    def t(h: String) = Timestamp.valueOf(s"2024-01-01 $h")
    val dedup = s.toDS().toDF("k", "ts")
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("k")
      .select(col("k"))
    val q = dedup.writeStream.format("memory").queryName("ddwspec")
      .outputMode("append").start()
    try {
      s.addData((1L, t("10:00:00")))
      q.processAllAvailable()
      // duplicate arrives in a LATER batch — must be served from state
      s.addData((1L, t("10:30:00")), (2L, t("10:30:00")))
      q.processAllAvailable()
      // watermark -> 18:00; k=1's state (expiry 12:00) is evicted
      s.addData((9L, t("20:00:00")))
      q.processAllAvailable()
      // beyond the TTL the same key is a NEW observation by contract
      s.addData((1L, t("19:00:00")))
      q.processAllAvailable()
      val plan = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("StreamingDeduplicateWithinWatermark"),
        plan.take(1500))
    } finally q.stop()
    val ks = spark.table("ddwspec").collect().map(_.getLong(0)).toSeq
    assert(ks.count(_ == 1L) == 2, ks)   // once per state lifetime
    assert(ks.count(_ == 2L) == 1, ks)
  }

  test("stream-stream interval join: in-window pairs only, via the " +
    "symmetric hash join operator") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val vs = MemoryStream[(Long, Long, Timestamp)]
    val ps = MemoryStream[(Long, Long, Timestamp)]
    def t(s: String) = Timestamp.valueOf(s"2024-01-01 $s")
    val views = vs.toDS().toDF("user_id", "view_id", "ts_v")
      .withWatermark("ts_v", "2 hours")
    val purchases = ps.toDS().toDF("p_user", "purchase_id", "ts_p")
      .withWatermark("ts_p", "2 hours")
    val joined = views.join(purchases,
      col("user_id") === col("p_user") &&
        col("ts_p") > col("ts_v") &&
        col("ts_p") <= col("ts_v") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("view_id"), col("purchase_id"))
    val q = joined.writeStream.format("memory").queryName("ssjspec")
      .outputMode("append").start()
    try {
      // views arrive first; matching purchases land in a LATER batch —
      // the view must be served from join state, not the same batch
      vs.addData((1L, 10L, t("10:00:00")), (2L, 11L, t("10:00:00")))
      q.processAllAvailable()
      ps.addData(
        (1L, 20L, t("10:30:00")),  // in window -> pair
        (1L, 21L, t("11:30:00")),  // past 1h   -> no pair
        (2L, 22L, t("10:00:00")),  // not strictly after -> no pair
        (3L, 23L, t("10:15:00")))  // no view at all -> no pair
      q.processAllAvailable()
      assert(q.lastProgress.sources.length == 2)
      val plan = q.asInstanceOf[
        org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan.toString
      assert(plan.contains("StreamingSymmetricHashJoin"), plan.take(1500))
    } finally q.stop()
    val got = spark.table("ssjspec").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 10L, 20L)))
  }
}
