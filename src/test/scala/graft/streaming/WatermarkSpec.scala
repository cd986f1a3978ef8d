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
}
