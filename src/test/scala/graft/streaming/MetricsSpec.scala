package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core._
import graft.core.Codecs._

class MetricsSpec extends AnyFunSuite with SparkFixture {

  test("listener captures per-batch progress incl. state rows") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val listener = new MetricsListener
    spark.streams.addListener(listener)
    try {
      val g = GroupGraph.define("metered")(
        Input("in", StringCodec, ProcessCallback { (c, _) =>
          val n = c.value match { case null => 0L; case x: Long => x }
          c.setValue(n + 1L)
        }),
        Persist(Int64Codec))
      val ms = MemoryStream[Message]
      val out = new StreamExecutor(g).run(spark, ms.toDS())
      val q = out.map(_.key).toDF("key")
        .writeStream.format("memory").queryName("metrics_probe")
        .outputMode("update").start()
      try {
        ms.addData(Message("a", Array[Byte](1), "in", 0, 1,
          new Timestamp(1000), Map.empty))
        ms.addData(Message("b", Array[Byte](1), "in", 0, 2,
          new Timestamp(2000), Map.empty))
        q.processAllAvailable()
      } finally q.stop()
      // listener events are async; wait briefly for delivery
      var tries = 0
      while (listener.snapshot.count(_.numInputRows > 0) == 0 && tries < 50) {
        Thread.sleep(100); tries += 1
      }
      val withRows = listener.snapshot
        .filter(s => s.queryName == "metrics_probe" && s.numInputRows > 0)
      assert(withRows.nonEmpty)
      assert(withRows.map(_.numInputRows).sum == 2L)
      assert(withRows.exists(_.stateRows > 0))
      assert(listener.toDF(spark).columns.contains("batchId"))
      // per-source stats with raw offsets recorded (MemoryStream reports
      // no latestOffset, so lag stays at the unknown sentinel there)
      val src = listener.sourceSnapshot
        .filter(s => s.queryName == "metrics_probe" && s.numInputRows > 0)
      assert(src.nonEmpty)
      assert(src.forall(_.endOffset != "null"))
      // per-operator state stats
      val st = listener.stateSnapshot.filter(_.queryName == "metrics_probe")
      assert(st.exists(_.numRowsTotal > 0))
      assert(st.exists(_.numRowsUpdated > 0))
      // the monitoring payload serves over HTTP
      val server = new graft.web.WebServer().attachMetrics(() => listener.json)
      val p = server.start()
      try {
        val conn = java.net.URI.create(s"http://localhost:$p/metrics").toURL
          .openConnection().asInstanceOf[java.net.HttpURLConnection]
        assert(conn.getResponseCode == 200)
        val body = new String(conn.getInputStream.readAllBytes(), "UTF-8")
        assert(body.contains("\"batches\"") && body.contains("\"sources\"")
          && body.contains("\"state\""))
        assert(body.contains("metrics_probe"))
      } finally server.stop()
    } finally spark.streams.removeListener(listener)
  }

  test("offset lag parses plain, file-stream and kafka offset shapes") {
    val l = new MetricsListener
    assert(l.offsetLag("5", "9") == 4L)
    assert(l.offsetLag("""{"logOffset":3}""", """{"logOffset":7}""") == 4L)
    assert(l.offsetLag(
      """{"events":{"0":100,"1":50}}""",
      """{"events":{"0":120,"1":55}}""") == 25L)
    assert(l.offsetLag("9", "5") == 0L)   // never negative
    assert(l.offsetLag(null, "5") == -1L) // unknown
    assert(l.offsetLag("abc", "5") == -1L)
  }
}
