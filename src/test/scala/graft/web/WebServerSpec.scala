package graft.web

import java.net.{HttpURLConnection, URI}
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core._
import graft.core.Codecs._
import graft.operators.{BatchExecutor, View}

/** Drives the HTTP endpoints in-process: point reads against a real
  * materialized view (`web/query/query.go:166-210` semantics) and a
  * remote visitor trigger (`web/actions/actions.go:10-22`). */
class WebServerSpec extends AnyFunSuite with SparkFixture {

  private def http(method: String, url: String, body: String = null)
      : (Int, String) = {
    val conn = URI.create(url).toURL.openConnection()
      .asInstanceOf[HttpURLConnection]
    conn.setRequestMethod(method)
    if (body != null) {
      conn.setDoOutput(true)
      conn.getOutputStream.write(body.getBytes("UTF-8"))
    }
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val out = new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, out)
  }

  test("query + actions endpoints over a live view") {
    import spark.implicits._
    val graph = GroupGraph.define("webcount")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(c + 1L)
      }),
      Persist(Int64Codec),
      VisitorEdge("scale", ProcessCallback { (ctx, meta) =>
        val f = meta match { case null => 2L; case m: Long => m }
        ctx.setValue(ctx.value.asInstanceOf[Long] * f)
      }))
    val msgs = Seq(("a", 1L), ("a", 2L), ("b", 3L)).map { case (k, o) =>
      Message(k, "x".getBytes("UTF-8"), "in", 0, o,
        new java.sql.Timestamp(o * 1000), Map.empty)
    }
    val exec = new BatchExecutor(graph)
    var table = exec.run(spark,
      Map("in" -> spark.createDataset(msgs))).table.cache()

    val server = new WebServer()
      .attachTable("webcount-table", new View(table), Int64Codec)
      .registerAction("scale", meta => {
        val res = exec.visitAll(spark, "scale", table, meta)
        table = res.table.cache()
        table.count()
      })
    val port = server.start()
    try {
      val base = s"http://localhost:$port"
      assert(http("GET", s"$base/query") == ((200, """["webcount-table"]""")))
      assert(http("GET", s"$base/query/webcount-table/a") ==
        ((200, """{"table":"webcount-table","key":"a","value":2}""")))
      val (missCode, missBody) = http("GET", s"$base/query/webcount-table/zz")
      assert(missCode == 404 && missBody.contains("\"value\":null"))
      assert(http("GET", s"$base/query/nope/k")._1 == 404)
      // URL-encoded keys decode before the point read
      assert(http("GET", s"$base/query/webcount-table/%61") ==
        ((200, """{"table":"webcount-table","key":"a","value":2}""")))
      assert(http("GET", s"$base/actions") == ((200, """["scale"]""")))
      assert(http("GET", s"$base/actions/scale")._1 == 405)
      // trigger the visitor with meta 3 -> counts triple
      assert(http("POST", s"$base/actions/scale", "3") ==
        ((200, """{"action":"scale","result":2}""")))
      assert(http("GET", s"$base/query/webcount-table/a") ==
        ((200, """{"table":"webcount-table","key":"a","value":6}""")))
      // index page (web/index): lists all three attached components
      val (idxCode, idx) = http("GET", s"$base/")
      assert(idxCode == 200)
      assert(idx.contains("webcount-table") &&
        idx.contains("/query/webcount-table"))
      assert(idx.contains("scale") && idx.contains("/actions/scale"))
      assert(idx.contains("/monitor") && idx.contains("/metrics"))
      // unmatched paths under "/" are a 404, not a silent index match
      assert(http("GET", s"$base/nope")._1 == 404)
    } finally server.stop()
  }

  test("monitor page renders per-source lag from a real streaming run") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val listener = new graft.streaming.MetricsListener()
    spark.streams.addListener(listener)
    val server = new WebServer().attachMonitor(listener)
    val port = server.start()
    try {
      // Drive one real micro-batch so the listener captures progress.
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[Int]
      val q = ms.toDS().groupBy().count()
        .writeStream.format("memory").queryName("webmon")
        .outputMode("complete").start()
      try { ms.addData(1, 2, 3); q.processAllAvailable() } finally q.stop()
      val (code, html) = http("GET", s"http://localhost:$port/monitor")
      assert(code == 200)
      assert(html.contains("<h1>graft monitor</h1>"))
      assert(html.contains("webmon"))          // per-query row
      assert(html.contains("MemoryStream"))    // per-source row
      assert(html.contains("<th>lag</th>"))    // lag column rendered
      assert(html.contains("<th>rows total</th>")) // state operator table
      // /metrics serves the same listener's JSON
      val (mc, mjson) = http("GET", s"http://localhost:$port/metrics")
      assert(mc == 200 && mjson.contains("\"batches\""))
    } finally {
      server.stop()
      spark.streams.removeListener(listener)
    }
  }
}
