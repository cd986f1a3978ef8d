package graft.web

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.concurrent.TrieMap
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.core.{Codec, Codecs}
import graft.operators.View

/** Thin HTTP serving layer over views and visitors — the reference's
  * web query server (`/root/reference/web/query/query.go:56-75,166-210`:
  * list sources, `GET /{table}/{key}` → getter → humanized JSON) and
  * web actions server (`web/actions/actions.go:10-22`: trigger named
  * actors remotely).
  *
  * Endpoints:
  *   - `GET  /query`                  → JSON list of attached tables
  *   - `GET  /query/{table}/{key}`    → `{"table":…,"key":…,"value":…}`
  *                                      (404 when the key is absent)
  *   - `GET  /actions`                → JSON list of registered actions
  *   - `POST /actions/{name}`         → run the action with the JSON
  *                                      request body as meta; returns
  *                                      `{"action":…,"result":n}`
  *
  * Runs driver-side (the reference's handlers are equally in-process
  * with the View). Point reads go through [[View.get]] — a key-equality
  * filter, partition/bucket-prunable when the backing table is persisted
  * bucketed ([[View.persistBucketed]]). JDK built-in `HttpServer`: no
  * added dependency. */
final class WebServer(port: Int = 0, bindAddress: String = "127.0.0.1") {

  private val tables = TrieMap.empty[String, (() => View, Codec[_])]
  private val actions = TrieMap.empty[String, Any => Long]
  @volatile private var metrics: () => String = () => "{}"
  @volatile private var monitor: Option[graft.streaming.MetricsListener] = None
  // Loopback by default: /actions mutates state and there is no auth
  // layer; exposing beyond localhost is an explicit deployment choice.
  private val server = HttpServer.create(
    new InetSocketAddress(bindAddress, port), 0)
  // Small pool instead of the JDK default serial executor: a slow
  // View.get (unbucketed full scan) must not block /metrics.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4,
    r => { val t = new Thread(r, "graft-web"); t.setDaemon(true); t })
  server.setExecutor(pool)
  // Landing index (`/root/reference/web/index/index.go`: the root page
  // lists every attached component so a browser user can navigate the
  // server without knowing its routes). Registered on "/" — the JDK
  // server routes unmatched paths here, so exactly "/" renders the
  // index and anything else is a JSON 404 instead of a silent match.
  server.createContext("/", (ex: HttpExchange) =>
    if (ex.getRequestURI.getPath == "/") respondHtml(ex)(200 -> renderIndex())
    else respond(ex)(404 ->
      s"""{"error":${q("no route " + ex.getRequestURI.getPath)}}"""))
  server.createContext("/query", (ex: HttpExchange) => handleQuery(ex))
  server.createContext("/actions", (ex: HttpExchange) => handleAction(ex))
  server.createContext("/metrics",
    (ex: HttpExchange) => respond(ex)(200 -> metrics()))
  server.createContext("/monitor",
    (ex: HttpExchange) => respondHtml(ex)(200 -> renderMonitor()))

  /** Attach a view under a table name (`query.go:56-62` AttachSource).
    * Evaluated per request, so a table that evolves (visitor rewrites,
    * streaming refresh) serves its CURRENT content — the reference's
    * views likewise keep catching up while serving. */
  def attachTable(name: String, view: => View, codec: Codec[_]): WebServer = {
    tables.put(name, (() => view, codec)); this
  }

  /** Register a named action; `meta` is the decoded JSON request body
    * (`actions.go:10-22` — the canonical action is a visitor:
    * `meta => executor.visitAll(spark, name, table, meta)`). */
  def registerAction(name: String, run: Any => Long): WebServer = {
    actions.put(name, run); this
  }

  /** Serve a JSON metrics document at `GET /metrics` — pair with
    * [[graft.streaming.MetricsListener.json]] for the reference's
    * monitoring UI payload (`web/monitor/monitoring.go:96-120`). */
  def attachMetrics(supplier: () => String): WebServer = {
    metrics = supplier; this
  }

  /** Serve the monitoring dashboard at `GET /monitor` — the reference's
    * HTML monitoring page (`web/monitor/monitoring.go:96-120` +
    * templates), rendered server-side from the listener's stat tables:
    * latest batch per query, per-source offsets + lag, per-state-operator
    * rows/memory. Also wires `/metrics` to the listener's JSON. */
  def attachMonitor(listener: graft.streaming.MetricsListener): WebServer = {
    monitor = Some(listener)
    attachMetrics(() => listener.json)
  }

  /** Start listening; returns the bound port (ephemeral when 0). */
  def start(): Int = { server.start(); server.getAddress.getPort }

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def handleQuery(ex: HttpExchange): Unit = respond(ex) {
    ex.getRequestURI.getPath.stripPrefix("/query").stripPrefix("/")
      .split("/", 2) match {
      case Array("") =>
        200 -> jsonList(tables.keys.toSeq.sorted)
      case Array(t) =>
        tables.get(t) match {
          case None => 404 -> s"""{"error":"no table $t"}"""
          case Some(_) => 400 -> """{"error":"usage: /query/{table}/{key}"}"""
        }
      case Array(t, rawKey) =>
        val key = java.net.URLDecoder.decode(rawKey, UTF_8)
        tables.get(t) match {
          case None => 404 -> s"""{"error":"no table $t"}"""
          case Some((view, codec)) =>
            view().get(key) match {
              case None => 404 ->
                s"""{"table":${q(t)},"key":${q(key)},"value":null}"""
              case Some(bytes) =>
                // humanize: decode through the table codec, re-encode as
                // JSON (query.go:166-210's "humanizer")
                val json = new String(Codecs.JsonValueCodec.encode(
                  codec.decode(bytes)), UTF_8)
                200 -> s"""{"table":${q(t)},"key":${q(key)},"value":$json}"""
            }
        }
    }
  }

  private def handleAction(ex: HttpExchange): Unit = respond(ex) {
    ex.getRequestURI.getPath.stripPrefix("/actions").stripPrefix("/") match {
      case "" => 200 -> jsonList(actions.keys.toSeq.sorted)
      case name =>
        actions.get(name) match {
          case None => 404 -> s"""{"error":"no action $name"}"""
          case Some(run) =>
            if (ex.getRequestMethod != "POST")
              405 -> """{"error":"actions are POST-only"}"""
            else {
              val body = ex.getRequestBody.readAllBytes()
              val meta: Any =
                if (body.isEmpty) null else Codecs.JsonValueCodec.decode(body)
              val n = run(meta)
              200 -> s"""{"action":${q(name)},"result":$n}"""
            }
        }
    }
  }

  /** The landing page: every attached table (linked to its /query
    * route), every registered action, and the monitor/metrics pages —
    * the reference's index server enumerates its registered
    * components the same way. Evaluated per request so components
    * attached after start() appear. */
  private def renderIndex(): String = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    def li(items: Seq[String]): String =
      if (items.isEmpty) "<p><i>none</i></p>"
      else items.mkString("<ul>", "", "</ul>")
    val tbls = tables.keys.toSeq.sorted.map(t =>
      s"<li><a href='/query/${esc(t)}'>${esc(t)}</a></li>")
    val acts = actions.keys.toSeq.sorted.map(a =>
      s"<li>${esc(a)} <i>(POST /actions/${esc(a)})</i></li>")
    "<!DOCTYPE html><html><head><title>graft</title></head><body>" +
      "<h1>graft web server</h1>" +
      "<h2>Tables</h2>" + li(tbls) +
      "<h2>Actions</h2>" + li(acts) +
      "<h2>Monitoring</h2><ul>" +
      s"<li><a href='/monitor'>monitor</a>" +
      (if (monitor.isEmpty) " <i>(no listener attached)</i>" else "") +
      "</li><li><a href='/metrics'>metrics JSON</a></li></ul>" +
      "</body></html>"
  }

  /** Latest-per-group dashboard tables (like the reference's per-page
    * refresh of current gauges; history stays available on /metrics). */
  private def renderMonitor(): String = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    def tbl(title: String, headers: Seq[String], rows: Seq[Seq[String]]): String =
      s"<h2>${esc(title)}</h2><table border='1' cellpadding='4'>" +
        headers.map(h => s"<th>${esc(h)}</th>").mkString("<tr>", "", "</tr>") +
        rows.map(_.map(c => s"<td>${esc(c)}</td>")
          .mkString("<tr>", "", "</tr>")).mkString +
        "</table>"
    val body = monitor match {
      case None => "<p>no metrics listener attached</p>"
      case Some(m) =>
        val batches = m.snapshot.groupBy(_.queryName).toSeq.sortBy(_._1)
          .map { case (_, xs) => xs.maxBy(_.batchId) }
          .map(b => Seq(b.queryName, b.batchId.toString,
            b.numInputRows.toString, f"${b.processedRowsPerSecond}%.1f",
            b.stateRows.toString, b.batchDurationMs.toString))
        val srcs = m.sourceSnapshot
          .groupBy(s => (s.queryName, s.source)).toSeq.sortBy(_._1)
          .map { case (_, xs) => xs.maxBy(_.batchId) }
          .map(s => Seq(s.queryName, s.source, s.endOffset, s.latestOffset,
            if (s.lag < 0) "n/a" else s.lag.toString, s.numInputRows.toString))
        val states = m.stateSnapshot
          .groupBy(s => (s.queryName, s.operatorName)).toSeq.sortBy(_._1)
          .map { case (_, xs) => xs.maxBy(_.batchId) }
          .map(s => Seq(s.queryName, s.operatorName, s.numRowsTotal.toString,
            s.numRowsUpdated.toString, s.memoryUsedBytes.toString,
            s.commitTimeMs.toString))
        tbl("Queries", Seq("query", "batch", "input rows", "rows/s",
          "state rows", "batch ms"), batches) +
          tbl("Sources", Seq("query", "source", "end offset", "latest offset",
            "lag", "input rows"), srcs) +
          tbl("State operators", Seq("query", "operator", "rows total",
            "rows updated", "memory bytes", "commit ms"), states)
    }
    "<!DOCTYPE html><html><head><title>graft monitor</title></head><body>" +
      "<h1>graft monitor</h1>" + body +
      "<p><a href='/metrics'>raw JSON</a></p></body></html>"
  }

  private def respondHtml(ex: HttpExchange)(f: => (Int, String)): Unit =
    respondAs(ex, "text/html; charset=utf-8",
      e => s"<html><body>error: ${String.valueOf(e.getMessage)}</body></html>")(f)

  private def respond(ex: HttpExchange)(f: => (Int, String)): Unit =
    respondAs(ex, "application/json",
      e => s"""{"error":${q(String.valueOf(e.getMessage))}}""")(f)

  private def respondAs(ex: HttpExchange, contentType: String,
      errorBody: Exception => String)(f: => (Int, String)): Unit = {
    val (code, body) =
      try f
      catch { case e: Exception => 500 -> errorBody(e) }
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    ex.getResponseBody.write(bytes)
    ex.close()
  }

  private def jsonList(xs: Seq[String]): String =
    xs.map(q).mkString("[", ",", "]")

  private def q(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
