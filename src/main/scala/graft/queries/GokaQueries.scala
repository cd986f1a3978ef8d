package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core._
import graft.core.Codecs._
import graft.operators.{BatchExecutor, View}
import graft.sources.Sources

/** The reference's own capability surface, re-expressed as oracle-checkable
  * queries over the `events` stream fixture (key = user_id, offset =
  * event_id, ts = event time; FIXTURES.md §B).
  *
  * Each query builds a [[GroupGraph]] (the reference's dataflow spec,
  * `/root/reference/graph.go:168-220`) and replays the bounded stream
  * through [[BatchExecutor]] — the deterministic batch twin of the
  * streaming executor, so results can be hash-checked against DuckDB.
  */
/** JSON-codec'd state for [[GokaQueries.jsonState]] — mirrors the
  * reference's UserClicks struct codec (`examples/2-clicks/main.go:41-59`). */
final case class UserStats(cnt: Long, lastType: String)

/** Detector counters for [[GokaQueries.messagingApp]] — the
  * reference's `Counters{Sent, Received}`
  * (`examples/3-messaging/detector/detector.go:21-24`). */
final case class MsgCounters(sent: Long, received: Long)

object GokaQueries {

  private def countGraph(cbTopic: String = "events"): GroupGraph =
    GroupGraph.define("counter")(
      Input(cbTopic, StringCodec, ProcessCallback { (ctx, _) =>
        val cur = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(cur + 1L)
      }),
      Persist(Int64Codec))

  /** Count messages per key — the reference's canonical example
    * (`examples/1-simplest/main.go:46-68`): Input + Persist fold. */
  def countPerKey(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = new BatchExecutor(countGraph()).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.table.map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "cnt")
  }

  /** Typed numeric state: running sum of event_id per key (exact int
    * arithmetic so the oracle matches bit-for-bit). */
  def sumState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("summer")(
      Input("events", Int64Codec, ProcessCallback { (ctx, msg) =>
        val cur = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(cur + msg.asInstanceOf[Long])
      }),
      Persist(Int64Codec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir, value = col("event_id"))))
    res.table.map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "sum_id")
  }

  /** Multiple co-partitioned input topics, one callback — `Inputs`
    * (`graph.go:357-368`). Per-topic counts prove interleaving. */
  def multiInput(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("multi")(
      Inputs(Seq("t_click", "t_other"), StringCodec, ProcessCallback { (ctx, _) =>
        val m = ctx.value match {
          case null => Map("t_click" -> "0", "t_other" -> "0")
          case m: Map[_, _] => m.asInstanceOf[Map[String, String]]
        }
        ctx.setValue(m.updated(ctx.topic, (m(ctx.topic).toLong + 1L).toString))
      }),
      Persist(StringMapCodec))
    val ev = Sources.table(spark, dir, "events")
    val clicks = Sources.messages(ev.filter(col("event_type").isin("click", "view")),
      "t_click", col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val others = Sources.messages(ev.filter(!col("event_type").isin("click", "view")),
      "t_other", col("user_id"), col("event_type"), col("ts"), col("event_id"))
    val res = new BatchExecutor(graph).run(spark,
      Map("t_click" -> clicks, "t_other" -> others))
    res.table.map { r =>
      val m = StringMapCodec.decode(r.value)
      (r.key, m("t_click").toLong, m("t_other").toLong)
    }.toDF("key", "cnt_a", "cnt_b")
  }

  /** Co-partitioned stream-table join (`graph.go:409-420`): per-message
    * point read of the customer table at the current key. */
  def joinTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("joiner")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val seg = ctx.join("customer") match { case null => ""; case s => s.toString }
        val cnt = ctx.value match {
          case null => 0L
          case s: String => s.split('|')(1).toLong
        }
        ctx.setValue(s"$seg|${cnt + 1L}")
      }),
      Join("customer", StringCodec),
      Persist(StringCodec))
    val cust = Sources.tableRows(Sources.table(spark, dir, "customer"),
      col("c_custkey"), col("c_mktsegment"))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)),
      joinTables = Map("customer" -> cust))
    res.table.map { r =>
      val Array(seg, cnt) = StringCodec.decode(r.value).split('|')
      (r.key, seg, cnt.toLong)
    }.toDF("key", "segment", "cnt")
  }

  /** Replicated lookup table at an arbitrary key (`graph.go:422-433`):
    * broadcast view of `nation`, probed at user_id % 25. */
  def lookupTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("looker")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val n = ctx.lookup("nation", (ctx.key.toLong % 25L).toString)
        ctx.setValue(if (n == null) "" else n.toString)
      }),
      Lookup("nation", StringCodec),
      Persist(StringCodec))
    val nation = Sources.tableRows(Sources.table(spark, dir, "nation"),
      col("n_nationkey"), col("n_name"))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)),
      lookupTables = Map("nation" -> nation))
    res.table.map(r => (r.key, StringCodec.decode(r.value)))
      .toDF("key", "nation")
  }

  /** Loopback (`graph.go:395-407`): every event re-keys to bucket
    * user_id%10 carrying a countdown user_id%3; the loop callback keeps
    * re-emitting until the countdown hits 0, then increments bucket
    * state — exercises multi-round fixpoint iteration. */
  /** Shared by batch g06 and streaming st03 — the two executors must
    * produce identical results on the same graph (same oracle). */
  private[queries] def pingpongGraph: GroupGraph =
    GroupGraph.define("pingpong")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val uid = ctx.key.toLong
        ctx.loopback((uid % 10L).toString, uid % 3L)
      }),
      Loop(Int64Codec, ProcessCallback { (ctx, msg) =>
        val n = msg.asInstanceOf[Long]
        if (n > 0L) ctx.loopback(ctx.key, n - 1L)
        else {
          val cur = ctx.value match { case null => 0L; case c: Long => c }
          ctx.setValue(cur + 1L)
        }
      }),
      Persist(Int64Codec))

  def loopback(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val res = new BatchExecutor(pingpongGraph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.table.map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "cnt")
  }

  /** Tombstones (`context.go:247-253`, `options.go:76-82`): 'purchase'
    * deletes the row; other events increment. Final table = users with
    * surviving counters only. */
  def tombstones(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("tomb")(
      Input("events", StringCodec, ProcessCallback { (ctx, msg) =>
        if (msg == "purchase") ctx.delete()
        else {
          val cur = ctx.value match { case null => 0L; case n: Long => n }
          ctx.setValue(cur + 1L)
        }
      }),
      Persist(Int64Codec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.table.map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "cnt")
  }

  /** Emit to a declared Output with headers (`context.go:185-217`,
    * `headers.go:22-44`): one enriched output message per input. */
  def emitHeaders(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("emitter")(
      Input("events", StringCodec, ProcessCallback { (ctx, msg) =>
        ctx.emitWithHeaders("out", ctx.key, msg,
          Map("src" -> StringCodec.encode(ctx.topic)))
      }),
      Output("out", StringCodec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.outputs("out").map { m =>
      (m.key, m.offset, StringCodec.decode(m.value),
        StringCodec.decode(m.headers("src")))
    }.toDF("key", "event_id", "val", "hdr_src")
  }

  /** Stateless conditional transform (filter + projection as user code,
    * like `examples/3-messaging/filter/filter.go:17-28`). */
  def statelessFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("filter")(
      Input("events", StringCodec, ProcessCallback { (ctx, msg) =>
        val Array(typ, v) = msg.toString.split('|')
        if (typ == "click" && v.toDouble > 100.0)
          ctx.emit("out", ctx.key, typ.toUpperCase)
      }),
      Output("out", StringCodec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir,
        value = concat_ws("|", col("event_type"), col("value")))))
    res.outputs("out").map(m => (m.key, m.offset, StringCodec.decode(m.value)))
      .toDF("key", "event_id", "payload")
  }

  /** Visitor (`graph.go:370-393`, `processor.go:954-996`): fold counts,
    * then run a whole-state visitor that doubles every row. */
  def visitor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("visited")(
      Input("events", StringCodec, ProcessCallback { (ctx, _) =>
        val cur = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(cur + 1L)
      }),
      Persist(Int64Codec),
      VisitorEdge("scale", ProcessCallback { (ctx, meta) =>
        val factor = meta match { case null => 2L; case f: Long => f }
        ctx.setValue(ctx.value.asInstanceOf[Long] * factor)
      }))
    val exec = new BatchExecutor(graph)
    val folded = exec.run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    val visited = exec.visitAll(spark, "scale", folded.table, 2L)
    visited.table.map(r => (r.key, Int64Codec.decode(r.value)))
      .toDF("key", "cnt")
  }

  /** Bounded-list state: last 5 event types per key, like the reference's
    * collector (`examples/3-messaging/collector/collector.go:34-45`). */
  def lastN(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val graph = GroupGraph.define("collector")(
      Input("events", StringCodec, ProcessCallback { (ctx, msg) =>
        val cur = ctx.value match {
          case null => Vector.empty[String]
          case s: String => s.split(',').toVector
        }
        ctx.setValue((cur :+ msg.toString).takeRight(5).mkString(","))
      }),
      Persist(StringCodec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.table.map(r => (r.key, StringCodec.decode(r.value)))
      .toDF("key", "last5")
  }

  /** JSON case-class state — the reference's real-app codec pattern
    * (`examples/2-clicks/main.go:41-59` folds a JSON UserClicks struct).
    * State is a nested case class persisted through [[Codecs.json]];
    * the table bytes are actual JSON documents. */
  def jsonState(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val codec = Codecs.json[UserStats]
    val graph = GroupGraph.define("jsonstate")(
      Input("events", StringCodec, ProcessCallback { (ctx, msg) =>
        val cur = ctx.value match {
          case null => UserStats(0L, "")
          case s: UserStats => s
        }
        ctx.setValue(UserStats(cur.cnt + 1L, msg.toString))
      }),
      Persist(codec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.table.map { r =>
      val s = codec.decode(r.value)
      (r.key, s.cnt, s.lastType)
    }.toDF("key", "cnt", "last_type")
  }

  /** The RELATIONAL read of a JSON-codec'd group table: the same fold
    * as g15, but the result table's bytes are decoded with Catalyst
    * `from_json` into struct columns (codegen'd columnar path) instead
    * of the per-row jackson codec — both paths must hash-match the same
    * oracle. This is how a goka table becomes a DataFrame for the §2.5
    * relational surface. */
  def jsonRelational(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val codec = Codecs.json[UserStats]
    val graph = GroupGraph.define("jsonrel")(
      Input("events", StringCodec, ProcessCallback { (ctx, msg) =>
        val cur = ctx.value match {
          case null => UserStats(0L, "")
          case s: UserStats => s
        }
        ctx.setValue(UserStats(cur.cnt + 1L, msg.toString))
      }),
      Persist(codec))
    val res = new BatchExecutor(graph).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir)))
    res.table.toDF()
      .withColumn("s", Codecs.fromJsonValue[UserStats](col("value")))
      .select(col("key"), col("s.cnt").as("cnt"),
        col("s.lastType").as("last_type"))
  }

  /** g18: changelog compaction as an oracle-checked table op — the
    * Kafka log-compaction semantics (`cleanup.policy=compact`,
    * `/root/reference/topic_manager.go:317-326`) by which the
    * reference materializes table topics into views
    * (`view.go:230-282`). The events stream is read as a keyed
    * changelog where 'purchase' writes a TOMBSTONE (null value) and
    * every other event upserts its type; [[View.compact]] keeps the
    * last write per key by (timestamp, offset) and drops keys whose
    * last write is a tombstone — one max_by shuffle, no window sort. */
  def compactChangelog(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val changelog = Sources.eventMessages(spark, dir).map { m =>
      if (StringCodec.decode(m.value) == "purchase") m.copy(value = null)
      else m
    }
    View.compact(changelog)
      .map(r => (r.key, StringCodec.decode(r.value)))
      .toDF("key", "last_event")
  }

  /** Chained processors — the reference's flagship messaging topology
    * (`examples/3-messaging`): a detector counts per-user traffic and
    * emits a block command every 10th event
    * (`detector/detector.go:60-77`); a second processor group consumes
    * the block stream into its own table (`blocker/blocker.go:30-60`).
    * Output messages of graph 1 are the input topic of graph 2 — the
    * composition every real goka deployment is built from (timestamps
    * and offsets survive the hop, so graph 2's fold order is graph 1's
    * emit order). */
  /** Detector half of the messaging topology: counts per-user traffic,
    * emits a block command every 10th event (`detector/detector.go:60-77`).
    * Shared with the streaming twin st07. */
  private[queries] def detectorGraph = GroupGraph.define("detector")(
    Input("events", StringCodec, ProcessCallback { (ctx, _) =>
      val cur = ctx.value match { case null => 0L; case n: Long => n }
      val next = cur + 1L
      ctx.setValue(next)
      if (next % 10L == 0L) ctx.emit("blocks", ctx.key, next)
    }),
    Persist(Int64Codec),
    Output("blocks", Int64Codec))

  /** Blocker half: consumes the block stream into its own table
    * (`blocker/blocker.go:30-60`). Shared with st07. */
  private[queries] def blockerGraph = GroupGraph.define("blocker")(
    Input("blocks", Int64Codec, ProcessCallback { (ctx, _) =>
      val cur = ctx.value match { case null => 0L; case n: Long => n }
      ctx.setValue(cur + 1L)
    }),
    Persist(Int64Codec))

  def chained(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val detector = detectorGraph
    val blocker = blockerGraph
    val stage1 = graft.Processor(spark, detector)
      .runBatch(Map("events" -> Sources.eventMessages(spark, dir)))
    val stage2 = graft.Processor(spark, blocker)
      .runBatch(Map("blocks" -> stage1.outputs("blocks")))
    stage2.table.map(r => (r.key, Int64Codec.decode(r.value)))
      .toDF("key", "n_blocks")
  }

  /** g19: the reference's FLAGSHIP composite — the whole 3-messaging
    * app (`examples/3-messaging/README.md`) replayed through the
    * engine as four chained processor groups exercising every
    * composition mechanism at once: **detector** (per-user
    * Sent/Received counters via Input + Loopback-to-receiver, block
    * events emitted past the threshold), **blocker** (folds block
    * events into the Blocked table), **filter** (Input of the same
    * sent stream, ctx.JOIN of blocker's table — one group's table
    * topic as another's Join edge — drop-if-blocked, word translation
    * via a replicated ctx.LOOKUP table, forward re-keyed to the
    * receiver), **collector** (last-5 feed per receiver, the g11 list
    * fold). Messages derive deterministically from events (from =
    * user_id, to = (user_id+1+event_id mod 7) mod 1000, content =
    * event_type).
    *
    * One deliberate divergence, documented: the reference blocks on a
    * sent-RATE rule evaluated mid-stream
    * (`detector.go:43-49`) — order-dependent under batch-fold
    * iteration order (all originals fold before loop deliveries, so a
    * mid-fold rate is not the online rate). The replay blocks on the
    * MONOTONE `sent >= 60` rule: once true it stays true, so WHEN the
    * block emits cannot change the blocker's folded flag and the whole
    * app is deterministic, oracle-checkable end to end. */
  def messagingApp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val countersCodec = Codecs.twoLongs[MsgCounters](
      c => (c.sent, c.received))(MsgCounters.apply)
    val ev = Sources.table(spark, dir, "events")
    val toCol = ((col("user_id") + lit(1) + col("event_id") % 7) % 1000)
      .cast("string")
    val sentMsgs = Sources.messages(ev, "sent", col("user_id"),
      concat(toCol, lit(":"), col("event_type")), col("ts"),
      col("event_id"))

    val detector = GroupGraph.define("msg-detector")(
      Input("sent", StringCodec, ProcessCallback { (ctx, msg) =>
        val c = ctx.value match {
          case null => MsgCounters(0L, 0L)
          case s: MsgCounters => s
        }
        val next = c.copy(sent = c.sent + 1L)
        ctx.setValue(next)
        if (next.sent >= 60L) ctx.emit("blocks", ctx.key, "B")
        ctx.loopback(msg.asInstanceOf[String].split(':')(0), "r")
      }),
      Loop(StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match {
          case null => MsgCounters(0L, 0L)
          case s: MsgCounters => s
        }
        ctx.setValue(c.copy(received = c.received + 1L))
      }),
      Output("blocks", StringCodec),
      Persist(countersCodec))

    val blocker = GroupGraph.define("msg-blocker")(
      Input("blocks", StringCodec, ProcessCallback { (ctx, _) =>
        ctx.setValue("B") // no unblock events in the replay
      }),
      Persist(StringCodec))

    val filter = GroupGraph.define("msg-filter")(
      Input("sent", StringCodec, ProcessCallback { (ctx, msg) =>
        if (ctx.join("blocker") == null) {
          val Array(to, word) = msg.asInstanceOf[String].split(':')
          val tw = ctx.lookup("translator", word) match {
            case null => word
            case t => t.toString
          }
          ctx.emit("received", to, s"${ctx.key}:$tw")
        }
      }),
      Join("blocker", StringCodec),
      Lookup("translator", StringCodec),
      Output("received", StringCodec))

    val collector = GroupGraph.define("msg-collector")(
      Input("received", StringCodec, ProcessCallback { (ctx, msg) =>
        val cur = ctx.value match {
          case null => Array.empty[String]
          case s: String => s.split('|')
        }
        ctx.setValue((cur :+ msg.asInstanceOf[String])
          .takeRight(5).mkString("|"))
      }),
      Persist(StringCodec))

    val translator = spark.createDataset(Seq(
      TableRow("view", StringCodec.encode("seen")),
      TableRow("click", StringCodec.encode("tap")),
      TableRow("purchase", StringCodec.encode("buy"))))

    val s1 = graft.Processor(spark, detector)
      .runBatch(Map("sent" -> sentMsgs))
    val s2 = graft.Processor(spark, blocker)
      .runBatch(Map("blocks" -> s1.outputs("blocks")))
    val s3 = graft.Processor(spark, filter).runBatch(
      Map("sent" -> sentMsgs),
      joinTables = Map("blocker" -> s2.table),
      lookupTables = Map("translator" -> translator))
    val s4 = graft.Processor(spark, collector)
      .runBatch(Map("received" -> s3.outputs("received")))
    s4.table.map { r =>
      val feed = StringCodec.decode(r.value)
      (r.key, feed.split('|').length.toLong, feed)
    }.toDF("user", "n_feed", "feed")
  }

  private def countTable(spark: SparkSession, dir: String) =
    new BatchExecutor(countGraph()).run(spark,
      Map("events" -> Sources.eventMessages(spark, dir))).table

  /** View point reads (`view.go:333-360`): multi-get of specific keys. */
  def viewPoint(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val view = new View(countTable(spark, dir))
    view.rows.filter(col("key").isin("1", "12", "123"))
      .map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "cnt")
  }

  /** View range scan `[start, limit)` in lex key order
    * (`view.go:396-417`). */
  def viewRange(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    new View(countTable(spark, dir)).range("1", "3")
      .map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "cnt")
  }

  /** View prefix scan (`storage/memory.go:154-170`). */
  def viewPrefix(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    new View(countTable(spark, dir)).prefix("1")
      .map(r => (r.key, Int64Codec.decode(r.value))).toDF("key", "cnt")
  }
}
