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
