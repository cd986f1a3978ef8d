package graft.operators

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core._
import graft.core.Codecs._

class BatchExecutorSpec extends AnyFunSuite with SparkFixture {

  private def msg(key: String, value: String, topic: String = "in",
      offset: Long = 0L, ts: Long = 0L): Message =
    Message(key, if (value == null) null else value.getBytes("UTF-8"),
      topic, 0, offset, new Timestamp(ts), Map.empty)

  private def counterGraph = GroupGraph.define("count")(
    Input("in", StringCodec, ProcessCallback { (ctx, _) =>
      val c = ctx.value match { case null => 0L; case n: Long => n }
      ctx.setValue(c + 1L)
    }),
    Persist(Int64Codec))

  private def tableMap(t: org.apache.spark.sql.Dataset[TableRow]) =
    t.collect().map(r => r.key ->
      (if (r.value == null) null else new String(r.value, "UTF-8"))).toMap

  test("per-key ordered fold: messages apply in (ts, offset) order") {
    import spark.implicits._
    val g = GroupGraph.define("last")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        ctx.setValue(m.toString)
      }),
      Persist(StringCodec))
    // deliberately shuffled input order; ts decides
    val msgs = spark.createDataset(Seq(
      msg("k", "third", offset = 3, ts = 3000),
      msg("k", "first", offset = 1, ts = 1000),
      msg("k", "second", offset = 2, ts = 2000)))
    val res = new BatchExecutor(g).run(spark, Map("in" -> msgs))
    assert(tableMap(res.table) == Map("k" -> "third"))
  }

  test("offset breaks timestamp ties deterministically") {
    import spark.implicits._
    val g = GroupGraph.define("last")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        ctx.setValue(m.toString)
      }),
      Persist(StringCodec))
    val msgs = spark.createDataset(Seq(
      msg("k", "b", offset = 2, ts = 1000),
      msg("k", "a", offset = 1, ts = 1000)))
    val res = new BatchExecutor(g).run(spark, Map("in" -> msgs))
    assert(tableMap(res.table) == Map("k" -> "b"))
  }

  test("oversize Lookup table fails loudly with the table name") {
    import spark.implicits._
    val g = GroupGraph.define("lk")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        ctx.setValue(m.toString)
      }),
      Lookup("dim", StringCodec),
      Persist(StringCodec))
    val dim = spark.createDataset((1 to 10).map(i =>
      TableRow(s"k$i", Array[Byte]('x'))))
    val in = spark.createDataset(Seq(msg("k1", "v")))
    // A Lookup is a full replica by contract — above the cap the
    // executor must fail naming the table, never silently collect.
    val ex = intercept[IllegalArgumentException] {
      new BatchExecutor(g, maxLookupRows = 3L)
        .run(spark, Map("in" -> in), lookupTables = Map("dim" -> dim))
    }
    assert(ex.getMessage.contains("'dim'"))
    assert(ex.getMessage.contains("maxLookupRows=3"))
    // at the cap it replicates normally
    val ok = new BatchExecutor(g, maxLookupRows = 10L)
      .run(spark, Map("in" -> in), lookupTables = Map("dim" -> dim))
    assert(tableMap(ok.table) == Map("k1" -> "v"))
  }

  test("initial state is overlaid and untouched keys survive") {
    import spark.implicits._
    val init = spark.createDataset(Seq(
      TableRow("warm", Int64Codec.encode(10L)),
      TableRow("k", Int64Codec.encode(5L))))
    val res = new BatchExecutor(counterGraph).run(spark,
      Map("in" -> spark.createDataset(Seq(msg("k", "x")))),
      initialState = Some(init))
    val t = res.table.collect().map(r => r.key -> Int64Codec.decode(r.value)).toMap
    assert(t == Map("warm" -> 10L, "k" -> 6L))
  }

  test("tombstone: delete emits changelog null and drops from table") {
    import spark.implicits._
    val g = GroupGraph.define("tomb")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        if (m == "DEL") ctx.delete() else ctx.setValue(m)
      }),
      Persist(StringCodec))
    val msgs = spark.createDataset(Seq(
      msg("k", "v1", offset = 1, ts = 1), msg("k", "DEL", offset = 2, ts = 2),
      msg("j", "keep", offset = 3, ts = 3)))
    val res = new BatchExecutor(g).run(spark, Map("in" -> msgs))
    assert(tableMap(res.table) == Map("j" -> "keep"))
    val chg = tableMap(res.changelog)
    assert(chg("k") == null && chg("j") == "keep")
  }

  test("outputs are routed per declared topic; loop fixpoint terminates") {
    import spark.implicits._
    val g = GroupGraph.define("route")(
      Input("in", Int64Codec, ProcessCallback { (ctx, m) =>
        ctx.emit("evens", ctx.key, m)
        ctx.loopback(ctx.key + "!", m)
      }),
      Loop(Int64Codec, ProcessCallback { (ctx, m) =>
        val c = ctx.value match { case null => 0L; case x: Long => x }
        ctx.setValue(c + m.asInstanceOf[Long])
      }),
      Output("evens", Int64Codec),
      Persist(Int64Codec))
    val msgs = spark.createDataset(Seq(
      Message("a", Int64Codec.encode(2L), "in", 0, 1L, new Timestamp(1), Map.empty)))
    val res = new BatchExecutor(g).run(spark, Map("in" -> msgs))
    val outs = res.outputs("evens").collect()
    assert(outs.length == 1 && Int64Codec.decode(outs.head.value) == 2L)
    val t = res.table.collect().map(r => r.key -> Int64Codec.decode(r.value)).toMap
    assert(t == Map("a!" -> 2L))
  }

  test("non-converging loop hits the iteration bound") {
    import spark.implicits._
    val g = GroupGraph.define("diverge")(
      Input("in", Int64Codec, ProcessCallback { (ctx, m) =>
        ctx.loopback(ctx.key, m)
      }),
      Loop(Int64Codec, ProcessCallback { (ctx, m) =>
        ctx.loopback(ctx.key, m) // forever
      }))
    val msgs = spark.createDataset(Seq(
      Message("a", Int64Codec.encode(1L), "in", 0, 1L, new Timestamp(1), Map.empty)))
    val ex = intercept[IllegalArgumentException] {
      new BatchExecutor(g, maxLoopIterations = 3).run(spark, Map("in" -> msgs))
    }
    assert(ex.getMessage.contains("did not converge"))
  }

  test("a throwing callback reports group/topic/key/offset of the poison pill") {
    import spark.implicits._
    val g = GroupGraph.define("boom")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        if (m == "bad") ctx.fail(new IllegalStateException("kaboom"))
        else ctx.setValue(m)
      }),
      Persist(StringCodec))
    // the fold materializes eagerly inside run() (localCheckpoint)
    val e = intercept[org.apache.spark.SparkException] {
      new BatchExecutor(g).run(spark, Map("in" -> spark.createDataset(
        Seq(msg("ok", "fine", offset = 1), msg("evil", "bad", offset = 7)))))
        .table.collect()
    }
    val chain = Iterator.iterate[Throwable](e)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    assert(chain.contains("key=evil") && chain.contains("offset=7") &&
      chain.contains("group=boom"), chain)
  }

  test("one group's table topic is another group's Join edge") {
    import spark.implicits._
    // group A counts per key; group B consumes A's TABLE as a Join —
    // the reference's multi-processor deployment shape (blocker table
    // joined by the filter processor, examples/3-messaging).
    val a = new BatchExecutor(counterGraph).run(spark,
      Map("in" -> spark.createDataset(Seq(
        msg("x", "1", offset = 1), msg("x", "2", offset = 2),
        msg("y", "3", offset = 3)))))
    val b = GroupGraph.define("reader")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        val upstream = ctx.join("count-table") match {
          case null => 0L
          case n: Long => n
        }
        ctx.setValue(s"$m@$upstream")
      }),
      Join("count-table", Int64Codec),
      Persist(StringCodec))
    val res = new BatchExecutor(b).run(spark,
      Map("in" -> spark.createDataset(Seq(
        msg("x", "mx", offset = 9), msg("z", "mz", offset = 10)))),
      joinTables = Map("count-table" -> a.table))
    assert(tableMap(res.table) == Map("x" -> "mx@2", "z" -> "mz@0"))
  }

  test("deferCommit: resolved defers commit; a deferred error fails " +
      "the fold (context_test.go:72-130)") {
    import spark.implicits._
    // happy path: defer then resolve inside the callback — state lands
    val ok = GroupGraph.define("defer-ok")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        val done = ctx.deferCommit()
        ctx.setValue(m.toString)
        done(None)
      }),
      Persist(StringCodec))
    val res = new BatchExecutor(ok).run(spark,
      Map("in" -> spark.createDataset(Seq(msg("k", "v")))))
    assert(tableMap(res.table) == Map("k" -> "v"))
    // deferred ERROR: no silent commit — the fold fails with the error
    val bad = GroupGraph.define("defer-bad")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        ctx.deferCommit()(Some(new RuntimeException("async error")))
      }),
      Persist(StringCodec))
    val e = intercept[org.apache.spark.SparkException] {
      new BatchExecutor(bad).run(spark,
        Map("in" -> spark.createDataset(Seq(msg("k", "v"))))).table.collect()
    }
    assert(e.getMessage.contains("async error") ||
      Option(e.getCause).exists(_.getMessage.contains("deferred commit")))
  }

  test("deferCommit: an unresolved defer fails loudly; the done-function " +
      "rejects a double call") {
    import spark.implicits._
    val dangling = GroupGraph.define("defer-dangling")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        ctx.deferCommit(); () // never resolved
      }),
      Persist(StringCodec))
    val e = intercept[org.apache.spark.SparkException] {
      new BatchExecutor(dangling).run(spark,
        Map("in" -> spark.createDataset(Seq(msg("k", "v"))))).table.collect()
    }
    assert(e.getMessage.contains("never resolved") ||
      Option(e.getCause).exists(_.getMessage.contains("never resolved")))
    val doubleCall = GroupGraph.define("defer-double")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        val done = ctx.deferCommit()
        done(None)
        done(None) // must throw
      }),
      Persist(StringCodec))
    val e2 = intercept[org.apache.spark.SparkException] {
      new BatchExecutor(doubleCall).run(spark,
        Map("in" -> spark.createDataset(Seq(msg("k", "v"))))).table.collect()
    }
    assert(e2.getMessage.contains("called twice") ||
      Option(e2.getCause).exists(_.getMessage.contains("called twice")))
  }

  test("executor and Tester agree on a mixed workload") {
    import spark.implicits._
    val mkGraph = () => GroupGraph.define("mix")(
      Input("in", StringCodec, ProcessCallback { (ctx, m) =>
        val c = ctx.value match { case null => ""; case s: String => s }
        if (m == "DEL") ctx.delete() else ctx.setValue(c + m)
      }),
      Persist(StringCodec))
    val work = Seq(("a", "x"), ("b", "y"), ("a", "DEL"), ("a", "z"), ("b", "w"))
    val tt = new graft.testkit.Tester(mkGraph())
    work.foreach { case (k, v) => tt.consume("in", k, v) }
    val msgs = spark.createDataset(work.zipWithIndex.map { case ((k, v), i) =>
      msg(k, v, offset = i.toLong, ts = i.toLong * 1000)
    })
    val res = new BatchExecutor(mkGraph()).run(spark, Map("in" -> msgs))
    val distributed = tableMap(res.table)
    val local = Map("a" -> tt.tableValue("a"), "b" -> tt.tableValue("b"))
    assert(distributed == local)
  }
}
