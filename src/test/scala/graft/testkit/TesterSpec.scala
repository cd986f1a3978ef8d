package graft.testkit

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.Codecs._
import graft.operators.NilHandling

/** Component tests in the style of the reference's tester-based examples
  * (`examples/4-tests/example_test.go:18-325`,
  * `integrationtest/processor_test.go`). */
class TesterSpec extends AnyFunSuite {

  private def counterGraph = GroupGraph.define("count")(
    Input("in", StringCodec, ProcessCallback { (ctx, _) =>
      val c = ctx.value match { case null => 0L; case n: Long => n }
      ctx.setValue(c + 1L)
    }),
    Persist(Int64Codec))

  test("count-per-key fold (examples/1-simplest)") {
    val tt = new Tester(counterGraph)
    tt.consume("in", "k1", "x")
    tt.consume("in", "k1", "y")
    tt.consume("in", "k2", "z")
    assert(tt.tableValue("k1") == 2L)
    assert(tt.tableValue("k2") == 1L)
    assert(tt.tableValue("nope") == null)
  }

  test("emit to output topic + queue tracker ordering") {
    val g = GroupGraph.define("fwd")(
      Input("in", StringCodec, ProcessCallback { (ctx, msg) =>
        ctx.emit("out", ctx.key, msg.toString.toUpperCase)
      }),
      Output("out", StringCodec))
    val tt = new Tester(g)
    val q = tt.queueTracker("out")
    tt.consume("in", "a", "hello")
    tt.consume("in", "b", "bye")
    assert(q.next() == Some(("a", "HELLO")))
    assert(q.next() == Some(("b", "BYE")))
    assert(q.next() == None)
    assert(q.hwm == 2)
  }

  test("undeclared emit topic fails (context.go:198-200)") {
    val g = GroupGraph.define("bad")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        ctx.emit("undeclared", ctx.key, "x")
      }))
    val tt = new Tester(g)
    // surfaced wrapped with the message coordinates, cause preserved
    val e = intercept[graft.operators.BatchExecutor.CallbackException](
      tt.consume("in", "k", "v"))
    assert(e.getMessage.contains("key=k"))
    assert(e.getCause.isInstanceOf[IllegalArgumentException])
  }

  test("join reads co-partitioned table at current key (ctx.Join)") {
    val g = GroupGraph.define("j")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        ctx.setValue(String.valueOf(ctx.join("jt")))
      }),
      Join("jt", StringCodec),
      Persist(StringCodec))
    val tt = new Tester(g)
    tt.setTableValue("jt", "k1", "seg-A")
    tt.consume("in", "k1", "m")
    tt.consume("in", "k2", "m")
    assert(tt.tableValue("k1") == "seg-A")
    assert(tt.tableValue("k2") == "null") // missing join row decodes to null
  }

  test("lookup reads replicated table at arbitrary key (ctx.Lookup)") {
    val g = GroupGraph.define("l")(
      Input("in", StringCodec, ProcessCallback { (ctx, msg) =>
        ctx.setValue(String.valueOf(ctx.lookup("lt", msg.toString)))
      }),
      Lookup("lt", StringCodec),
      Persist(StringCodec))
    val tt = new Tester(g)
    tt.setTableValue("lt", "other", "FOUND")
    tt.consume("in", "k1", "other")
    assert(tt.tableValue("k1") == "FOUND")
  }

  test("loopback cascade drains synchronously (tester.go:416-441)") {
    val g = GroupGraph.define("loop")(
      Input("in", Int64Codec, ProcessCallback { (ctx, msg) =>
        ctx.loopback(ctx.key, msg)
      }),
      Loop(Int64Codec, ProcessCallback { (ctx, msg) =>
        val n = msg.asInstanceOf[Long]
        if (n > 0) ctx.loopback(ctx.key, n - 1L)
        else {
          val c = ctx.value match { case null => 0L; case x: Long => x }
          ctx.setValue(c + 1L)
        }
      }),
      Persist(Int64Codec))
    val tt = new Tester(g)
    tt.consume("in", "k", 3L)
    tt.consume("in", "k", 0L)
    assert(tt.tableValue("k") == 2L)
  }

  test("delete tombstones the row (context.go:247-253)") {
    val g = GroupGraph.define("tomb")(
      Input("in", StringCodec, ProcessCallback { (ctx, msg) =>
        if (msg == "DEL") ctx.delete()
        else ctx.setValue(msg)
      }),
      Persist(StringCodec))
    val tt = new Tester(g)
    tt.consume("in", "k", "v1")
    assert(tt.tableValue("k") == "v1")
    tt.consume("in", "k", "DEL")
    assert(tt.tableValue("k") == null)
    assert(!tt.tableKeys.contains("k"))
  }

  test("nil messages dropped by default, processed with NilHandling.Process") {
    var sawNull = false
    def g = GroupGraph.define("nil")(
      Input("in", StringCodec, ProcessCallback { (ctx, msg) =>
        if (msg == null) sawNull = true
        ctx.setValue("ran")
      }),
      Persist(StringCodec))
    val drop = new Tester(g)
    drop.consume("in", "k", null)
    assert(drop.tableValue("k") == null)
    val proc = new Tester(g, NilHandling.Process)
    proc.consume("in", "k", null)
    assert(sawNull && proc.tableValue("k") == "ran")
  }

  test("headers flow through emit (headers.go:22-44)") {
    val g = GroupGraph.define("h")(
      Input("in", StringCodec, ProcessCallback { (ctx, msg) =>
        ctx.emitWithHeaders("out", ctx.key, msg,
          Map("seen" -> ctx.headers.keys.mkString(",").getBytes("UTF-8")))
      }),
      Output("out", StringCodec))
    val tt = new Tester(g)
    val q = tt.queueTracker("out")
    tt.consume("in", "k", "v", Map("h1" -> Array[Byte](1)))
    val m = q.nextMessage().get
    assert(new String(m.headers("seen"), "UTF-8") == "h1")
  }

  test("visitor rewrites every key (processor.go:954-996)") {
    val g = GroupGraph.define("v")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(c + 1L)
      }),
      Persist(Int64Codec),
      VisitorEdge("reset", ProcessCallback { (ctx, meta) =>
        ctx.setValue(meta.asInstanceOf[Long])
      }))
    val tt = new Tester(g)
    tt.consume("in", "a", "x"); tt.consume("in", "a", "x")
    tt.consume("in", "b", "x")
    assert(tt.visitAll("reset", 0L) == 2L)
    assert(tt.tableValue("a") == 0L && tt.tableValue("b") == 0L)
  }

  test("multi-input topics share state (Inputs edge)") {
    val g = GroupGraph.define("m")(
      Inputs(Seq("t1", "t2"), StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(c + 1L)
      }),
      Persist(Int64Codec))
    val tt = new Tester(g)
    tt.consume("t1", "k", "a")
    tt.consume("t2", "k", "b")
    assert(tt.tableValue("k") == 2L)
  }
}
