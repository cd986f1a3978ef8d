package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.Codecs._
import graft.core._
import graft.operators.BatchExecutor

/** Emitter lifecycle (emitter.go:28-130) + end-to-end into a processor:
  * the reference's README flow — emit, process, read the table. */
class EmitterSpec extends AnyFunSuite with SparkFixture {

  test("emit buffers, finish resolves promises and yields the stream") {
    val em = new Emitter[String]("clicks", StringCodec)
    val f1 = em.emit("u1", "a")
    em.emitSync("u2", "b")
    em.emitSync("u1", "c")
    assert(!f1.isCompleted)
    val ds = em.finish(spark)
    assert(f1.isCompleted)
    val msgs = ds.collect()
    assert(msgs.length == 3)
    assert(msgs.map(_.topic).toSet == Set("clicks"))
    // offsets are monotone per emitter => replay order is deterministic
    assert(msgs.sortBy(_.offset).map(m => new String(m.value, "UTF-8")).toSeq
      == Seq("a", "b", "c"))
    assertThrows[IllegalArgumentException](em.emitSync("u1", "d"))
  }

  test("finish surfaces emit errors: failing rows fail their own " +
      "promise, finish throws after draining (emitter.go:103-130)") {
    val boom = new RuntimeException("no bytes for you")
    val failing = new Codec[String] {
      def encode(v: String): Array[Byte] =
        if (v.startsWith("bad")) throw boom else v.getBytes("UTF-8")
      def decode(b: Array[Byte]): String = new String(b, "UTF-8")
    }
    val em = new Emitter[String]("clicks", failing)
    val ok1 = em.emit("u1", "fine")
    val bad = em.emit("u2", "bad-row")
    val ok2 = em.emit("u3", "also-fine")
    // nothing resolves before the flush
    assert(!ok1.isCompleted && !bad.isCompleted && !ok2.isCompleted)
    val err = intercept[IllegalStateException](em.finish(spark))
    // the finish error names the count and carries the first cause
    assert(err.getMessage.contains("1 emit(s) failed"))
    assert(err.getCause eq boom)
    // every promise drained with ITS outcome — no dropped row, no
    // dropped error
    assert(ok1.value.exists(_.isSuccess))
    assert(ok2.value.exists(_.isSuccess))
    assert(bad.value.exists(_.isFailure))
    assert(bad.value.get.failed.get eq boom)
  }

  test("mid-stream codec failure surfaces through a full graph run: " +
      "the abort names the failing key, no partial stream is processed " +
      "(emitter_test.go + integrationtest/processor_test.go producer-error)") {
    val failing = new Codec[String] {
      def encode(v: String): Array[Byte] =
        if (v.startsWith("bad")) throw new RuntimeException("corrupt row")
        else v.getBytes("UTF-8")
      def decode(b: Array[Byte]): String = new String(b, "UTF-8")
    }
    val em = new Emitter[String]("clicks", failing)
    em.emitSync("u1", "fine")
    em.emitSync("u2", "bad-row") // mid-stream: good rows on both sides
    em.emitSync("u3", "also-fine")
    val graph = GroupGraph.define("clickcount")(
      Input("clicks", StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(c + 1L)
      }),
      Persist(Int64Codec))
    // The producer error preempts the processor run entirely — the
    // reference's Finish returns the collected emit error and the
    // pipeline aborts; feeding the 2 good rows while dropping u2
    // silently would be data loss.
    val err = intercept[IllegalStateException] {
      new BatchExecutor(graph).run(spark, Map("clicks" -> em.finish(spark)))
    }
    assert(err.getMessage.contains("key=u2")) // names the failing key
    assert(err.getMessage.contains("1 emit(s) failed"))
    assert(err.getCause.getMessage == "corrupt row")
  }

  test("emitted stream drives a processor to the expected table") {
    val em = new Emitter[String]("clicks", StringCodec)
    (1 to 5).foreach(i => em.emitSync(s"u${i % 2}", s"c$i"))
    val graph = GroupGraph.define("clickcount")(
      Input("clicks", StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(c + 1L)
      }),
      Persist(Int64Codec))
    val res = new BatchExecutor(graph)
      .run(spark, Map("clicks" -> em.finish(spark)))
    val t = res.table.collect().map(r => r.key -> Int64Codec.decode(r.value)).toMap
    assert(t == Map("u0" -> 2L, "u1" -> 3L))
  }
}
