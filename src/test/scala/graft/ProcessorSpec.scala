package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.core.Codecs._

/** The goka-shaped top-level lifecycle: define group → run → view. */
class ProcessorSpec extends AnyFunSuite with SparkFixture {

  test("define -> runBatch -> view -> visitAll, goka-style") {
    import spark.implicits._
    val g = GroupGraph.define("facade")(
      Input("in", StringCodec, ProcessCallback { (ctx, _) =>
        val c = ctx.value match { case null => 0L; case n: Long => n }
        ctx.setValue(c + 1L)
      }),
      Persist(Int64Codec),
      VisitorEdge("reset", ProcessCallback { (ctx, _) => ctx.setValue(0L) }))
    val p = Processor(spark, g)
    val msgs = Seq("a", "a", "b").zipWithIndex.map { case (k, i) =>
      Message(k, Array[Byte]('x'), "in", 0, i.toLong,
        new Timestamp(i * 1000L), Map.empty)
    }
    val res = p.runBatch(Map("in" -> spark.createDataset(msgs)))
    val v = p.view(res.table)
    assert(v.get("a").map(Int64Codec.decode) == Some(2L))
    assert(v.get("b").map(Int64Codec.decode) == Some(1L))
    val visited = p.visitAll("reset", res.table)
    assert(p.view(visited.table).get("a").map(Int64Codec.decode) == Some(0L))
  }
}
