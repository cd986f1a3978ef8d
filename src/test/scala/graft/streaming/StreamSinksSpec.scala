package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core._
import graft.core.Codecs._

class StreamSinksSpec extends AnyFunSuite with SparkFixture {

  test("one stateful query fans out to per-topic sinks + table dir") {
    import spark.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val g = GroupGraph.define("fanout")(
      Input("in", StringCodec, ProcessCallback { (c, m) =>
        val cur = c.value match { case null => 0L; case n: Long => n }
        c.setValue(cur + 1L)
        if (m.toString.startsWith("e")) c.emit("evens", c.key, m)
        else c.emit("odds", c.key, m)
      }),
      Output("evens", StringCodec),
      Output("odds", StringCodec),
      Persist(Int64Codec))
    val dirE = java.nio.file.Files.createTempDirectory("graft_fo_e").toString
    val dirO = java.nio.file.Files.createTempDirectory("graft_fo_o").toString
    val dirT = java.nio.file.Files.createTempDirectory("graft_fo_t").toString
    val ms = MemoryStream[Message]
    val out = new StreamExecutor(g).run(spark, ms.toDS())
    val q = StreamSinks.routeOutputs(out,
      Map("evens" -> dirE, "odds" -> dirO), tableDir = Some(dirT))
    try {
      ms.addData(
        Message("a", "even1".getBytes("UTF-8"), "in", 0, 1, new Timestamp(1000), Map.empty),
        Message("a", "odd1".getBytes("UTF-8"), "in", 0, 2, new Timestamp(2000), Map.empty),
        Message("b", "even2".getBytes("UTF-8"), "in", 0, 3, new Timestamp(3000), Map.empty))
      q.processAllAvailable()
    } finally q.stop()
    val evens = spark.read.parquet(dirE).as[Message].collect()
      .map(m => (m.key, new String(m.value, "UTF-8"))).sorted
    val odds = spark.read.parquet(dirO).as[Message].collect()
      .map(m => (m.key, new String(m.value, "UTF-8"))).sorted
    assert(evens.toSeq == Seq(("a", "even1"), ("b", "even2")))
    assert(odds.toSeq == Seq(("a", "odd1")))
    assert(evens.forall(_ => true)) // topics routed disjointly
    val table = spark.read.parquet(dirT)
      .collect().map(r => (r.getAs[String]("key"),
        Int64Codec.decode(r.getAs[Array[Byte]]("value")))).toMap
    assert(table == Map("a" -> 2L, "b" -> 1L))
  }
}
