package graft.sources

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.core.Message

/** The Kafka adapter is a pure column mapping over the connector's
  * source/sink schemas; no broker exists in the sandbox, so the spec
  * drives [[Kafka.fromKafka]]/[[Kafka.toSinkRows]] on hand-built rows
  * with the EXACT schema the connector produces/consumes. */
class KafkaSpec extends AnyFunSuite with SparkFixture {

  /** Spark's Kafka source schema, verbatim (incl. timestampType and the
    * includeHeaders entry array). */
  private val kafkaSourceSchema = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", TimestampType),
    StructField("timestampType", IntegerType),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType)))))))

  test("kafka source rows map to Messages (headers, null key)") {
    val ts = Timestamp.valueOf("2024-05-01 10:00:00.123456")
    val rows = java.util.Arrays.asList(
      Row("k1".getBytes("UTF-8"), "v1".getBytes("UTF-8"), "events", 3, 17L,
        ts, 0, Seq(Row("h1", "hv".getBytes("UTF-8")))),
      Row(null, null, "events", 0, 18L, ts, 0, null))
    val df = spark.createDataFrame(rows, kafkaSourceSchema)
    val msgs = Kafka.fromKafka(df).collect().sortBy(_.offset)
    assert(msgs(0).key == "k1")
    assert(new String(msgs(0).value, "UTF-8") == "v1")
    assert(msgs(0).topic == "events" && msgs(0).partition == 3 &&
      msgs(0).offset == 17L && msgs(0).timestamp == ts)
    assert(new String(msgs(0).headers("h1"), "UTF-8") == "hv")
    assert(msgs(1).key == "")       // null key -> empty string key
    assert(msgs(1).value == null)   // tombstone survives
    assert(msgs(1).headers.isEmpty)
  }

  test("duplicate header keys fold last-wins (headers.go:22-44)") {
    val ts = new Timestamp(1714557600000L)
    val rows = java.util.Arrays.asList(
      Row("k".getBytes("UTF-8"), "v".getBytes("UTF-8"), "t", 0, 1L, ts, 0,
        Seq(Row("h", "old".getBytes("UTF-8")),
          Row("other", "x".getBytes("UTF-8")),
          Row("h", "new".getBytes("UTF-8")))))
    val msgs = Kafka.fromKafka(spark.createDataFrame(rows, kafkaSourceSchema))
      .collect()
    assert(msgs.head.headers.keySet == Set("h", "other"))
    assert(new String(msgs.head.headers("h"), "UTF-8") == "new")
  }

  test("Messages map to kafka sink rows and back (inverse)") {
    import spark.implicits._
    val ts = new Timestamp(1714557600000L)
    val in = Seq(
      Message("a", "x".getBytes("UTF-8"), "out1", 0, 1L, ts,
        Map("h" -> "1".getBytes("UTF-8"))),
      Message("b", null, "out2", 0, 2L, ts, Map.empty))
    val sink = Kafka.toSinkRows(spark.createDataset(in))
    assert(sink.columns.toSeq == Seq("key", "value", "topic", "headers"))
    val rows = sink.collect().sortBy(_.getString(2))
    assert(new String(rows(0).getAs[Array[Byte]]("key"), "UTF-8") == "a")
    assert(rows(0).getString(2) == "out1")
    val hdrs = rows(0).getSeq[Row](3)
    assert(hdrs.length == 1 && hdrs.head.getString(0) == "h")
    assert(rows(1).getAs[Array[Byte]]("value") == null)
    // and the sink shape re-parses as a source row modulo kafka-assigned
    // partition/offset/timestamp
    val back = Kafka.fromKafka(sink
      .withColumn("partition", org.apache.spark.sql.functions.lit(0))
      .withColumn("offset", org.apache.spark.sql.functions.lit(0L))
      .withColumn("timestamp", org.apache.spark.sql.functions.lit(ts)))
      .collect().sortBy(_.topic)
    assert(back(0).key == "a" && back(0).topic == "out1")
    assert(new String(back(0).headers("h"), "UTF-8") == "1")
  }
}
