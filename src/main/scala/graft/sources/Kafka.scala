package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Message

/** Kafka adapter: every reference topic is a Kafka topic
  * (`/root/reference/graph.go:36-45`), and the engine's [[Message]] is
  * deliberately shaped like Spark's Kafka source row (SURVEY §1.1), so
  * the adapter is a pure column mapping in both directions. The mapping
  * functions ([[fromKafka]], [[toSinkRows]]) are broker-free and
  * unit-tested; the read/write entry points just bolt them onto
  * `format("kafka")`, making a streaming deployment a config-only swap:
  *
  * {{{
  *   // file-staged (tests)            // Kafka (production)
  *   Sources.eventMessages(spark, dir) Kafka.readStream(spark, brokers, "events")
  *   emitter.finish(spark)             Kafka.writeStream(msgs, brokers, ckpt)
  * }}}
  */
object Kafka {

  /** Unbounded stream of a topic list — the reference's Input/Inputs
    * subscription (`graph.go:319-326,357-368`). */
  def readStream(spark: SparkSession, bootstrap: String, topics: String,
      startingOffsets: String = "latest"): Dataset[Message] =
    fromKafka(spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", startingOffsets)
      .option("includeHeaders", "true")
      .load())

  /** Bounded replay of a topic list (the batch executor's input). */
  def read(spark: SparkSession, bootstrap: String, topics: String): Dataset[Message] =
    fromKafka(spark.read.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .option("includeHeaders", "true")
      .load())

  /** Kafka source row → [[Message]]. Pure column mapping: binary key →
    * UTF-8 string (keys are always strings in the reference,
    * `context.go:45-46`), header entry array → map. Null key → empty
    * string (the reference treats keys as possibly-empty strings, never
    * nil).
    *
    * Kafka headers may REPEAT keys; a plain `map_from_entries` throws on
    * duplicates, so entries fold last-wins — the reference's merged
    * header semantics (`headers.go:22-44`). */
  def fromKafka(df: DataFrame): Dataset[Message] = {
    val spark = df.sparkSession
    import spark.implicits._
    val headers =
      if (df.columns.contains("headers"))
        coalesce(
          aggregate(col("headers"),
            typedLit(Map.empty[String, Array[Byte]]),
            (acc, e) => map_concat(
              map_filter(acc, (k, _) => k =!= e.getField("key")),
              map_from_arrays(array(e.getField("key")),
                array(e.getField("value"))))),
          typedLit(Map.empty[String, Array[Byte]]))
      else typedLit(Map.empty[String, Array[Byte]])
    df.select(
      coalesce(col("key").cast("string"), lit("")).as("key"),
      col("value").as("value"),
      col("topic").as("topic"),
      col("partition").as("partition"),
      col("offset").as("offset"),
      col("timestamp").as("timestamp"),
      headers.as("headers")
    ).as[Message]
  }

  /** [[Message]] → Kafka sink schema (key/value/topic/headers); the
    * inverse of [[fromKafka]]. Attach `.write.format("kafka")` — the
    * sink routes each row to its `topic` column, which is how one
    * emitted dataset fans out to N declared Output topics
    * (`context.go:198-200`). */
  def toSinkRows(ds: Dataset[Message]): DataFrame =
    ds.toDF().select(
      // fromKafka maps a null Kafka key to "" (Message.key is non-null);
      // emit it back as null so re-produced messages keep Kafka's
      // null-key partitioning/compaction semantics. Asymmetry: a genuine
      // zero-length key also round-trips to null — goka keys are
      // non-empty strings, so the collapse is unobservable there.
      when(col("key") === "", lit(null))
        .otherwise(col("key")).cast("binary").as("key"),
      col("value").as("value"),
      col("topic").as("topic"),
      transform(map_entries(col("headers")),
        e => struct(e.getField("key").as("key"),
          e.getField("value").as("value"))).as("headers"))

  /** Continuous produce of a message stream — the reference's async
    * producer loop (`producer.go:64-118`); delivery/retry semantics are
    * the sink's (checkpointed, at-least-once). */
  def writeStream(ds: Dataset[Message], bootstrap: String,
      checkpointLocation: String): org.apache.spark.sql.streaming.StreamingQuery =
    toSinkRows(ds).writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("checkpointLocation", checkpointLocation)
      .start()

  /** One-shot batch produce (the standalone [[Emitter]]'s drain path:
    * `emitter.finish(spark)` then `Kafka.write(...)`). */
  def write(ds: Dataset[Message], bootstrap: String): Unit =
    toSinkRows(ds).write.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .save()
}
