package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Message, TableRow}

/** Source adapters: turn batch tables (parquet/csv/json) and DataFrames
  * into the engine's `Dataset[Message]` / `Dataset[TableRow]` shapes.
  *
  * The reference consumes only Kafka topics; its record shape
  * (`/root/reference/context.go:137-145`) is exactly Spark's Kafka source
  * schema, so a streaming deployment swaps these helpers for
  * `spark.readStream.format("kafka")` with zero changes downstream.
  */
object Sources {

  /** Read one fixture table. `events.ts` is written as parquet
    * TIMESTAMP(NANOS), which Spark only reads as a long (with
    * `spark.sql.legacy.parquet.nanosAsLong=true` — set in all our
    * sessions); we truncate to microseconds, which is exactly what
    * DuckDB's µs-resolution TIMESTAMP does, so ordering ties agree with
    * the oracle. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(f => f.name == "ts" &&
        f.dataType == org.apache.spark.sql.types.LongType) match {
      case Some(_) => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case None => df
    }
  }

  /** Project a DataFrame into a keyed message stream. String values are
    * cast to UTF-8 binary (Spark's string→binary cast), matching the
    * reference's string codec wire format. */
  def messages(df: DataFrame, topic: String, key: Column, value: Column,
      timestamp: Column, offset: Column): Dataset[Message] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      key.cast("string").as("key"),
      value.cast("string").cast("binary").as("value"),
      lit(topic).as("topic"),
      lit(0).as("partition"),
      offset.cast("long").as("offset"),
      timestamp.cast("timestamp").as("timestamp"),
      typedLit(Map.empty[String, Array[Byte]]).as("headers")
    ).as[Message]
  }

  /** The canonical stream fixture: `events.parquet` replayed as
    * `Message(key = user_id, value = <valueCol>, ts = ts, offset =
    * event_id)` — see FIXTURES.md §B. */
  def eventMessages(spark: SparkSession, dir: String,
      topic: String = "events",
      value: Column = col("event_type")): Dataset[Message] =
    messages(table(spark, dir, "events"), topic,
      col("user_id"), value, col("ts"), col("event_id"))

  /** Project a DataFrame into table rows (latest value per key is the
    * caller's responsibility — compacted-topic semantics). */
  def tableRows(df: DataFrame, key: Column, value: Column): Dataset[TableRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(key.cast("string").as("key"), value.cast("binary").as("value"))
      .as[TableRow]
  }
}
