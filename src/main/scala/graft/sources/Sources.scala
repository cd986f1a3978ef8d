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

  /** Read one fixture table, normalizing `ts` to a session-TZ TIMESTAMP
    * regardless of the parquet writer's physical encoding. This is the
    * codec-boundary lesson from the reference
    * (`/root/reference/codec/codec.go:4-7`): input physical type is
    * normalized ONCE at the source, never assumed per query. Handled
    * encodings:
    *   - `TIMESTAMP(NANOS)` → read as `LongType` under
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (set in all our
    *     sessions) → truncated to µs, matching DuckDB's µs resolution so
    *     ordering ties agree with the oracle;
    *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` → Spark
    *     `TIMESTAMP_NTZ` → value-preserving cast to TIMESTAMP, which
    *     requires a UTC session (asserted loudly — under any other zone
    *     the cast would silently shift every value);
    *   - `TIMESTAMP(MICROS, isAdjustedToUTC=true)` → Spark `TIMESTAMP` →
    *     passed through.
    * Any other physical type fails loudly instead of computing garbage. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    df.schema.find(_.name == "ts") match {
      case Some(f) => f.dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          val tz = spark.conf.get("spark.sql.session.timeZone")
          require(tz == "UTC",
            s"$name.ts is TIMESTAMP_NTZ; casting to TIMESTAMP is only " +
            s"value-preserving under a UTC session, but session timeZone is $tz")
          df.withColumn("ts", col("ts").cast("timestamp"))
        case org.apache.spark.sql.types.TimestampType =>
          df
        case other =>
          throw new IllegalStateException(
            s"$name.ts has unsupported physical type $other — expected " +
            "nanos-as-long, TIMESTAMP_NTZ(us) or TIMESTAMP(us)")
      }
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
