package graft.core

import java.sql.Timestamp

/** A keyed stream record — the unit of data in the engine.
  *
  * Shape mirrors the reference's per-message record
  * (`/root/reference/context.go:137-145`: key, value, topic, partition,
  * offset, timestamp, headers), which is exactly Spark's Kafka source
  * schema. Batch replays model a topic as `Dataset[Message]`; streaming
  * uses the same columns off `readStream.format("kafka")`.
  *
  * Keys are strings, values are opaque bytes decoded by a [[Codec]]
  * (`/root/reference/codec.go:4-7`): typing lives at the edges, the
  * engine shuffles bytes.
  */
final case class Message(
    key: String,
    value: Array[Byte],
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Timestamp,
    headers: Map[String, Array[Byte]]) {

  def isTombstone: Boolean = value == null
}

object Message {
  def apply(key: String, value: Array[Byte], topic: String): Message =
    Message(key, value, topic, 0, 0L, new Timestamp(0L), Map.empty)

  def apply(key: String, value: Array[Byte], topic: String, offset: Long,
      timestamp: Timestamp): Message =
    Message(key, value, topic, 0, offset, timestamp, Map.empty)
}

/** One row of a group table / view: latest value per key. A `null`
  * value is a tombstone (deletion), per the reference's nil-message
  * semantics (`/root/reference/options.go:76-82`). */
final case class TableRow(key: String, value: Array[Byte]) {
  def isTombstone: Boolean = value == null
}
