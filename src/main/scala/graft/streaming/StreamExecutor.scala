package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.core._
import graft.operators.BatchExecutor.{Emitted, FoldIterator, KindJoin, KindMessage, KindState, SinkTable, Tagged, tsMicros}
import graft.operators.NilHandling

/** Structured Streaming executor of a [[GroupGraph]].
  *
  * The reference's processor loop — per-partition goroutine, serial
  * per-key callbacks, LevelDB state, changelog topic
  * (`/root/reference/partition_processor.go:405-444`) — maps onto
  * `flatMapGroupsWithState`: Spark's keyed state store holds the group
  * table (checkpoint = the reference's recovery machinery,
  * `partition_table.go:98-167`), per-key serial execution is the state
  * operator's contract, and every state change is emitted as a
  * changelog row (`sink = "@table"`, null value = tombstone) exactly like
  * the reference's table topic (`context.go:400-407`).
  *
  * Within a micro-batch, a key's messages are processed in
  * (ts, topic, offset) order — the same deterministic order as the batch
  * executor, so both executors produce identical final state on the same
  * bounded input (asserted by the oracle-checked `st*` queries).
  *
  * Join/Lookup tables are per-batch-stale broadcast snapshots — the
  * documented divergence from the reference's continuously-catching-up
  * views (SURVEY §7.4). Loopback requires a real feedback topic in
  * streaming (cyclic plans are inexpressible); use the batch executor's
  * fixpoint or wire `sink == "@loop"` rows back through a Kafka topic.
  */
class StreamExecutor(
    graph: GroupGraph,
    nilHandling: NilHandling = NilHandling.Ignore) extends Serializable {

  def run(
      spark: SparkSession,
      stream: Dataset[Message],
      joinSnapshots: Map[String, Map[String, Array[Byte]]] = Map.empty,
      lookupSnapshots: Map[String, Map[String, Array[Byte]]] = Map.empty)
      : Dataset[Emitted] = {
    import spark.implicits._
    graph.validate()
    require(graph.loop.isEmpty,
      "streaming loopback needs a real feedback topic; use BatchExecutor " +
        "for bounded fixpoint replay or route @loop rows via Kafka")
    val g = graph
    val nil = nilHandling
    val bc = spark.sparkContext.broadcast((joinSnapshots, lookupSnapshots))

    stream.groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], Emitted](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, msgs: Iterator[Message], state: GroupState[Array[Byte]]) =>
          val (joins, lookups) = bc.value
          val sorted = msgs.toArray.sortBy(m =>
            (tsMicros(m.timestamp), m.topic, m.offset))
          val stateRow: Iterator[Tagged] =
            if (state.exists)
              Iterator(Tagged(key, KindState, g.tableTopic, state.get,
                0, 0L, 0L, 0, null))
            else Iterator.empty
          val joinRows = joins.iterator.flatMap { case (t, m) =>
            m.get(key).map(v => Tagged(key, KindJoin, t, v, 0, 0L, 0L, 0, null))
          }
          val msgRows = sorted.iterator.map(m =>
            Tagged(m.key, KindMessage, m.topic, m.value, m.partition,
              m.offset, tsMicros(m.timestamp), 0, m.headers))
          val out = new FoldIterator(g, nil, lookups,
            stateRow ++ joinRows ++ msgRows).toVector
          out.find(_.sink == SinkTable).foreach { t =>
            if (t.value == null) state.remove() else state.update(t.value)
          }
          out.iterator
      }
  }
}
