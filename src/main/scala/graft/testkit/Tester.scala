package graft.testkit

import scala.collection.mutable
import graft.core._
import graft.operators.BatchExecutor.{Emitted, FoldIterator, KindJoin, KindMessage, KindState, SinkLoop, SinkTable, Tagged}
import graft.operators.NilHandling

/** In-process test harness — the engine's equivalent of the reference's
  * `tester` package (`/root/reference/tester/tester.go:66-99`): an
  * in-memory broker with per-topic queues, synchronous consumption
  * (loop messages drain before `consume` returns, like
  * `tester/tester.go:416-441`), direct table access
  * (`TableValue`/`SetTableValue`, `tester/tester.go:282-326`) and
  * queue trackers (`tester/queue.go:75-147`).
  *
  * Runs the exact same [[FoldIterator]] callback machinery as the
  * distributed executors, one message at a time on the driver — no
  * SparkSession needed, so specs are fast.
  */
final class Tester(
    graph: GroupGraph,
    nilHandling: NilHandling = NilHandling.Ignore,
    maxLoopCascade: Int = 1000) {

  graph.validate()

  private val state = mutable.LinkedHashMap.empty[String, Array[Byte]]
  private val joinTables =
    mutable.Map.empty[String, mutable.Map[String, Array[Byte]]]
  private val lookupTables =
    mutable.Map.empty[String, mutable.Map[String, Array[Byte]]]
  private val queues = mutable.Map.empty[String, mutable.Buffer[Message]]
  private var offset = 0L

  /** Seed / overwrite a row of a Join or Lookup table. */
  def setTableValue(table: String, key: String, value: Any): Unit = {
    val codec = graph.joins.get(table).orElse(graph.lookups.get(table))
      .getOrElse(throw new IllegalArgumentException(
        s"$table is not a Join/Lookup of ${graph.group}"))
    val target =
      if (graph.joins.contains(table))
        joinTables.getOrElseUpdate(table, mutable.Map.empty)
      else lookupTables.getOrElseUpdate(table, mutable.Map.empty)
    target(key) = codec.asInstanceOf[Codec[Any]].encode(value)
  }

  /** Seed the group table directly (`tester/tester.go:318-326`). */
  def setGroupTableValue(key: String, value: Any): Unit = {
    val codec = graph.persist.map(_.codec).getOrElse(
      throw new IllegalStateException("no Persist edge"))
    state(key) = codec.asInstanceOf[Codec[Any]].encode(value)
  }

  /** Push one message through the processor; synchronous — all loopback
    * cascades are drained before returning. */
  def consume(topic: String, key: String, value: Any,
      headers: Map[String, Array[Byte]] = Map.empty): Unit = {
    val bytes =
      if (value == null) null
      else graph.inputCodec(topic).asInstanceOf[Codec[Any]].encode(value)
    consumeBytes(topic, key, bytes, headers)
  }

  /** Explicit work queue (not recursion) with a cascade cap mirroring
    * BatchExecutor's maxLoopIterations: a non-converging loop callback
    * fails with a clear diagnostic instead of a StackOverflow. */
  private def consumeBytes(topic: String, key: String, bytes: Array[Byte],
      headers: Map[String, Array[Byte]]): Unit = {
    val work = mutable.Queue((topic, key, bytes, headers))
    var cascades = 0
    while (work.nonEmpty) {
      cascades += 1
      require(cascades <= maxLoopCascade,
        s"loopback cascade exceeded $maxLoopCascade messages for group " +
          s"${graph.group} — non-converging loop callback?")
      val (t0, k0, b0, h0) = work.dequeue()
      offset += 1
      val stateRow = state.get(k0).iterator.map(v =>
        Tagged(k0, KindState, graph.tableTopic, v, 0, 0L, 0L, 0, null))
      val joinRows = joinTables.iterator.flatMap { case (t, m) =>
        m.get(k0).map(v => Tagged(k0, KindJoin, t, v, 0, 0L, 0L, 0, null))
      }
      val msgRow = Iterator.single(Tagged(k0, KindMessage, t0, b0, 0,
        offset, offset * 1000L, 0, h0))
      val lookups = lookupTables.map { case (t, m) => t -> m.toMap }.toMap
      val out = new FoldIterator(graph, nilHandling, lookups,
        stateRow ++ joinRows ++ msgRow).toVector
      out.foreach { e =>
        e.sink match {
          case SinkTable =>
            if (e.value == null) state.remove(e.key) else state(e.key) = e.value
          case SinkLoop =>
            work.enqueue((graph.loopTopic, e.key, e.value,
              Map.empty[String, Array[Byte]]))
          case t => queues.getOrElseUpdate(t, mutable.Buffer.empty) +=
            Message(e.key, e.value, t, e.partition, offset,
              graft.operators.BatchExecutor.microsTimestamp(e.tsMicros),
              if (e.headers == null) Map.empty else e.headers)
        }
      }
    }
  }

  /** Decoded group-table row, or null (`tester/tester.go:282-316`). */
  def tableValue(key: String): Any =
    state.get(key) match {
      case Some(v) => graph.persist.get.codec.decode(v)
      case None => null
    }

  def tableKeys: Seq[String] = state.keys.toSeq

  /** Run a named visitor over every key (`processor.go:954-996`). */
  def visitAll(name: String, meta: Any = null): Long = {
    val cb = graph.visitors.getOrElse(name,
      throw new IllegalArgumentException(s"no visitor $name"))
    val metaBytes = Codecs.JsonValueCodec.encode(meta)
    val keys = state.keys.toVector
    keys.foreach { k =>
      val rows = Iterator(
        Tagged(k, KindState, graph.tableTopic, state(k), 0, 0L, 0L, 0, null),
        Tagged(k, KindMessage, s"@visit:$name", metaBytes, 0, 0L, 0L, 0, null))
      val lookups = lookupTables.map { case (t, m) => t -> m.toMap }.toMap
      new FoldIterator(graph, nilHandling, lookups, rows).toVector.foreach {
        e =>
          if (e.sink == SinkTable) {
            if (e.value == null) state.remove(e.key) else state(e.key) = e.value
          }
      }
    }
    keys.size.toLong
  }

  /** Sequential reader over an output topic's emitted messages. */
  final class QueueTracker(topic: String) {
    private var pos = 0
    def hwm: Int = queues.get(topic).map(_.size).getOrElse(0)
    def next(): Option[(String, Any)] = {
      val q = queues.getOrElse(topic, mutable.Buffer.empty)
      if (pos >= q.size) None
      else {
        val m = q(pos); pos += 1
        val codec = graph.outputs(topic)
        Some((m.key, if (m.value == null) null else codec.decode(m.value)))
      }
    }
    def nextMessage(): Option[Message] = {
      val q = queues.getOrElse(topic, mutable.Buffer.empty)
      if (pos >= q.size) None else { val m = q(pos); pos += 1; Some(m) }
    }
  }

  def queueTracker(topic: String): QueueTracker = new QueueTracker(topic)
}
