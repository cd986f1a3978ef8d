package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-query progress metrics — the engine's counterpart of the
  * reference's stats tracker (`/root/reference/stats.go:35-85`: input
  * counts/bytes/offset-lag per partition, surfaced by the monitoring web
  * UI `web/monitor/monitoring.go:96-120`). Spark already emits all of it
  * through `StreamingQueryListener`; this listener materializes the
  * stream of `QueryProgressEvent`s into queryable tables:
  *
  *  - [[BatchStat]]: per micro-batch totals (rows, rates, state size,
  *    duration) — the reference's PartitionProcStats roll-up;
  *  - [[SourceStat]]: per source per batch, with raw start/end/latest
  *    offsets and a computed numeric `lag` where offsets are parseable
  *    (Kafka per-partition maps are summed) — the reference's
  *    per-partition `Offset`/`Hwm` lag (`stats.go:141-227`);
  *  - [[StateStat]]: per stateful operator (rows total/updated, memory,
  *    commit time) — the reference's table recovery/storage stats.
  *    Recovery itself is Spark's checkpoint restore; its cost shows up
  *    as the first batch's `batchDurationMs`.
  */
final case class BatchStat(
    queryName: String,
    batchId: Long,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    processedRowsPerSecond: Double,
    stateRows: Long,
    batchDurationMs: Long)

final case class SourceStat(
    queryName: String,
    batchId: Long,
    source: String,
    startOffset: String,
    endOffset: String,
    latestOffset: String,
    lag: Long, // -1 when offsets are not numerically comparable
    numInputRows: Long,
    inputRowsPerSecond: Double)

final case class StateStat(
    queryName: String,
    batchId: Long,
    operatorName: String,
    numRowsTotal: Long,
    numRowsUpdated: Long,
    memoryUsedBytes: Long,
    commitTimeMs: Long)

/** @param maxEntries retention bound per stat table (ring-buffer
  *   semantics: oldest entries drop first). A long-running deployment
  *   emits one BatchStat + one SourceStat per source + one StateStat per
  *   operator EVERY micro-batch; unbounded buffers would grow the driver
  *   heap and the `/metrics` payload forever — the reference's gauges
  *   are equally fixed-size (`stats.go`). */
final class MetricsListener(maxEntries: Int = 1024)
    extends StreamingQueryListener {

  private val stats = mutable.Buffer.empty[BatchStat]
  private val sources = mutable.Buffer.empty[SourceStat]
  private val states = mutable.Buffer.empty[StateStat]

  private def trim(b: mutable.Buffer[_]): Unit =
    if (b.size > maxEntries) b.remove(0, b.size - maxEntries)

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    val name = Option(p.name).getOrElse(p.id.toString)
    val stateRows =
      if (p.stateOperators.nonEmpty) p.stateOperators.map(_.numRowsTotal).sum
      else 0L
    stats += BatchStat(name, p.batchId, p.numInputRows,
      safe(p.inputRowsPerSecond), safe(p.processedRowsPerSecond),
      stateRows, p.batchDuration)
    p.sources.foreach { s =>
      sources += SourceStat(name, p.batchId, s.description,
        String.valueOf(s.startOffset), String.valueOf(s.endOffset),
        String.valueOf(s.latestOffset),
        offsetLag(s.endOffset, s.latestOffset),
        s.numInputRows, safe(s.inputRowsPerSecond))
    }
    p.stateOperators.foreach { s =>
      states += StateStat(name, p.batchId, String.valueOf(s.operatorName),
        s.numRowsTotal, s.numRowsUpdated, s.memoryUsedBytes,
        s.commitTimeMs)
    }
    trim(stats); trim(sources); trim(states)
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  private def safe(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

  /** Sum-of-partitions offset lag. Handles plain numeric offsets
    * (`{"logOffset":3}` file-stream or bare numbers) and Kafka's
    * `{"topic":{"partition":offset}}` shape; -1 when unparseable or
    * unknown. */
  // One configured mapper for the listener hot path (thread-safe after
  // construction); building one per progress event is needless GC churn.
  @transient private lazy val offsetMapper =
    new com.fasterxml.jackson.databind.ObjectMapper()

  private[streaming] def offsetLag(end: AnyRef, latest: AnyRef): Long = {
    if (end == null || latest == null) return -1L
    try {
      val m = offsetMapper
      def total(node: com.fasterxml.jackson.databind.JsonNode): Option[Long] =
        if (node.isNumber) Some(node.asLong())
        else if (node.isObject) {
          val it = node.properties().iterator()
          var sum = 0L
          while (it.hasNext) {
            total(it.next().getValue) match {
              case Some(v) => sum += v
              case None => return None
            }
          }
          Some(sum)
        } else None
      (total(m.readTree(end.toString)), total(m.readTree(latest.toString))) match {
        case (Some(e), Some(l)) => math.max(0L, l - e)
        case _ => -1L
      }
    } catch { case _: Exception => -1L }
  }

  def snapshot: Seq[BatchStat] = synchronized(stats.toSeq)
  def sourceSnapshot: Seq[SourceStat] = synchronized(sources.toSeq)
  def stateSnapshot: Seq[StateStat] = synchronized(states.toSeq)

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
  def sourcesToDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    sourceSnapshot.toDF()
  }
  def statesToDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    stateSnapshot.toDF()
  }

  /** One JSON document with all three stat tables — what
    * [[graft.web.WebServer.attachMetrics]] serves, standing in for the
    * reference's monitoring UI payload (`monitoring.go:96-120`). */
  def json: String = new String(graft.core.Codecs.JsonValueCodec.encode(
    Map("batches" -> snapshot, "sources" -> sourceSnapshot,
      "state" -> stateSnapshot)), "UTF-8")
}
