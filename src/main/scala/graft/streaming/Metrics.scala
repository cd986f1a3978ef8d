package graft.streaming

import scala.collection.mutable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Per-query progress metrics — the engine's counterpart of the
  * reference's stats tracker (`/root/reference/stats.go:35-85`: input
  * counts/bytes/offset-lag per partition, surfaced by the monitoring web
  * UI `web/monitor/monitoring.go:96-120`). Spark already emits all of it
  * through `StreamingQueryListener`; this listener just materializes the
  * stream of `QueryProgressEvent`s into a queryable table. */
final case class BatchStat(
    queryName: String,
    batchId: Long,
    numInputRows: Long,
    inputRowsPerSecond: Double,
    processedRowsPerSecond: Double,
    stateRows: Long,
    batchDurationMs: Long)

final class MetricsListener extends StreamingQueryListener {

  private val stats = mutable.Buffer.empty[BatchStat]

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = synchronized {
    val p = e.progress
    val stateRows =
      if (p.stateOperators.nonEmpty) p.stateOperators.map(_.numRowsTotal).sum
      else 0L
    stats += BatchStat(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      safe(p.inputRowsPerSecond), safe(p.processedRowsPerSecond),
      stateRows, p.batchDuration)
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  private def safe(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

  def snapshot: Seq[BatchStat] = synchronized(stats.toSeq)

  def toDF(spark: SparkSession): DataFrame = {
    import spark.implicits._
    snapshot.toDF()
  }
}
