package graft.sources

import java.sql.Timestamp
import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable
import scala.concurrent.{Future, Promise}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.core.{Codec, Message}

/** Standalone producer of keyed messages into a topic — the reference's
  * `Emitter` (`/root/reference/emitter.go:28-130`: `NewEmitter`, `Emit`
  * returning a Promise, `EmitSync`, `Finish` draining in-flight emits).
  *
  * Spark has no per-message produce path; messages buffer locally and
  * [[finish]] turns them into a `Dataset[Message]` (feed a batch replay
  * or write to any sink: `ds.write.parquet(topicDir)`, or
  * `.selectExpr("key","value").write.format("kafka")` in a real
  * deployment). Promises resolve on flush, mirroring the reference's
  * async-producer ack lifecycle (`producer.go:92-118`). */
final class Emitter[T](val topic: String, codec: Codec[T]) {

  private val buf = mutable.Buffer.empty[(Message, Promise[Unit])]
  private val offsets = new AtomicLong(0L)
  @volatile private var closed = false

  /** Async emit: buffered, promise resolves at [[finish]]
    * (`emitter.go:60-89`). */
  def emit(key: String, value: T): Future[Unit] = synchronized {
    require(!closed, "emitter is finished")
    val p = Promise[Unit]()
    buf += ((message(key, value), p))
    p.future
  }

  /** Sync emit (`emitter.go:91-117`) — immediate buffer append. */
  def emitSync(key: String, value: T): Unit = { emit(key, value); () }

  def emitWithHeaders(key: String, value: T,
      headers: Map[String, Array[Byte]]): Future[Unit] = synchronized {
    require(!closed, "emitter is finished")
    val p = Promise[Unit]()
    buf += ((message(key, value).copy(headers = headers), p))
    p.future
  }

  private def message(key: String, value: T): Message =
    Message(key,
      if (value == null) null else codec.encode(value),
      topic, 0, offsets.getAndIncrement(),
      new Timestamp(offsets.get()), Map.empty)

  /** Drain: resolve all promises, return the emitted stream
    * (`emitter.go:119-130`). The emitter is unusable afterwards. */
  def finish(spark: SparkSession): Dataset[Message] = synchronized {
    closed = true
    import spark.implicits._
    val msgs = buf.map(_._1).toSeq
    buf.foreach(_._2.success(()))
    buf.clear()
    spark.createDataset(msgs)
  }
}
