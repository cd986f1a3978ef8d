package graft.sources

import java.sql.Timestamp
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
  * async-producer ack lifecycle (`producer.go:92-118`): encoding and
  * materialization both happen at the flush, so a failing emit fails
  * its OWN promise there and [[finish]] surfaces the first error after
  * draining every promise — the reference's `Finish` contract
  * (`emitter.go:103-130` waits out in-flight emits, then returns the
  * collected error), never a silently dropped row. */
final class Emitter[T](val topic: String, codec: Codec[T]) {

  private val buf =
    mutable.Buffer.empty[(String, T, Map[String, Array[Byte]], Promise[Unit])]
  @volatile private var closed = false

  /** Async emit: buffered, promise resolves — or FAILS, on a codec
    * error for this row — at [[finish]] (`emitter.go:60-89`). */
  def emit(key: String, value: T): Future[Unit] =
    emitWithHeaders(key, value, Map.empty)

  /** Sync emit (`emitter.go:91-117`) — immediate buffer append. */
  def emitSync(key: String, value: T): Unit = { emit(key, value); () }

  def emitWithHeaders(key: String, value: T,
      headers: Map[String, Array[Byte]]): Future[Unit] = synchronized {
    require(!closed, "emitter is finished")
    val p = Promise[Unit]()
    buf += ((key, value, headers, p))
    p.future
  }

  /** Drain: encode and flush every buffered emit, resolving each row's
    * promise with ITS outcome, then return the emitted stream
    * (`emitter.go:119-130`). A row whose encode fails fails its own
    * promise, and after the full drain finish THROWS naming the first
    * cause and the failure count — the reference's Finish returns the
    * collected emit error; swallowing it would turn a corrupt producer
    * into silent data loss. The emitter is unusable afterwards. */
  def finish(spark: SparkSession): Dataset[Message] = synchronized {
    closed = true
    import spark.implicits._
    var firstErr: Throwable = null
    var firstKey: String = null
    var nFailed = 0
    val msgs = buf.zipWithIndex.flatMap { case ((k, v, h, p), i) =>
      try {
        // offset = emit order; timestamp follows the pre-r15 counter
        // convention (offset + 1) so replay collapse order is stable
        val m = Message(k, if (v == null) null else codec.encode(v),
          topic, 0, i.toLong, new Timestamp(i.toLong + 1L), h)
        p.success(())
        Some(m)
      } catch { case e: Throwable =>
        if (firstErr == null) { firstErr = e; firstKey = k }
        nFailed += 1
        p.failure(e)
        None
      }
    }.toSeq
    buf.clear()
    if (firstErr != null) throw new IllegalStateException(
      s"$nFailed emit(s) failed during finish; first (key=$firstKey): " +
        firstErr.getMessage,
      firstErr)
    spark.createDataset(msgs)
  }
}
