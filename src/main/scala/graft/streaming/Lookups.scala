package graft.streaming

import java.io.{DataInputStream, DataOutputStream}
import scala.collection.concurrent.TrieMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileSystem, Options, Path}

/** How the streaming executor resolves Lookup-table snapshots.
  *
  * The reference keeps every lookup view catching up forever — each
  * processor instance materializes the table locally and applies its
  * changelog continuously (`/root/reference/partition_table.go:119-126`,
  * view-per-processor `processor.go:105-120`). Structured Streaming has
  * no mutable broadcast, so the engine's equivalent is a *per-micro-batch
  * re-resolution*: the executor asks the provider for the current
  * snapshot whenever the batch id advances. Lookup tables are
  * small-by-contract (they are driver-collected broadcasts in batch
  * mode), so a snapshot read per executor JVM per micro-batch is the
  * same I/O the reference pays to keep one replicated view fresh.
  */
trait LookupProvider extends Serializable {
  /** Current value of all lookup tables, keyed by topic. Called on
    * executors; `runId` identifies one query execution and `batchId` is
    * the micro-batch id (monotonic per run — it RESTARTS at the
    * checkpointed position on a new run, so caches must key on both),
    * letting implementations cache within a batch. */
  def resolve(runId: java.util.UUID, batchId: Long)
      : Map[String, Map[String, Array[Byte]]]
}

/** Lifetime-static snapshot — the pre-round-3 behavior, still right for
  * genuinely immutable reference data (currency names, country codes). */
final case class StaticLookups(
    snapshot: Map[String, Map[String, Array[Byte]]]) extends LookupProvider {
  def resolve(runId: java.util.UUID, batchId: Long)
      : Map[String, Map[String, Array[Byte]]] = snapshot
}

/** Lookup tables backed by compacted snapshot files on a shared
  * filesystem (HDFS/S3/local via the Hadoop FS API): `tableFiles` maps
  * topic → file path written by [[LookupFile.write]]. Every micro-batch,
  * each executor JVM re-reads the files exactly once (JVM-global cache
  * keyed by batch id) — the CatchupForever semantics of the reference's
  * views, at batch-boundary granularity. An external process (or the
  * driver between batches) republishes the file to update the table;
  * the write is atomic (temp file + rename), so readers never observe a
  * torn snapshot. */
final case class FileLookups(tableFiles: Map[String, String])
    extends LookupProvider {
  def resolve(runId: java.util.UUID, batchId: Long)
      : Map[String, Map[String, Array[Byte]]] =
    FileLookups.cached(tableFiles, runId, batchId)
}

object FileLookups {
  /** One actual snapshot read: which (run, batch) resolved which content
    * — per table, the entry count and an order-independent content hash.
    * Exactly one Resolution is recorded per (paths, run, batch) — the
    * read that won the cache insert, i.e. the snapshot every task of
    * that batch uses. Ring-buffered evidence so a test (or an operator
    * debugging a mutating-lookup topology) can assert exactly which
    * snapshot version each micro-batch saw. */
  final case class Resolution(runId: java.util.UUID, batchId: Long,
      tables: Map[String, (Int, Long)])

  private val log = org.slf4j.LoggerFactory.getLogger(classOf[FileLookups])
  private val ring = new java.util.concurrent.ConcurrentLinkedQueue[Resolution]

  /** The most recent snapshot reads (bounded at 256), oldest first. */
  def recentResolutions: Seq[Resolution] = {
    import scala.jdk.CollectionConverters._
    ring.iterator().asScala.toSeq
  }

  private def contentHash(m: Map[String, Array[Byte]]): Long =
    m.iterator.map { case (k, v) =>
      31L * k.hashCode + java.util.Arrays.hashCode(v) }.sum

  private type Key = (Map[String, String], java.util.UUID, Long)
  private type Snap = Map[String, Map[String, Array[Byte]]]

  // (paths, runId, batchId) → (insertion stamp, snapshot); one read per
  // JVM per batch. The runId is part of the key because batch ids
  // restart on query restart — a cache keyed on batch id alone would
  // serve the PREVIOUS run's snapshot to the new run's early batches.
  private val stamp = new java.util.concurrent.atomic.AtomicLong()
  private val cache = TrieMap.empty[Key, (Long, Snap)]

  private def cached(paths: Map[String, String], runId: java.util.UUID,
      batchId: Long): Snap = {
    val key = (paths, runId, batchId)
    cache.get(key) match {
      case Some((_, snap)) => snap
      case None =>
        val read: Snap = paths.map { case (t, f) => t -> LookupFile.read(f) }
        // If two tasks race the first read (and an external publisher
        // replaces the file between their reads), exactly one insert
        // wins and BOTH use the winning snapshot — within-batch
        // consistency does not depend on read timing.
        cache.putIfAbsent(key, (stamp.incrementAndGet(), read)) match {
          case Some((_, prior)) => prior
          case None =>
            val tables = read.map { case (t, m) => t -> (m.size, contentHash(m)) }
            ring.add(Resolution(runId, batchId, tables))
            while (ring.size > 256) ring.poll()
            if (log.isInfoEnabled) log.info(
              s"lookup snapshot run=$runId batch=$batchId " + tables.map {
                case (t, (n, h)) => s"$t[n=$n,h=$h]" }.mkString(" "))
            // This run no longer needs batches before batchId-1
            // (speculative/retried tasks of batch N-1 may still resolve
            // while batch N starts). Other runs' entries are untouched
            // here — concurrent queries on the same files must not evict
            // each other's in-flight batch, or a mid-batch re-read could
            // observe a republish and tear the snapshot.
            cache.filterInPlace { case ((p, r, b), _) =>
              p != paths || r != runId || b >= batchId - 1 }
            // Global cap: drop the OLDEST-inserted entries (dead runs age
            // out first); a live run's newest entries are by construction
            // the youngest stamps and survive.
            if (cache.size > 64)
              cache.toSeq.sortBy(_._2._1).dropRight(64)
                .foreach { case (k, v) => cache.remove(k, v); () }
            read
        }
    }
  }
}

/** One compacted lookup table as a single binary file: `[n][len key
  * bytes][len value bytes]*`, value length -1 = null (tombstones are
  * dropped on read). Small-by-contract, so a single file (no
  * partitioning) is the honest format — it is the unit of atomic
  * replacement. */
object LookupFile {

  private def fs(p: Path): FileSystem = FileSystem.get(p.toUri, new Configuration())

  /** Atomically (re)publish a snapshot: write `<path>.tmp`, then
    * rename-with-overwrite onto `path` (`FileContext` rename, the same
    * primitive Spark's checkpoint managers use) — readers see either the
    * old or the new file, never a missing or torn one. Call from the
    * driver or any external publisher. */
  def write(path: String, entries: Map[String, Array[Byte]]): Unit = {
    val target = new Path(path)
    val tmp = new Path(path + ".tmp")
    val f = fs(target)
    val out = new DataOutputStream(f.create(tmp, true))
    try {
      out.writeInt(entries.size)
      entries.foreach { case (k, v) =>
        val kb = k.getBytes("UTF-8")
        out.writeInt(kb.length); out.write(kb)
        if (v == null) out.writeInt(-1)
        else { out.writeInt(v.length); out.write(v) }
      }
    } finally out.close()
    FileContext.getFileContext(target.toUri, new Configuration())
      .rename(tmp, target, Options.Rename.OVERWRITE)
  }

  def read(path: String): Map[String, Array[Byte]] = {
    val p = new Path(path)
    val in = new DataInputStream(fs(p).open(p))
    try {
      val n = in.readInt()
      val b = Map.newBuilder[String, Array[Byte]]
      var i = 0
      while (i < n) {
        val kb = new Array[Byte](in.readInt()); in.readFully(kb)
        val vLen = in.readInt()
        if (vLen >= 0) {
          val vb = new Array[Byte](vLen); in.readFully(vb)
          b += new String(kb, "UTF-8") -> vb
        }
        i += 1
      }
      b.result()
    } finally in.close()
  }
}
