package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** The compacted lookup-snapshot file behind [[FileLookups]] — write /
  * read round-trip, tombstone handling, atomic republish, and the
  * per-batch cache behavior the CatchupForever semantics rely on. */
class LookupsSpec extends AnyFunSuite {

  private def tmpFile(): String =
    java.nio.file.Files.createTempDirectory("graft_lkp").toString + "/t.lkp"

  test("write/read round-trip; null values are tombstones dropped on read") {
    val f = tmpFile()
    LookupFile.write(f, Map(
      "a" -> Array[Byte](1, 2, 3),
      "b" -> Array.emptyByteArray,
      "dead" -> null))
    val m = LookupFile.read(f)
    assert(m.keySet == Set("a", "b"))
    assert(m("a").toSeq == Seq[Byte](1, 2, 3))
    assert(m("b").isEmpty)
  }

  test("republish atomically replaces the snapshot") {
    val f = tmpFile()
    LookupFile.write(f, Map("k" -> "v1".getBytes("UTF-8")))
    assert(new String(LookupFile.read(f)("k"), "UTF-8") == "v1")
    LookupFile.write(f, Map("k" -> "v2".getBytes("UTF-8")))
    assert(new String(LookupFile.read(f)("k"), "UTF-8") == "v2")
    // no leftover temp file from the rename dance
    val dir = new java.io.File(f).getParentFile
    assert(dir.listFiles().map(_.getName).count(_.endsWith(".tmp")) == 0)
  }

  test("FileLookups re-reads when the batch id advances, caches within it") {
    val f = tmpFile()
    val run = java.util.UUID.randomUUID()
    LookupFile.write(f, Map("k" -> "v1".getBytes("UTF-8")))
    val lk = FileLookups(Map("t" -> f))
    assert(new String(lk.resolve(run, 0L)("t")("k"), "UTF-8") == "v1")
    LookupFile.write(f, Map("k" -> "v2".getBytes("UTF-8")))
    // same batch id: cached snapshot (consistent within a micro-batch)
    assert(new String(lk.resolve(run, 0L)("t")("k"), "UTF-8") == "v1")
    // next batch id: fresh read sees the republished value
    assert(new String(lk.resolve(run, 1L)("t")("k"), "UTF-8") == "v2")
    // a RESTARTED query (new run id, batch ids reset) must not be served
    // the old run's cache
    LookupFile.write(f, Map("k" -> "v3".getBytes("UTF-8")))
    val run2 = java.util.UUID.randomUUID()
    assert(new String(lk.resolve(run2, 0L)("t")("k"), "UTF-8") == "v3")
  }

  test("StaticLookups never refreshes") {
    val run = java.util.UUID.randomUUID()
    val s = StaticLookups(Map("t" -> Map("k" -> Array[Byte](9))))
    assert(s.resolve(run, 0L)("t")("k").toSeq == Seq[Byte](9))
    assert(s.resolve(run, 99L)("t")("k").toSeq == Seq[Byte](9))
  }
}
