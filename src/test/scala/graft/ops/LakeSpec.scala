package graft.ops

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Targeted key-erasure over a shard-partitioned lake: the audit
  * numbers, the zero-residual guarantee, and — the point of the
  * layout — that shards NOT containing an erased key keep their
  * original files physically untouched. */
class LakeSpec extends AnyFunSuite with SparkFixture {

  private def snapshot(dir: Path): Map[String, (Long, Long)] =
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p) &&
        !p.getFileName.toString.startsWith("_"))
      .map(p => dir.relativize(p).toString ->
        ((Files.size(p), Files.getLastModifiedTime(p).toMillis)))
      .toMap

  test("eraseKeys rewrites only affected shards; audit is exact") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_lake_spec")
    val path = out.resolve("t").toString
    // keys 0..9 into 4 shards; two rows for key 3 so rowsErased = 2.
    val df = ((0L to 9L).map(k => (k, s"v$k")) :+ ((3L, "v3b")))
      .toDF("user_id", "payload")
    Lake.writeSharded(df, col("user_id"), path, nShards = 4)
    val before = snapshot(out)

    val erase = Seq(3L).toDF("user_id")
    val audit = Lake.eraseKeys(spark, path, "user_id", erase, nShards = 4)
    assert(audit == Lake.EraseAudit(11L, 9L, 1L, 0L))

    val after = snapshot(out)
    // shard=3 (keys 3, 7) was rewritten; every other shard's files are
    // byte- and mtime-identical.
    val untouched = before.filter(!_._1.contains("shard=3"))
    untouched.foreach { case (f, sig) =>
      assert(after.get(f).contains(sig), s"$f was rewritten")
    }
    assert(after.keys.exists(_.contains("shard=3")))
    // the surviving key in the rewritten shard is intact
    val rows = spark.read.parquet(path)
      .select("user_id", "payload").as[(Long, String)].collect().toSet
    assert(!rows.exists(_._1 == 3L))
    assert(rows.contains((7L, "v7")))
    assert(rows.size == 9)
  }

  test("compaction changes file count, never rows or content digest") {
    import spark.implicits._
    import graft.functions.Hashes.h60
    val out = Files.createTempDirectory("graft_compact_spec")
    val df = (0L to 99L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    df.repartition(8).write.parquet(s"$out/raw")
    def files(p: String) = Files.list(java.nio.file.Paths.get(p))
      .iterator().asScala.count(_.toString.endsWith(".parquet"))
    val raw = spark.read.parquet(s"$out/raw")
    raw.coalesce(2).write.parquet(s"$out/compact")
    assert(files(s"$out/raw") == 8)
    assert(files(s"$out/compact") == 2)
    def sealOf(p: String) = spark.read.parquet(p)
      .select(h60(col("text")).as("d0"))
      .agg(count(lit(1)).cast("long"), expr("bit_xor(d0)")).head()
    assert(sealOf(s"$out/raw") == sealOf(s"$out/compact"))
  }

  test("clustered write yields disjoint per-file key ranges — the " +
      "property that makes row-group skipping surgical") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_clustered_spec")
    val path = out.resolve("t").toString
    // deliberately shuffled input: clustering must impose the order
    val df = scala.util.Random.shuffle((0L to 999L).toList)
      .toDF("user_id").withColumn("payload", col("user_id") * 3)
    Lake.writeClustered(df, col("user_id"), path, nFiles = 4)
    val files = Files.list(java.nio.file.Paths.get(path))
      .iterator().asScala
      .filter(_.toString.endsWith(".parquet")).map(_.toString).toSeq
    assert(files.size == 4)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(min(col("user_id")), max(col("user_id"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, hi), (lo, _)) =>
        assert(hi < lo, s"file ranges overlap: $ranges")
      case _ =>
    }
    // all rows survive the layout change
    assert(spark.read.parquet(path).count() == 1000L)
  }

  test("randomized parity: eraseKeys audit matches brute-force on " +
      "seeded random data, negative keys included") {
    import spark.implicits._
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 3) {
      val n = 50 + rnd.nextInt(150)
      val nShards = 2 + rnd.nextInt(6)
      // keys may be negative and may repeat — pmod must keep shard
      // assignment total and non-negative either way
      val rows = (1 to n).map(i => (rnd.nextInt(60).toLong - 20L, i.toLong))
      val eraseKeys = (1 to 8).map(_ => rnd.nextInt(70).toLong - 25L)
        .distinct
      val out = Files.createTempDirectory(s"graft_lake_rand$round")
      val path = out.resolve("t").toString
      Lake.writeSharded(rows.toDF("k", "v"), col("k"), path, nShards)
      val audit = Lake.eraseKeys(spark, path, "k",
        eraseKeys.toDF("k"), nShards)
      val eSet = eraseKeys.toSet
      val expectAfter = rows.count(r => !eSet.contains(r._1)).toLong
      val expectShards = eraseKeys
        .map(k => ((k % nShards) + nShards) % nShards).distinct.size.toLong
      assert(audit == Lake.EraseAudit(n.toLong, expectAfter,
        expectShards, 0L), s"round $round n=$n shards=$nShards")
      val survived = spark.read.parquet(path)
        .select("k", "v").as[(Long, Long)].collect().toSet
      assert(survived == rows.filter(r => !eSet.contains(r._1)).toSet,
        s"round $round content mismatch")
    }
  }

  test("erasing a key present in no shard rewrites its hash shard only") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft_lake_spec2")
    val path = out.resolve("t").toString
    Lake.writeSharded((0L to 3L).map(k => (k, k * 10))
      .toDF("user_id", "x"), col("user_id"), path, nShards = 2)
    val audit = Lake.eraseKeys(spark, path, "user_id",
      Seq(8L).toDF("user_id"), nShards = 2)
    assert(audit == Lake.EraseAudit(4L, 4L, 1L, 0L))
  }
}
