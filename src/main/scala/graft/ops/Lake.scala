package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned-lake layout operators: hive-style partitioned parquet
  * artifacts and the targeted-rewrite maintenance they enable.
  *
  * The 100 TB shape this encodes: a lake is laid out so that the hot
  * maintenance operations (date-range serving reads, per-key erasure)
  * touch only the partitions they name — a date-range query prunes at
  * the DIRECTORY level before any file is opened, and a
  * right-to-be-forgotten pass rewrites only the shards that contain the
  * erased keys (Spark's dynamic partition overwrite), leaving every
  * other partition's files physically untouched. The reference's
  * analogue is goka's partition-table layout — state is owned
  * per-partition so maintenance is per-partition
  * (/root/reference/partition_table.go:91-117); here the same idea is
  * applied to the storage layout of a batch lake.
  */
object Lake {

  /** Result of a targeted key-erasure pass over one artifact. */
  final case class EraseAudit(rowsBefore: Long, rowsAfter: Long,
      shardsRewritten: Long, residual: Long)

  /** Write `df` as a parquet artifact hash-sharded on `key` into
    * `nShards` hive partitions (`shard=K/` directories). The shard
    * column is derived, not data: it exists so maintenance can address
    * a bounded partition set per key. */
  def writeSharded(df: DataFrame, key: Column, path: String,
      nShards: Int): Unit =
    df.withColumn("shard", pmod(key, lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Write `df` CLUSTERED on `key`: range-repartitioned into `nFiles`
    * splits and sorted within each, so every output file covers a
    * disjoint key range and its parquet row-group min/max statistics
    * become surgical — a point or range predicate on `key` skips every
    * non-matching file/row-group at the reader (ZORDER-lite on one
    * dimension). The layout property (disjoint per-file ranges) is
    * spec-verified; at 100 TB this is the difference between a point
    * lookup touching one file and touching all of them. */
  def writeClustered(df: DataFrame, key: Column, path: String,
      nFiles: Int): Unit =
    df.repartitionByRange(nFiles, key)
      .sortWithinPartitions(key)
      .write.mode("overwrite").parquet(path)

  /** Morton z-value of two bucketed dimensions: interleave the low
    * `bits` bits of `a` (even positions) and `b` (odd positions).
    * Inputs must already be scaled into [0, 2^bits) — see
    * [[writeZOrdered]] for the rank scaling. Pure bit arithmetic
    * (shifts + masks), exact on longs. */
  def zValue(a: Column, b: Column, bits: Int): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }.reduce(_ + _)

  /** Write `df` Z-ORDERED on two dimensions — the second clustering
    * axis [[writeClustered]] cannot give: both columns are scaled to
    * `bits`-bit buckets by their data range (the min/max scan is one
    * tiny aggregate; Delta's OPTIMIZE ZORDER ranks the same way),
    * bit-interleaved into a Morton z-value, and the lake is
    * range-split + sorted on z. Every output file then covers a
    * compact RECTANGLE of the (k1, k2) space, so parquet min/max
    * stats are tight on BOTH columns and a point/range predicate on
    * EITHER dimension skips most files — where a 1-D clustered
    * layout leaves the second dimension's per-file range at full
    * width (LakeSpec pins exactly this contrast). The z column is
    * derived and not persisted. */
  def writeZOrdered(df: DataFrame, k1: Column, k2: Column, path: String,
      nFiles: Int, bits: Int = 8): Unit = {
    val Array(mn1, mx1, mn2, mx2) = df.agg(
      min(k1.cast("long")), max(k1.cast("long")),
      min(k2.cast("long")), max(k2.cast("long")))
      .head().toSeq.map(_.asInstanceOf[Long]).toArray
    val n = 1L << bits
    def bucket(c: Column, mn: Long, mx: Long): Column =
      if (mx == mn) lit(0L)
      else least(lit(n - 1),
        (c.cast("long") - lit(mn)) * lit(n) / lit(mx - mn + 1L))
    df.withColumn("__z",
        zValue(bucket(k1, mn1, mx1), bucket(k2, mn2, mx2), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Erase all rows whose `keyName` appears in `erase` from the
    * sharded artifact at `path`, rewriting ONLY the shards that
    * contain an erased key: the erase list (human-sized — an RTBF
    * request batch) is broadcast, the affected shard list is a
    * partition-count-bounded collect, and the rewrite runs under
    * dynamic partition overwrite so untouched shards keep their
    * original files bit-for-bit. Returns the audit a compliance gate
    * records: rows before/after, shards rewritten, and the residual
    * count of erased keys still present (must be 0).
    *
    * Caveat (documented, not hit by callers here): dynamic overwrite
    * replaces only partitions PRESENT in the written frame, so a shard
    * whose every row is erased would write nothing and keep its old
    * files — callers erasing whole shards must drop those directories
    * explicitly. */
  def eraseKeys(spark: SparkSession, path: String, keyName: String,
      erase: DataFrame, nShards: Int): EraseAudit = {
    val before = spark.read.parquet(path).count()
    val affected = erase
      .select(pmod(col(keyName), lit(nShards.toLong)).as("shard"))
      .distinct().collect().map(_.getLong(0)).sorted
    val prev = spark.conf.get(
      "spark.sql.sources.partitionOverwriteMode", "static")
    try {
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.read.parquet(path)
        .filter(col("shard").isin(affected.toSeq: _*))
        .join(broadcast(erase.select(col(keyName)).distinct()),
          Seq(keyName), "left_anti")
        // break lineage from the path being overwritten — the rewrite
        // reads and replaces the same directory
        .localCheckpoint()
        .write.mode("overwrite").partitionBy("shard").parquet(path)
    } finally
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    // Post-rewrite audit in ONE scan instead of two: total surviving
    // rows + residual erased-key rows. The erase list is distinct, so
    // the broadcast left join matches each row at most once and the
    // row count is preserved; count(__ek) counts exactly the rows an
    // inner join against the erase set would have (the old residual).
    val post = spark.read.parquet(path)
      .join(broadcast(erase.select(col(keyName).as("__ek")).distinct()),
        col(keyName) === col("__ek"), "left")
      .agg(count(lit(1)).as("n"), count(col("__ek")).as("residual"))
      .head()
    EraseAudit(before, post.getLong(0), affected.length.toLong,
      post.getLong(1))
  }

  // ------------------------------------------------------------------ //
  //  Snapshot-versioned lake: copy-on-write MERGE + time travel.       //
  // ------------------------------------------------------------------ //
  //
  // Layout:
  //   <path>/files/v<N>/shard=<k>/part-*.parquet   (immutable once written)
  //   <path>/_manifests/v<N>.manifest              (one line per shard:
  //                                                 "<k>\t<relative dir>",
  //                                                 "-" = shard empty)
  //
  // A MERGE writes new files ONLY for the shards its change set
  // touches; every other shard is inherited by manifest reference —
  // the Iceberg/Delta snapshot idea reduced to its load-bearing core.
  // Old versions stay byte-identical and readable forever (time
  // travel), because no commit ever mutates or deletes a data file.
  // At 100 TB this is what makes both the merge (touched-shard IO
  // only) and the audit trail (replayable snapshots) affordable; a
  // `retentionSweep`-style expiry of manifests older than N plus a
  // reachability sweep of unreferenced version dirs is the vacuum
  // story, deliberately out of scope here.

  /** Audit row returned by [[mergeVersioned]]. */
  final case class MergeAudit(version: Long, shardsRewritten: Long,
      shardsInherited: Long, rowsBefore: Long, rowsAfter: Long,
      upserts: Long, deletes: Long)

  private def manifestDir(path: String) =
    java.nio.file.Paths.get(path, "_manifests")

  /** Largest committed version at `path`, or 0 if none. */
  def latestVersion(path: String): Int = {
    val d = manifestDir(path)
    if (!java.nio.file.Files.isDirectory(d)) 0
    else {
      val vs = java.nio.file.Files.list(d).iterator()
      var best = 0
      while (vs.hasNext) {
        val n = vs.next().getFileName.toString
        if (n.startsWith("v") && n.endsWith(".manifest"))
          best = math.max(best, n.stripPrefix("v")
            .stripSuffix(".manifest").toInt)
      }
      best
    }
  }

  /** shard → relative data dir ("-" = empty shard) for `version`.
    * Header lines (`#key\tvalue`) carry table metadata — see
    * [[readNShards]]. */
  def readManifest(path: String, version: Int): Map[Int, String] = {
    val f = manifestDir(path).resolve(s"v$version.manifest")
    scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f)).asScala
      .filter(l => l.nonEmpty && !l.startsWith("#")).map { line =>
        val Array(k, d) = line.split("\t", 2)
        k.toInt -> d
      }.toMap
  }

  /** The shard count the table was committed with, persisted in every
    * manifest header — the layout invariant [[mergeVersioned]] and
    * [[versionDiff]] validate instead of trusting each caller to
    * repeat the same `nShards` (a merge with a different count would
    * move keys across shards, making the manifest-level pruning and
    * the diff silently wrong).
    *
    * Manifests written before the header existed have none; for those
    * the entry count IS the shard count — [[writeManifest]] has always
    * emitted exactly one line per shard 0..nShards-1 — so fall back to
    * it rather than stranding pre-header tables with no migration
    * path. */
  def readNShards(path: String, version: Int): Int = {
    val f = manifestDir(path).resolve(s"v$version.manifest")
    val lines = scala.jdk.CollectionConverters.ListHasAsScala(
      java.nio.file.Files.readAllLines(f)).asScala
    lines
      .collectFirst { case l if l.startsWith("#nshards\t") =>
        l.stripPrefix("#nshards\t").toInt }
      .getOrElse(lines.count(l => l.nonEmpty && !l.startsWith("#")))
  }

  private def writeManifest(path: String, version: Int, nShards: Int,
      entries: Map[Int, String]): Unit = {
    val d = manifestDir(path)
    java.nio.file.Files.createDirectories(d)
    val body = (s"#nshards\t$nShards" +: entries.toSeq.sortBy(_._1)
      .map { case (k, dir) => s"$k\t$dir" }).mkString("\n")
    java.nio.file.Files.write(d.resolve(s"v$version.manifest"),
      body.getBytes("UTF-8"))
  }

  /** Which shards under `versionRel` actually received files (a
    * partitionBy write materializes only the partitions present in
    * the frame). */
  private def writtenShards(path: String, versionRel: String): Set[Int] = {
    val d = java.nio.file.Paths.get(path, versionRel)
    if (!java.nio.file.Files.isDirectory(d)) Set.empty
    else {
      val it = java.nio.file.Files.list(d).iterator()
      var out = Set.empty[Int]
      while (it.hasNext) {
        val n = it.next().getFileName.toString
        if (n.startsWith("shard=")) out += n.stripPrefix("shard=").toInt
      }
      out
    }
  }

  /** Commit `df` as version 1 of a snapshot-versioned artifact,
    * hash-sharded on `keyName` into `nShards`. */
  def writeVersioned(df: DataFrame, keyName: String, path: String,
      nShards: Int): Int = {
    require(latestVersion(path) == 0, s"$path already has versions")
    val rel = "files/v1"
    df.withColumn("shard", pmod(col(keyName), lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/$rel")
    val present = writtenShards(path, rel)
    writeManifest(path, 1, nShards, (0 until nShards).map(k =>
      k -> (if (present(k)) rel else "-")).toMap)
    1
  }

  /** Read snapshot `version` (default: latest). Returns data columns
    * only (the shard is derivable from the key). The read plans as one
    * parquet scan over the per-shard leaf directories the manifest
    * names — files from several version dirs compose one snapshot. */
  def readVersioned(spark: SparkSession, path: String,
      version: Int = -1): DataFrame = {
    val v = if (version < 0) latestVersion(path) else version
    val dirs = readManifest(path, v).collect {
      case (k, rel) if rel != "-" => s"$path/$rel/shard=$k"
    }.toSeq.sorted
    spark.read.parquet(dirs: _*)
  }

  /** MERGE `changes` into the latest snapshot, committing a new
    * version copy-on-write. `changes` carries the base schema plus an
    * `op` column: `"upsert"` rows REPLACE the base row with the same
    * key (or insert if absent — full-row payload, so matched-update
    * and not-matched-insert collapse into one arm); `"delete"` rows
    * remove the key (payload columns ignored). Only shards containing
    * a changed key are rewritten: the changed-shard list is a
    * request-batch-bounded collect, base rows are read ONLY from
    * those shards' directories (directory-level pruning — the
    * unchanged 100 TB is never opened), and unchanged shards are
    * inherited into the new manifest by reference. */
  def mergeVersioned(spark: SparkSession, path: String, keyName: String,
      changes: DataFrame, nShards: Int): MergeAudit = {
    val v = latestVersion(path)
    require(v > 0, s"$path has no committed version to merge into")
    val committed = readNShards(path, v)
    require(nShards == committed,
      s"mergeVersioned: nShards=$nShards but $path was committed with " +
        s"$committed shards — a different count would move keys across " +
        "shards and silently break manifest pruning and versionDiff")
    val next = v + 1
    val rel = s"files/v$next"
    val manifest = readManifest(path, v)
    val keyed = changes.withColumn("shard",
      pmod(col(keyName), lit(nShards.toLong))).localCheckpoint()
    // One fold for everything the audit needs from the change set:
    // the changed-shard list plus the upsert/delete row counts. These
    // were three separate actions (distinct-collect + two filtered
    // counts) — three scheduler round-trips over the same pinned
    // request batch; the audit numbers are unchanged (spec-pinned).
    val stats = keyed.agg(
      collect_set(col("shard")).as("sh"),
      coalesce(sum(when(col("op") === "upsert", 1L).otherwise(0L)),
        lit(0L)).as("ups"),
      coalesce(sum(when(col("op") === "delete", 1L).otherwise(0L)),
        lit(0L)).as("dels"),
      coalesce(sum(when(col("shard").isNull, 1L).otherwise(0L)),
        lit(0L)).as("nullkeys")).head()
    // collect_set silently SKIPS null shard values (null merge keys),
    // where the pre-fold distinct().collect() failed loudly with an
    // NPE — a null-keyed upsert would still be written (to
    // shard=__HIVE_DEFAULT_PARTITION__) but excluded from
    // changedShards and the manifest, becoming silently unreachable.
    // Same single-action audit: the null count rides the same fold.
    require(stats.getLong(3) == 0L,
      s"mergeVersioned: ${stats.getLong(3)} change row(s) with a null " +
        s"$keyName — null merge keys cannot be sharded and would be " +
        "unreachable in the manifest")
    val changedShards = stats.getSeq[Long](0).map(_.toInt).toSet
    val baseDirs = changedShards.toSeq.sorted.collect {
      case k if manifest(k) != "-" => s"$path/${manifest(k)}/shard=$k"
    }
    val base =
      if (baseDirs.isEmpty) None else Some(spark.read.parquet(baseDirs: _*))
    val rowsBefore = base.map(_.count()).getOrElse(0L)
    val changeKeys = keyed.select(col(keyName)).distinct()
    val survivors = base.map(
      _.join(broadcast(changeKeys), Seq(keyName), "left_anti"))
    val upserts = keyed.filter(col("op") === "upsert")
      .drop("op", "shard")
    val merged = survivors match {
      case Some(s) => s.unionByName(upserts)
      case None    => upserts
    }
    merged.withColumn("shard", pmod(col(keyName), lit(nShards.toLong)))
      .write.mode("overwrite").partitionBy("shard").parquet(s"$path/$rel")
    val present = writtenShards(path, rel)
    writeManifest(path, next, nShards, manifest.map { case (k, old) =>
      k -> (if (changedShards(k)) { if (present(k)) rel else "-" } else old)
    })
    MergeAudit(next.toLong, changedShards.size.toLong,
      (nShards - changedShards.size).toLong, rowsBefore,
      readVersioned(spark, path, next)
        .withColumn("shard", pmod(col(keyName), lit(nShards.toLong)))
        .filter(col("shard").isin(changedShards.toSeq.map(_.toLong): _*))
        .count(),
      stats.getLong(1), stats.getLong(2))
  }

  /** c29: CHANGE DATA FEED between two committed snapshots — "what
    * changed from vOld to vNew", the artifact every incremental
    * downstream (index refresh, replication, audit) consumes instead
    * of re-scanning the table. The manifest IS the pruning structure:
    * data files are immutable once committed, so a shard whose
    * manifest entry is IDENTICAL in both versions provably contains
    * no difference and is never opened — at 100 TB a merge that
    * touched 3 of 10k shards costs a 3-shard diff, not a table scan.
    * Touched shards full-outer-join per key; emitted rows carry both
    * payloads and a change in {insert, delete, update}; keys whose
    * payload is bit-identical (rewritten-shard survivors) are
    * suppressed by a null-safe whole-row compare. This is the
    * lake-side twin of the reference's changelog-topic contract
    * (`view.go:131-178`, `partition_table.go:175-236` consume the
    * per-key change stream; here the consumer derives it from two
    * immutable snapshots instead of tailing a topic). */
  def versionDiff(spark: SparkSession, path: String, keyName: String,
      vOld: Int, vNew: Int): DataFrame = {
    require(readNShards(path, vOld) == readNShards(path, vNew),
      s"versionDiff: v$vOld and v$vNew of $path were committed with " +
        "different shard counts — shard-level manifest pruning is " +
        "invalid across a re-shard")
    val mo = readManifest(path, vOld)
    val mn = readManifest(path, vNew)
    val touched = (mo.keySet ++ mn.keySet).toSeq.sorted.filter(k =>
      mo.getOrElse(k, "-") != mn.getOrElse(k, "-"))
    def side(m: Map[Int, String]): Option[DataFrame] = {
      val dirs = touched.collect {
        case k if m.getOrElse(k, "-") != "-" => s"$path/${m(k)}/shard=$k"
      }
      if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
    }
    val schema = readVersioned(spark, path, vNew).schema
    val cols = schema.fieldNames.filterNot(_ == keyName).toSeq
    def tagged(df: Option[DataFrame], p: String): DataFrame = df match {
      case Some(d) => d.select(col(keyName) +:
        (cols.map(c => col(c).as(s"__${p}_$c")) :+
          lit(true).as(s"__${p}")): _*)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          schema.fields.filter(_.name == keyName) ++
            cols.map(c => schema(c).copy(name = s"__${p}_$c")) :+
            org.apache.spark.sql.types.StructField(s"__$p",
              org.apache.spark.sql.types.BooleanType)))
    }
    val o = tagged(side(mo), "o")
    val n = tagged(side(mn), "n")
    val oldStruct = struct(cols.map(c => col(s"__o_$c")): _*)
    val newStruct = struct(cols.map(c => col(s"__n_$c")): _*)
    o.join(n, Seq(keyName), "full_outer")
      .withColumn("change",
        when(col("__o").isNull, "insert")
          .when(col("__n").isNull, "delete")
          .when(oldStruct <=> newStruct, lit(null))
          .otherwise("update"))
      .filter(col("change").isNotNull)
      .select(col(keyName) +: (col("change") +:
        cols.flatMap(c => Seq(col(s"__o_$c").as(s"${c}_old"),
          col(s"__n_$c").as(s"${c}_new")))): _*)
  }

  /** c27: THREE-WAY MERGE of two branch snapshots against their
    * common base — the git model applied to a keyed lake: each key's
    * branch value is compared to the base (null = absent, so inserts,
    * updates and deletes all ride one null-safe comparison), a key
    * changed on one side takes that side's state, a key changed
    * identically on both takes it once, and a key changed DIFFERENTLY
    * on both is a CONFLICT — resolved "ours" (branch A) but flagged
    * per row, so the caller audits instead of silently losing a
    * branch's write. This is the promotion/merge step a multi-team
    * lake needs (dev→main, backfill-branch→serving); at 100 TB it is
    * two key-sharded full-outer joins, no file rewritten outside the
    * merge commit itself. Rows with `present = false` are merged
    * deletes (kept so the audit can count them; filter for content). */
  def threeWayMerge(base: DataFrame, a: DataFrame, b: DataFrame,
      keyName: String, payloadName: String): DataFrame = {
    val kb = base.select(col(keyName).as("k"), col(payloadName).as("vb"))
    val ka = a.select(col(keyName).as("k"), col(payloadName).as("va"))
    val kc = b.select(col(keyName).as("k"), col(payloadName).as("vv"))
    kb.join(ka, Seq("k"), "full_outer")
      .join(kc, Seq("k"), "full_outer")
      .withColumn("changed_a", !(col("va") <=> col("vb")))
      .withColumn("changed_b", !(col("vv") <=> col("vb")))
      .withColumn("conflict", col("changed_a") && col("changed_b") &&
        !(col("va") <=> col("vv")))
      .withColumn("merged",
        when(!col("changed_a") && !col("changed_b"), col("vb"))
          .when(col("changed_a") && !col("changed_b"), col("va"))
          .when(col("changed_b") && !col("changed_a"), col("vv"))
          .otherwise(col("va")))
      .select(col("k").as(keyName), col("merged").as(payloadName),
        col("changed_a"), col("changed_b"), col("conflict"),
        col("merged").isNotNull.as("present"))
  }

  /** Audit row returned by [[vacuum]]. */
  final case class VacuumAudit(droppedManifests: Long, keptManifests: Long,
      deletedShardDirs: Long, keptShardDirs: Long)

  /** Expire snapshots older than `keepFrom` and sweep the data they
    * exclusively own: manifests `< keepFrom` are dropped, then every
    * `files/vN/shard=K` directory NOT referenced by a surviving
    * manifest is deleted. Reachability is computed from manifests, so
    * a v1 shard dir that v2 INHERITED survives a vacuum of v1 — only
    * the superseded copies of rewritten shards go. This is the
    * Iceberg `expire_snapshots` + `remove_orphan_files` pair in one
    * pass; after it, time travel to an expired version fails loudly
    * (its manifest is gone), and every surviving snapshot reads
    * byte-identically (spec-pinned). Driver-side filesystem walk —
    * metadata-sized, never touches file contents. */
  def vacuum(path: String, keepFrom: Int): VacuumAudit = {
    val latest = latestVersion(path)
    require(keepFrom >= 1 && keepFrom <= latest,
      s"keepFrom $keepFrom outside committed range 1..$latest")
    // .toSeq first: collect on a Map producing (dir, shard) pairs would
    // rebuild a MAP keyed by dir and collapse same-dir entries
    val referenced: Set[(String, Int)] =
      (keepFrom to latest).flatMap(v => readManifest(path, v).toSeq.collect {
        case (k, rel) if rel != "-" => (rel, k)
      }).toSet
    var dropped = 0L
    (1 until keepFrom).foreach { v =>
      val m = manifestDir(path).resolve(s"v$v.manifest")
      if (java.nio.file.Files.deleteIfExists(m)) dropped += 1
    }
    val filesRoot = java.nio.file.Paths.get(path, "files")
    var deleted = 0L; var keptDirs = 0L
    if (java.nio.file.Files.isDirectory(filesRoot)) {
      val vDirs = java.nio.file.Files.list(filesRoot).iterator()
      while (vDirs.hasNext) {
        val vDir = vDirs.next()
        val rel = s"files/${vDir.getFileName}"
        val shards = java.nio.file.Files.list(vDir).iterator()
        while (shards.hasNext) {
          val sDir = shards.next()
          val n = sDir.getFileName.toString
          if (n.startsWith("shard=")) {
            if (referenced((rel, n.stripPrefix("shard=").toInt)))
              keptDirs += 1
            else { rmTree(sDir); deleted += 1 }
          }
        }
        if (!java.nio.file.Files.list(vDir).iterator().hasNext)
          java.nio.file.Files.delete(vDir)
      }
    }
    VacuumAudit(dropped, (latest - keepFrom + 1).toLong, deleted, keptDirs)
  }

  private def rmTree(p: java.nio.file.Path): Unit = {
    val it = java.nio.file.Files.walk(p).sorted(
      java.util.Comparator.reverseOrder[java.nio.file.Path]()).iterator()
    while (it.hasNext) java.nio.file.Files.delete(it.next())
  }

  // ---- per-file Bloom sidecar index (c28) -----------------------------
  //
  // Point lookups on a NON-clustering key are the layout's blind spot:
  // parquet min/max stats are tight only on the sort key, so a lookup
  // on any other column scans every file. The lakehouse answer
  // (Delta/Iceberg bloom filter indexes, Parquet's own bloom pages) is
  // a tiny per-file Bloom sidecar: k hash bits per key, OR-folded per
  // file, consulted before the scan — files whose filter misses ANY of
  // a probe's k bits provably do not contain it (no false negatives;
  // false positives only cost an extra file read). The sidecar here is
  // a DataFrame (file, word, bits) — mBits/64 longs per file, built by
  // one distributed pass and small enough to collect/broadcast at any
  // corpus size (it scales with FILE COUNT, not rows).

  /** Bit position of hash function `i` for key column `k` —
    * md5-derived, deterministic in any engine. */
  private def bloomPos(k: Column, i: Int, mBits: Int): Column =
    pmod(graft.functions.Hashes.h60(
      concat(lit(s"bf${i}_"), k.cast("string"))), lit(mBits.toLong))

  /** Build the per-file Bloom sidecar over `keyName` for the parquet
    * lake at `path`: one distributed scan, `kHashes` positions per
    * key, OR-folded into (file, word, bits) rows. */
  def buildBloomIndex(spark: SparkSession, path: String, keyName: String,
      mBits: Int = 4096, kHashes: Int = 5): DataFrame = {
    val base = spark.read.parquet(path)
      .select(input_file_name().as("file"),
        col(keyName).cast("long").as("k"))
    base.select(col("file"), explode(array((0 until kHashes).map(i =>
        bloomPos(col("k"), i, mBits)): _*)).as("pos"))
      .groupBy(col("file"), expr("pos div 64").as("word"))
      .agg(bit_or(expr("shiftleft(1L, cast(pos % 64 as int))")).as("bits"))
  }

  /** The files that MAY contain each probe key: a probe survives for a
    * file iff all `kHashes` of its bits are set there. Returns
    * (k, file) candidate pairs — provably a superset of the true
    * locations. */
  def bloomCandidates(index: DataFrame, probes: DataFrame, keyName: String,
      mBits: Int = 4096, kHashes: Int = 5): DataFrame = {
    // Fold the index to ONE row per (file, word) before probing: the
    // n_hit === n_need test below counts join rows, so a duplicate
    // (file, word) row — e.g. a retried ingest micro-batch re-appending
    // its sidecar — would push n_hit past n_need and silently EXCLUDE a
    // true candidate (a false negative, the one error class a Bloom
    // filter must never make). bit_or is idempotent, so folding is
    // correct for both exact duplicates and genuine re-adds.
    val idx = index.groupBy(col("file"), col("word"))
      .agg(bit_or(col("bits")).as("bits"))
    val need = probes.select(col(keyName).cast("long").as("k"))
      .select(col("k"), explode(array((0 until kHashes).map(i =>
        bloomPos(col("k"), i, mBits)): _*)).as("pos"))
      .select(col("k"), expr("pos div 64").as("word"),
        expr("shiftleft(1L, cast(pos % 64 as int))").as("mask"))
    val nNeeded = need.select(col("k"), col("word"), col("mask")).distinct()
      .groupBy(col("k")).agg(count(lit(1)).as("n_need"))
    broadcast(need.distinct()).join(idx, Seq("word"))
      .filter((col("bits").bitwiseAND(col("mask"))) =!= 0L)
      .groupBy(col("k"), col("file")).agg(count(lit(1)).as("n_hit"))
      .join(broadcast(nNeeded), Seq("k"))
      .filter(col("n_hit") === col("n_need"))
      .select(col("k"), col("file"))
  }

  // ---- per-file zone-map sidecar (c30/st53) ---------------------------
  //
  // The RANGE-predicate twin of the Bloom sidecar: per-file min/max
  // (+ null/row counts) on any column, collected once and consulted
  // before the scan. Parquet keeps these stats per row-group, but only
  // the file listing's own reader sees them file-by-file during
  // planning — an external sidecar makes the prune a driver-side list
  // operation over FILE COUNT rows (Iceberg's manifest stats,
  // Delta's per-file stats in the transaction log). A file whose
  // [mn, mx] misses the predicate interval provably contains no
  // matching row (nulls tracked separately); overlap is a candidate,
  // so the prune is lossless by construction.

  /** Build the per-file zone map over `colName` for the parquet lake
    * at `path`: one distributed scan → (file, mn, mx, n_null, n_rows).
    * Scales with file count, not rows. */
  def buildZoneMap(spark: SparkSession, path: String,
      colName: String): DataFrame =
    spark.read.parquet(path)
      .select(input_file_name().as("file"), col(colName).cast("long").as("v"))
      .groupBy(col("file"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
        count(lit(1)).as("n_rows"))

  /** The files that MAY contain a row with `colName` in [lo, hi]:
    * interval overlap on the sidecar (min/max ignore nulls, so an
    * all-null file has mn/mx null and is excluded — it cannot match a
    * range predicate). Returns the candidate file list — a provable
    * superset of the true locations. */
  def zoneCandidates(zmap: DataFrame, lo: Long, hi: Long): DataFrame =
    zmap.filter(col("mx") >= lit(lo) && col("mn") <= lit(hi))
      .select(col("file"))
}
