package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.Hashes._

/** Document deduplication for training-data pipelines, at 100 TB scale:
  *
  *  - exact: one hash-groupBy (single shuffle on the fingerprint);
  *  - MinHash+LSH: shingle → k minhashes (conditional aggregation, NO
  *    k-way row explosion) → banded signatures → bucket self-join. Only
  *    bucket collisions are ever paired, so cost is O(candidates), not
  *    O(n²);
  *  - SimHash: 60-bit signature via one aggregation with 60 conditional
  *    sums (again no bit-explosion), banded pairing exact for hamming ≤
  *    bands-1;
  *  - n-gram Jaccard: exact similarity via shared-shingle equi-join —
  *    the verification stage downstream of LSH candidates.
  *
  * All hashing is md5-based ([[graft.functions.Hashes]]) so results are
  * engine-portable and oracle-checkable.
  */
object Dedup {

  /** Exact dedup groups: fingerprint → representative (min id) + size. */
  def exactGroups(df: DataFrame, text: Column, id: Column): DataFrame =
    df.groupBy(md5(text).as("fp"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("cnt"))

  /** Corpus snapshot diff — the change-data-feed between two versions
    * of a document set: per id, `added` (new only), `removed` (old
    * only), `changed` (both, content fingerprint differs), `unchanged`.
    * The incremental-curation primitive: downstream stages (dedup,
    * gates, decontamination) re-run on `status <> 'unchanged'` rows
    * only, instead of re-scanning the corpus per snapshot.
    *
    * Scale shape: fingerprints are computed MAP-SIDE, so the full-outer
    * equi-join on id shuffles (id, 16-byte fp) pairs — never document
    * bodies. With both snapshots bucketed by id (the layout a snapshot
    * store would keep anyway), even that shuffle disappears into a
    * co-located join; there is no sort, window, or driver action. */
  def snapshotDiff(old: DataFrame, nw: DataFrame, text: Column,
      id: Column): DataFrame = {
    val o = old.select(id.as("old_id"), md5(text).as("fp_old"))
    val n = nw.select(id.as("new_id"), md5(text).as("fp_new"))
    o.join(n, col("old_id") === col("new_id"), "full_outer")
      .select(coalesce(col("old_id"), col("new_id")).as("doc_id"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("status"))
  }

  /** Distinct word n-gram shingle array per doc, declarative form —
    * `array_distinct` dedupes *within the row*, so no shuffle is spent
    * on `.distinct()` of the exploded form (at 100 TB that shuffle would
    * move every shingle of every document). Kept as the reference
    * semantics ([[graft.functions.ShingleArray]] asserts parity); the
    * query paths use [[nativeShingles]], the same computation as ONE
    * codegen'd kernel (~5× faster — the five nested array expressions
    * here each re-materialize an array per row, and the regex split
    * re-evaluates inside the lambda). */
  def shingleArray(text: Column, n: Int): Column = {
    val w = split(text, " ")
    // Docs with fewer than n tokens have no shingles. The guard matters:
    // sequence(1, 0) yields the DESCENDING array [1, 0] (default step -1),
    // and slice(w, 0, n) then throws INVALID_PARAMETER_VALUE.START.
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array().cast("array<string>"))
  }

  /** Native-expression shingle array (see [[graft.functions.ShingleArray]]). */
  def nativeShingles(df: DataFrame, text: Column, n: Int): Column = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    call_function("graft_shingles", text, lit(n))
  }

  /** Distinct word n-gram shingles: (id, shingle). Narrow — the distinct
    * happens per-row in the shingle kernel. */
  def shingles(df: DataFrame, text: Column, id: Column, n: Int): DataFrame =
    df.select(id.as("doc_id"), explode(nativeShingles(df, text, n)).as("s"))

  /** MinHash signatures, declarative reference semantics: one row per
    * doc with k minhash columns mh0..mh{k-1}. Single shuffle; the k
    * permutations are evaluated as k conditional aggregates over the
    * shingle hash — no explode. The query paths use
    * [[minhashSignaturesNative]], the same values from ONE map-only
    * kernel (MinHashSpec asserts parity). */
  def minhashSignatures(sh: DataFrame, k: Int): DataFrame = {
    val h = sh.select(col("doc_id"), h32(col("s")).as("hw"))
    h.groupBy(col("doc_id"))
      .agg(min(minhashPerm(col("hw"), 0)).as("mh0"),
        (1 until k).map(j => min(minhashPerm(col("hw"), j)).as(s"mh$j")): _*)
  }

  /** MinHash signatures via the native [[graft.functions.MinHashSig]]
    * kernel — (doc_id, sig ARRAY<LONG> of k values), docs with no
    * shingles dropped (the aggregation form produced no row for them).
    * MAP-ONLY: at 100 TB the signature stage shuffles nothing; the
    * first exchange of the dedup pipeline is the banded self-join. */
  def minhashSignaturesNative(df: DataFrame, text: Column, id: Column,
      shingleN: Int, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(id.as("doc_id"),
        call_function("graft_minhash", text, lit(shingleN), lit(k)).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Band-explode of a signature table (doc_id, sig ARRAY<LONG>, ...):
    * (doc_id, band, sig) with sig = the band's k/bands values joined
    * with commas — shared by [[minhashBands]] and the single-pass
    * verified/audited pipelines. */
  private def bandsOf(sig: DataFrame, k: Int, bands: Int): DataFrame = {
    val perBand = k / bands
    sig.select(col("doc_id"), explode(array(
      (0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(",", (0 until perBand).map(r =>
            element_at(col("sig"), b * perBand + r + 1)): _*)
            .as("sig"))
      }: _*)).as("bs"))
      .select(col("doc_id"), col("bs.band").as("band"), col("bs.sig").as("sig"))
  }

  /** Candidate pairs from a banded table: bucket equi-join on
    * (band, sig), smaller id first, distinct. */
  private def candidatesOf(banded: DataFrame): DataFrame = {
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
  }

  /** Banded MinHash signatures: (doc_id, band, sig) — one row per
    * (doc, band), sig = the band's k/bands minhash values joined with
    * commas. The LSH bucket id is (band, sig); docs sharing any bucket
    * are near-dup candidates. Map-only (native signature kernel + a
    * per-row explode) — the shared front half of [[minhashCandidates]]
    * and the streaming ingest-time near-dup (st10), which keys its
    * messages by the bucket. */
  def minhashBands(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame =
    bandsOf(minhashSignaturesNative(df, text, id, shingleN, k), k, bands)

  /** LSH candidate pairs: band the k signatures into `bands` groups of
    * k/bands, bucket by (band, signature), pair within buckets. Exact
    * replication of the signature string lets the oracle reproduce it. */
  def minhashCandidates(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame =
    candidatesOf(minhashBands(df, text, id, shingleN, k, bands))

  /** ONE corpus pass for the verified/audited LSH pipelines: per doc,
    * the k-value minhash signature AND the distinct shingle set from
    * the two native kernels, checkpointed — candidate generation and
    * both sides of the verify joins read the materialization instead
    * of re-scanning the corpus (the naive composition paid 3-6 corpus
    * passes; at 100 TB the re-scans dwarf the tiny candidate joins). */
  private def sigAndShingles(df: DataFrame, text: Column, id: Column,
      shingleN: Int, k: Int): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.select(id.as("doc_id"),
        call_function("graft_minhash", text, lit(shingleN), lit(k)).as("sig"),
        call_function("graft_shingles", text, lit(shingleN)).as("sa"))
      .filter(col("sig").isNotNull)
      .localCheckpoint()
  }

  /** d23 BUILD: the persistable MinHash-LSH band index of a corpus —
    * one `(doc_id, band, sig)` row per doc×band, `bands`·(k/bands)
    * small values per document regardless of its size. Written once
    * as a parquet artifact, this is the text-side analogue of s25's
    * inverted lists: the corpus is LSH'd exactly once, and every
    * future arrival probes the stored bands instead of re-hashing
    * history ([[probeNearDupIndex]]). */
  def lshBandIndex(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    bandsOf(df.select(id.as("doc_id"),
        call_function("graft_minhash", text, lit(shingleN), lit(k))
          .as("sig"))
      .filter(col("sig").isNotNull), k, bands)
  }

  /** d23 PROBE: arrivals near-dup-checked against the STORED band
    * index — incremental MinHash dedup, the c05 idea applied to the
    * NEAR-dup detector: only the arrivals are shingled and banded; the
    * band equi-join against the artifact yields candidate pairs; and
    * the exact-Jaccard verify re-reads BASE TEXT ONLY FOR CANDIDATES
    * (a doc_id semi-join — candidate-sized, never a base re-scan).
    * Per arrival: match count, best Jaccard, verdict — the
    * [[fuzzyDecontaminate]] output shape with the stored index where
    * its bench side was.
    *
    * At 100 TB: nightly arrivals cost O(batch) hashing + a
    * candidate-sized verify; the index grows by appending the
    * arrivals' own bands (the s26 add() move, same parquet-append). */
  def probeNearDupIndex(arrivals: DataFrame, base: DataFrame,
      text: Column, id: Column, index: DataFrame, shingleN: Int = 3,
      k: Int = 16, bands: Int = 4, threshold: Double = 0.5): DataFrame = {
    graft.plans.GraftExtensions.register(arrivals.sparkSession)
    val perArr = arrivals.select(id.as("doc_id"),
        call_function("graft_minhash", text, lit(shingleN), lit(k))
          .as("sig"),
        call_function("graft_shingles", text, lit(shingleN)).as("sa"))
      .filter(col("sig").isNotNull)
      .localCheckpoint()
    val cand = bandsOf(perArr.select(col("doc_id"), col("sig")), k, bands)
      .as("a")
      .join(index.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("aid"), col("b.doc_id").as("bid"))
      .distinct()
    val baseSh = base.select(id.as("bid"), text.as("t"))
      .join(cand.select(col("bid")).distinct(), Seq("bid"))
      .select(col("bid"),
        call_function("graft_shingles", col("t"), lit(shingleN))
          .as("setb"))
    val verified = cand
      .join(perArr.select(col("doc_id").as("aid"), col("sa").as("seta")),
        Seq("aid"))
      .join(baseSh, Seq("bid"))
      .select(col("aid"),
        size(array_intersect(col("seta"), col("setb"))).as("c"),
        size(col("seta")).as("na"), size(col("setb")).as("nb"))
      .select(col("aid"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("j"))
    val roll = verified.filter(col("j") >= threshold)
      .groupBy(col("aid").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"), max(col("j")).as("max_jaccard"))
    perArr.select(col("doc_id"))
      .join(roll, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("max_jaccard"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("is_dup"))
  }

  /** 60-bit SimHash per doc over its distinct whitespace tokens: bit i is
    * set iff more than half the tokens have bit i set in their 60-bit
    * hash. Computed by the native [[graft.functions.SimHash60]] kernel —
    * MAP-ONLY: no token row-explosion, no aggregation, no shuffle. The
    * signature stage of SimHash dedup at 100 TB is embarrassingly
    * parallel and this shape keeps it that way (the declarative
    * explode+60-conditional-sums form shuffled a row per document and
    * materialized a row per token first — [[simhashDeclarative]], kept
    * as the semantic reference, parity-asserted in SimHashSpec). */
  def simhash(df: DataFrame, text: Column, id: Column): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    df.filter(text.isNotNull) // exploded form dropped null docs implicitly
      .select(id.as("doc_id"), call_function("graft_simhash", text).as("simhash"))
  }

  /** Declarative SimHash (the pre-native reference semantics): explode
    * distinct tokens, 60 conditional bit sums, majority vote. */
  def simhashDeclarative(df: DataFrame, text: Column, id: Column): DataFrame = {
    val tokens = df.select(id.as("doc_id"),
      explode(array_distinct(split(text, " "))).as("w"))
    val h = tokens.select(col("doc_id"), h60(col("w")).as("hw"))
    val bitSums = (0 until 60).map(i =>
      sum(shiftright(col("hw"), i).bitwiseAND(lit(1L))).as(s"c$i"))
    val agg = h.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), bitSums: _*)
    val sim = (0 until 60).map(i =>
      when(col(s"c$i") * 2 > col("n"), lit(1L << i)).otherwise(lit(0L)))
      .reduce(_ + _)
    agg.select(col("doc_id"), sim.as("simhash"))
  }

  /** SimHash near-dup pairs with hamming distance ≤ maxDist, found by
    * banding the 60 bits into `bands` chunks — exact (pigeonhole) for
    * maxDist < bands, so no brute-force n² pass. */
  def simhashPairs(sims: DataFrame, maxDist: Int = 3, bands: Int = 4): DataFrame = {
    require(maxDist < bands, "banded pairing is exact only for maxDist < bands")
    val chunkBits = 60 / bands
    val banded = sims.select(col("doc_id"), col("simhash"), explode(array(
      (0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * chunkBits)
            .bitwiseAND(lit((1L << chunkBits) - 1)).as("chunk"))
      }: _*)).as("bc"))
      .select(col("doc_id"), col("simhash"), col("bc.band").as("band"),
        col("bc.chunk").as("chunk"))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.chunk") === col("b.chunk") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  /** Exact n-gram Jaccard similarity for pairs sharing ≥1 shingle,
    * skew-capped: shingles appearing in more than `maxDocFreq` documents
    * are dropped before pairing (a shingle shared by m docs generates
    * m²/2 pairs — at 100 TB a stop-phrase shingle is a cartesian bomb;
    * the cap bounds per-shingle work at maxDocFreq²). Genuine near-dup
    * clusters share *rare* shingles, so a cap comfortably above the
    * expected cluster size (default 100) leaves results unchanged while
    * making the worst case linear in the shingle count.
    *
    * Plan: ONE pass over the shingle pipeline (the old self-join
    * computed it twice), grouped by shingle (shuffle 1), pairs expanded
    * in-group via a double explode — bounded by the cap — then the pair
    * aggregation (shuffle 2). Each shingle row carries its doc's full
    * (uncapped) set size `n`, so |A|, |B| and |A∩B| come out of the one
    * aggregation; the intersection counts capped shingles only, making
    * the score a lower bound of true Jaccard when the cap bites. */
  def jaccardPairs(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, threshold: Double = 0.8,
      maxDocFreq: Int = 100): DataFrame = {
    val sh = df
      .select(id.as("doc_id"), nativeShingles(df, text, shingleN).as("sa"))
      .select(col("doc_id"), size(col("sa")).as("n"),
        explode(col("sa")).as("s"))
    // The cap must apply BEFORE any per-shingle list materializes: a
    // stop-shingle in 10M docs would otherwise build a 10M-element
    // collect_list buffer (in-memory, unspillable) just to be thrown
    // away. A window count over the shingle partition is spill-safe
    // (WindowExec buffers rows in an external, disk-backed array),
    // filters the hot shingles out, and leaves the data partitioned by
    // `s` so the following collect_list — now bounded by the cap —
    // needs no second exchange. One scan, one shuffle to here.
    val shf = sh
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("s"))))
      .filter(col("df") <= maxDocFreq)
    val grouped = shf.groupBy(col("s"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("docs"))
    grouped
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
      .select(col("da"), col("db"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash-LSH candidates VERIFIED by exact Jaccard — the two-stage
    * production dedup pipeline (the shape MinHashLSH is for): stage 1
    * prunes the O(n²) pair space to bucket collisions
    * ([[minhashCandidates]]), stage 2 computes exact n-gram Jaccard for
    * candidates ONLY, so the expensive set intersection runs on
    * O(candidates) pairs instead of every pair sharing any shingle
    * (compare [[jaccardPairs]], which is exact-but-exhaustive and needs
    * the document-frequency cap to stay linear).
    *
    * Stage 2 is two equi-joins of the candidate list against the per-doc
    * shingle ARRAY (bounded by document length, not corpus size) and a
    * per-row `array_intersect` — map-side work after the joins; no
    * per-shingle fan-out ever happens for the verify stage. A pair's
    * exact score decides `dup` (≥ threshold); LSH false positives
    * survive as rows with `dup = false`, which is the observability a
    * recall/precision-tuned dedup wants (drop them with a filter).
    *
    * At 100 TB: candidates ≪ n², both joins shuffle only (candidate ×
    * doc-array) rows, and the intersect cost is per-pair O(|doc|). */
  def lshVerifiedPairs(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.8): DataFrame = {
    val perDoc = sigAndShingles(df, text, id, shingleN, k)
    val cand = candidatesOf(bandsOf(perDoc, k, bands))
    cand
      .join(perDoc.select(col("doc_id").as("da"), col("sa").as("seta")),
        Seq("da"))
      .join(perDoc.select(col("doc_id").as("db"), col("sa").as("setb")),
        Seq("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("seta"), col("setb"))).as("c"),
        size(col("seta")).as("na"), size(col("setb")).as("nb"))
      .select(col("da"), col("db"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
      .withColumn("dup", col("jaccard") >= threshold)
  }

  /** SSJoin dictionary encoding — the shared vocab-id step of
    * d28/d29/d31/d32/d36: encode a (doc_id, s) shingle-occurrence
    * table against its document-frequency-capped vocabulary, returning
    * (doc_id, rk) with the shingle STRING replaced by its global
    * rarity rank. rk is a total order over the surviving vocabulary
    * (unique per shingle), so it IS the token id: every downstream
    * equi-join on the ~20-byte shingle string becomes an equi-join on
    * the 8-byte long — at d28's 100× sweep cell (500k docs) this cut
    * the run's peak spill ~3× (the string-keyed variant overran a
    * 126 GB tmpfs). Rarity order = ascending document frequency, ties
    * by token.
    *
    * Scale shape: the vocab scales near-linearly with the corpus
    * (distinct 3-gram shingles), so neither a single-task
    * `row_number().over(orderBy)` nor a broadcast of the ranked table
    * survives 100× — the rank comes from the bucketed two-exchange
    * [[graft.ops.Ranks.rankedCumsum]] and attaches by a plain
    * vocab-keyed shuffle equi-join (same (c, s) order, identical
    * ranks, maximum parallelism). The result is PINNED: every caller
    * consumes it at least twice (both sides of a verify join), and
    * without the pin each consumer would re-run the shingle explode +
    * vocab join. */
  def cappedTokenIds(sh: DataFrame, maxDocFreq: Int,
      pin: Boolean = true): DataFrame = {
    val dfreq = sh.groupBy(col("s")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxDocFreq)
    val ranked = graft.ops.Ranks.rankedCumsum(dfreq.localCheckpoint(),
        col("c"), col("s"), lit(1L), rankCol = "rk")
      .select(col("s"), col("rk"))
    val enc = sh.join(ranked, Seq("s")).select(col("doc_id"), col("rk"))
    // pin = false when the caller folds the encoded table into a
    // single downstream consumer (d28/d29's sorted-adjacency build):
    // the ranks are deterministic, so the pin there is only a wasted
    // materialization of rows the adjacency aggregate immediately
    // re-shuffles.
    if (pin) enc.localCheckpoint() else enc
  }

  /** Sorted token-adjacency arrays: one row per doc, the doc's token
    * ids ascending — the verify-side representation of the SSJoin
    * family (r18 verdict item 1). One groupBy of the encoded
    * occurrence table replaces, per candidate pair, the re-shuffle of
    * that table by (doc, rk) and the pair-count aggregation: each
    * doc's token set ships ONCE per pair as an 8-byte-element array,
    * the intersection size comes from the codegen'd merge walk
    * (`graft_icount`), and the set size rides along as `size(toks)` —
    * so the (db, rk) exchange of the pair-exploded table, the
    * (da, db) count aggregate and both size-lookup joins disappear
    * from the plan (guide §2.3/§2.4). Ascending `sort_array` order is
    * the rarity order when ids come from [[cappedTokenIds]], so the
    * prefix-filter tokens are exactly the first
    * `prefixLen(size(toks))` elements — the per-doc row_number window
    * (a doc_id shuffle + sort) folds into a `slice`. */
  def sortedAdjacency(encoded: DataFrame): DataFrame =
    encoded.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("rk"))).as("toks"))

  /** Merge-walk |A ∩ B| of two sorted duplicate-free ARRAY<BIGINT>
    * columns (see [[graft.functions.SortedIntersectCount]]). */
  def nativeIntersectCount(df: DataFrame, a: Column, b: Column): Column = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    call_function("graft_icount", a, b)
  }

  /** As [[cappedTokenIds]] but UNORDERED — for consumers that need a
    * unique token id, not a rarity ORDER (d32/d36's intersection
    * counting; d25's posting self-join): there the rank machinery
    * (quantile sketch pass + per-bucket window over the vocab) is
    * pure overhead — measured +1.0-1.8 s per query at sf0.1 when the
    * first cut reused the ranked helper. The id is
    * `monotonically_increasing_id()` on the PINNED vocab: unique by
    * construction (no hash-collision caveat), and the pin freezes the
    * ids so every consumer of the encoded table sees the same
    * dictionary. Same shuffle count as the un-encoded plan — the
    * occurrence⋈vocab attach replaces the old df-cap semi-join
    * one-for-one — and everything downstream shuffles the 8-byte
    * long, never the ~20-byte shingle string (the d28 lesson, minus
    * the order d28 alone needs). */
  def cappedTokenIdsUnordered(sh: DataFrame, maxDocFreq: Int): DataFrame = {
    val vocab = sh.groupBy(col("s")).agg(count(lit(1)).as("c"))
      .filter(col("c") <= maxDocFreq)
      .select(col("s"), monotonically_increasing_id().as("rk"))
      .localCheckpoint()
    // No pin on the encoded occurrence table: unlike d28's multi-
    // ACTION pipeline, these consumers are one action, so Spark's
    // ReusedExchange serves both [[sortedAdjacency]] consumers from
    // one shuffle write — a localCheckpoint here measured as pure
    // added materialization at sf0.1. The vocab pin above IS
    // required: monotonically_increasing_id is only stable once
    // materialized, and unstable ids across the two adjacency join
    // sides would silently corrupt the intersection counts.
    sh.join(vocab, Seq("s")).select(col("doc_id"), col("rk"))
  }

  /** d28: EXACT set-similarity join via PREFIX FILTERING (Chaudhuri
    * et al. 2006 SSJoin / Xiao et al. PPJoin, public) — the exact
    * complement to d02's approximate LSH: every pair with capped-set
    * Jaccard ≥ θ is found, none missed, WITHOUT the all-pairs join.
    * Tokens get one global order (ascending document frequency, ties
    * by token — rarest first); a doc of n tokens indexes only its
    * first n − ⌈θ·n⌉ + 1 tokens in that order, because a qualifying
    * pair must share ≥ ⌈θ·n⌉ tokens and therefore cannot hide its
    * entire overlap in either doc's suffix — so the candidate join
    * runs on the PREFIX inverted lists only, and rare-first ordering
    * makes those lists the shortest ones. The oracle is the NAIVE
    * inverted-list join at the same θ: the hash match IS the
    * losslessness proof. Same df cap (and capped-set Jaccard
    * semantics) as d04's skew story; the vocab rank comes from
    * [[graft.ops.Ranks.rankedCumsum]] (bucket-partitioned, never a
    * single-task window) and attaches via a shuffle equi-join (the
    * vocab grows with the corpus — never broadcast it); the exact
    * verify touches candidates only. */
  def prefixJaccardJoin(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxDocFreq: Int = 100): DataFrame = {
    require(threshold == 0.5,
      "prefix length below is derived for theta = 0.5 (t = ceil(n/2))")
    val sh = df
      .select(id.as("doc_id"), nativeShingles(df, text, shingleN).as("sa"))
      .select(col("doc_id"), explode(col("sa")).as("s"))
    // Sorted-adjacency representation (r18 verdict item 1, guide
    // §2.3/§2.4): the encoded occurrence table collapses into ONE
    // pinned per-doc array of ascending token ids, which then serves
    // every role the old plan paid separate shuffles for — doc sizes
    // (`size(toks)`, was the nc aggregate + two verify joins), the
    // prefix tokens (`slice`, was a row_number window = doc_id
    // shuffle + sort), and both verify sides (one array per pair via
    // the `graft_icount` merge walk, was a (db, rk) re-shuffle of the
    // pair-exploded occurrence table + a (da, db) count aggregate).
    // The pin is the same multi-consumer argument as q63's edge list:
    // adj feeds the prefix derivation and both verify-join sides.
    val adj = sortedAdjacency(cappedTokenIds(sh, maxDocFreq, pin = false))
      .localCheckpoint()
    // theta = 0.5: t = ceil(n/2) = (n+1) div 2; prefix = n - t + 1.
    // Ascending rk IS the rarity order, so the prefix is the head of
    // the sorted array.
    val positioned = adj.select(col("doc_id"),
      explode(slice(col("toks"), lit(1),
        expr("size(toks) - (size(toks) + 1) div 2 + 1"))).as("rk"))
    val cand = positioned.as("a")
      .join(positioned.as("b"),
        col("a.rk") === col("b.rk") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    cand
      .join(adj.select(col("doc_id").as("da"), col("toks").as("ta")),
        Seq("da"))
      .join(adj.select(col("doc_id").as("db"), col("toks").as("tb")),
        Seq("db"))
      .select(col("da"), col("db"),
        nativeIntersectCount(df, col("ta"), col("tb")).as("c"),
        size(col("ta")).as("na"), size(col("tb")).as("nb"))
      .select(col("da"), col("db"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** d29: EXACT containment join (overlap coefficient ≥ θ) — the
    * quote/subset detector Jaccard structurally misses: a short doc
    * fully embedded in a long one has overlap |A∩B|/min(|A|,|B|) = 1
    * but Jaccard ≈ |A|/|B| ≈ 0, so d28 never surfaces it — and
    * embedded duplication (quoted tweets, syndicated ledes, license
    * headers) is exactly what inflates a training corpus.
    *
    * Same SSJoin prefix-filter scheme as [[prefixJaccardJoin]], with
    * the containment-specific bound: if |A∩B| ≥ θ·min(|A|,|B|) and A
    * is the smaller side, then A's first ⌊(1−θ)·|A|⌋+1 rarest
    * shingles must hit B's FULL set — so candidates come from one
    * prefix-vs-full equi-join (both directions covered by joining
    * every doc's prefix against every full posting, pair normalized
    * to (min,max)). Verify is candidate-sized; the final test
    * 5·c ≥ 4·min(na,nb) is integer cross-multiplied. Rarity ranks via
    * the bucketed [[graft.ops.Ranks]] primitive + shuffle equi-join —
    * the same no-single-task-window, no-vocab-broadcast discipline
    * d28 adopted for 100×. The metric is defined over the
    * df ≤ maxDocFreq surviving vocabulary, as in d28 (stopword-grade
    * shingles carry no dedup signal and cap the posting skew). */
  def overlapContainmentJoin(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, threshold: Double = 0.8,
      maxDocFreq: Int = 100): DataFrame = {
    require(threshold == 0.8,
      "prefix length below is derived for theta = 0.8 (5c >= 4*min)")
    val sh = df
      .select(id.as("doc_id"), nativeShingles(df, text, shingleN).as("sa"))
      .select(col("doc_id"), explode(col("sa")).as("s"))
    // Same sorted-adjacency scheme as [[prefixJaccardJoin]] (r18
    // verdict item 1): one pinned per-doc array serves the prefix
    // (slice — the ascending ids ARE the rarity order), the candidate
    // join's FULL posting side (explode of the whole array) and both
    // verify sides (graft_icount merge walk + size(toks)); the nc
    // size table, the row_number window and the pair-exploded
    // (db, rk) re-shuffle are gone from the plan. rk stays the
    // integer token id — no shingle strings past the encode join.
    val adj = sortedAdjacency(cappedTokenIds(sh, maxDocFreq, pin = false))
      .localCheckpoint()
    // theta = 0.8: t = ceil(4n/5); prefix = n - t + 1
    val prefix = adj.select(col("doc_id"),
      explode(slice(col("toks"), lit(1),
        expr("size(toks) - (4 * size(toks) + 4) div 5 + 1"))).as("rk"))
    val full = adj.select(col("doc_id"), explode(col("toks")).as("rk"))
    val cand = prefix.as("a")
      .join(full.as("b"),
        col("a.rk") === col("b.rk") && col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("da"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("db"))
      .distinct()
    cand
      .join(adj.select(col("doc_id").as("da"), col("toks").as("ta")),
        Seq("da"))
      .join(adj.select(col("doc_id").as("db"), col("toks").as("tb")),
        Seq("db"))
      .select(col("da"), col("db"),
        nativeIntersectCount(df, col("ta"), col("tb")).as("c"),
        size(col("ta")).as("na"), size(col("tb")).as("nb"))
      .filter(col("c") * 5 >= least(col("na"), col("nb")) * 4)
      .select(col("da"), col("db"),
        (col("c").cast("double") /
          least(col("na"), col("nb")).cast("double")).as("overlap"))
  }

  /** d30: EXACT edit-distance self-join (Levenshtein ≤ k on a fixed
    * comparison key) via Ed-Join q-gram prefix filtering (Xiao, Wang
    * & Lin, VLDB 2008) — the typo/OCR-noise near-dup detector that
    * set-similarity structurally misses: transposed characters shift
    * every downstream shingle, so two strings one swap apart can share
    * almost no 3-grams yet have edit distance 1.
    *
    * Completeness argument (why the oracle can be the NAIVE all-pairs
    * Levenshtein and still hash-match): one edit changes at most `q`
    * of a string's positional q-grams, so ed(a,b) ≤ k ⟹ the gram
    * multisets overlap in ≥ |Gₐ| − k·q occurrences — and by the SSJoin
    * prefix lemma two such multisets, each sorted by one global order,
    * must share a gram VALUE within their first k·q+1 occurrences.
    * Candidates therefore come from an equi-join on the k·q+1 RAREST
    * grams per string; the exact Levenshtein verify (both engines'
    * builtin) touches candidates only. False positives die in verify;
    * false negatives are impossible, which the randomized-mutation
    * parity spec re-proves against the in-Spark naive join.
    *
    * Scale shape: the rarity order is (global count, gram) attached by
    * a vocab-keyed shuffle equi-join — no rank table, no broadcast, no
    * single-task window (the only window is per-doc). Prefix filtering
    * keeps hot grams out of the inverted lists by construction (a
    * frequent gram is almost never among a string's k·q+1 rarest), so
    * the candidate join carries no skew. Pairing is within `lang` —
    * the partition a cross-language corpus dedups inside anyway.
    * Comparison key = first `prefixLen` chars: edit-distance dedup at
    * corpus scale is a short-key operation (titles, URLs, ledes);
    * banding full documents is d02/d28's job. */
  def editDistanceJoin(df: DataFrame, text: Column, id: Column,
      lang: Column, prefixLen: Int = 32, k: Int = 2,
      q: Int = 4): DataFrame = {
    val minLen = k * q + q  // gram count ≥ kq+1 ⟹ count filter non-vacuous
    // The no-false-negative guarantee needs the COMPARISON KEY (the
    // prefixLen-char substring, not the full text) to carry at least
    // k·q+1 grams, i.e. prefixLen ≥ k·q+q; a shorter key would
    // silently void completeness for long texts that pass minLen.
    require(prefixLen >= minLen,
      s"editDistanceJoin: prefixLen=$prefixLen < k*q+q=$minLen — the " +
        "comparison key could carry fewer than k*q+1 q-grams and the " +
        "rarest-gram prefix filter would no longer be complete")
    val s = df.filter(length(text) >= minLen)
      .select(id.as("doc_id"), lang.as("lang"),
        substring(text, 1, prefixLen).as("t"))
    // positional q-grams of the comparison key
    val grams = s.select(col("doc_id"), col("lang"),
        posexplode(expr(
          s"transform(sequence(1, length(t) - ${q - 1}), " +
            s"i -> substring(t, i, $q))")).as(Seq("pos", "g")))
    val cnt = grams.groupBy(col("g")).agg(count(lit(1)).as("c"))
    // k·q+1 rarest occurrences per string, order (c, g) global + pos tiebreak
    val prefix = grams.join(cnt, Seq("g"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("doc_id"))
          .orderBy(col("c"), col("g"), col("pos"))))
      .filter(col("rn") <= k * q + 1)
      .select(col("doc_id"), col("lang"), col("g"))
    val cand = prefix.as("a")
      .join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.lang") === col("b.lang") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .distinct()
    // Banded verify: the 3-arg levenshtein computes the k-banded DP
    // (O(k·n) per pair, -1 when the distance exceeds k) — the exact
    // distance whenever it is ≤ k, which is the only case kept.
    cand
      .join(s.select(col("doc_id").as("da"), col("t").as("ta")), Seq("da"))
      .join(s.select(col("doc_id").as("db"), col("t").as("tb")), Seq("db"))
      .select(col("da"), col("db"),
        levenshtein(col("ta"), col("tb"), k).cast("long").as("ed"))
      .filter(col("ed") >= 0)
  }

  /** d32: MINHASH FIDELITY TABLE — the sketch-accuracy audit for the
    * d02 pipeline: over the LSH candidate pairs, group by the number
    * of agreeing minhash positions (the estimator's numerator, 0..16)
    * and report the MICRO-AVERAGED exact Jaccard per group — ratio of
    * integer sums Σ|A∩B| / Σ|A∪B|, never a float mean (unordered
    * float summation is engine-nondeterministic; integer sums are
    * exact). One row per agreement level turns "E[matches/k] =
    * Jaccard" from folklore into a measured calibration curve — what
    * you consult before trusting a k=16 sketch to steer a 100 TB
    * dedup. Candidates and signatures come from the proven d02
    * kernels; the exact verify is candidate-sized (d04's capped
    * intersection semantics). */
  def minhashFidelity(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      maxDocFreq: Int = 100): DataFrame = {
    val cand = minhashCandidates(df, text, id, shingleN, k, bands)
    val sig = minhashSignaturesNative(df, text, id, shingleN, k)
    val withSigs = cand
      .join(sig.select(col("doc_id").as("da"), col("sig").as("siga")),
        Seq("da"))
      .join(sig.select(col("doc_id").as("db"), col("sig").as("sigb")),
        Seq("db"))
      .withColumn("mh_matches", expr(
        "aggregate(zip_with(siga, sigb, (x, y) -> " +
          "IF(x = y, 1L, 0L)), 0L, (a, v) -> a + v)"))
    val sh = shingles(df, text, id, shingleN)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Capped exact verify over the dictionary-encoded occurrence
    // table ([[cappedTokenIdsUnordered]]), folded into sorted
    // adjacency arrays like d28/d29 (r18 verdict item 1): each doc's
    // capped token set ships once per candidate pair and the
    // intersection size is the graft_icount merge walk — the
    // (db, rk) re-shuffle of the pair-exploded table and the (da, db)
    // count aggregate are gone. LEFT joins + coalesce keep the old
    // left-join/fill(0) semantics for docs whose tokens were all
    // df-capped away. `sizes` stays UNCAPPED (full per-doc shingle
    // counts), exactly as before: only the intersection is df-capped.
    val adjf = sortedAdjacency(cappedTokenIdsUnordered(sh, maxDocFreq))
    withSigs
      .join(adjf.select(col("doc_id").as("da"), col("toks").as("ta")),
        Seq("da"), "left")
      .join(adjf.select(col("doc_id").as("db"), col("toks").as("tb")),
        Seq("db"), "left")
      .withColumn("c", coalesce(
        nativeIntersectCount(df, col("ta"), col("tb")), lit(0L)))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")),
        Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")),
        Seq("db"))
      .groupBy(col("mh_matches"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c")).as("inter_sum"),
        sum(col("na") + col("nb") - col("c")).as("union_sum"))
      .select(col("mh_matches"), col("n_pairs"), col("inter_sum"),
        col("union_sum"),
        (col("inter_sum").cast("double") /
          col("union_sum").cast("double")).as("micro_jaccard"))
  }

  /** d36: MINHASH-TO-CONTAINMENT calibration — d32's fidelity table
    * for the ASYMMETRIC measure d29 serves: per signature-agreement
    * level g (matching minhash components of k=16), the micro-averaged
    * EXACT containment (pooled Σ|A∩B| / Σ min(|A|,|B|)) next to the
    * containment the signatures IMPLY — from Ĵ = g/k and the identity
    * |A∩B| = Ĵ·(|A|+|B|)/(1+Ĵ), pooled with Ĵ constant per level:
    * est = g·Σ(|A|+|B|) / ((k+g)·Σmin) — exact integer numerator and
    * denominator, one final divide each (the d32 discipline: integer
    * sums, never float means). The table answers "at what band
    * agreement can the cheap signature stand in for d29's exact
    * containment join" — the dial for running containment screening
    * at 100 TB from the stored d23 band index alone. Same candidate
    * generation, signatures and exact-verify joins as d32. */
  def containmentFidelity(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      maxDocFreq: Int = 100): DataFrame = {
    val cand = minhashCandidates(df, text, id, shingleN, k, bands)
    val sig = minhashSignaturesNative(df, text, id, shingleN, k)
    val withSigs = cand
      .join(sig.select(col("doc_id").as("da"), col("sig").as("siga")),
        Seq("da"))
      .join(sig.select(col("doc_id").as("db"), col("sig").as("sigb")),
        Seq("db"))
      .withColumn("mh_matches", expr(
        "aggregate(zip_with(siga, sigb, (x, y) -> " +
          "IF(x = y, 1L, 0L)), 0L, (a, v) -> a + v)"))
    val sh = shingles(df, text, id, shingleN)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    // Sorted-adjacency capped verify, same shape (and same LEFT-join/
    // coalesce(0) semantics) as [[minhashFidelity]] — see the comment
    // there. `sizes` stays UNCAPPED, as before.
    val adjf = sortedAdjacency(cappedTokenIdsUnordered(sh, maxDocFreq))
    withSigs
      .join(adjf.select(col("doc_id").as("da"), col("toks").as("ta")),
        Seq("da"), "left")
      .join(adjf.select(col("doc_id").as("db"), col("toks").as("tb")),
        Seq("db"), "left")
      .withColumn("c", coalesce(
        nativeIntersectCount(df, col("ta"), col("tb")), lit(0L)))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")),
        Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")),
        Seq("db"))
      .groupBy(col("mh_matches"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("c")).as("inter_sum"),
        sum(least(col("na"), col("nb"))).as("min_sum"),
        sum(col("na") + col("nb")).as("size_sum"))
      .select(col("mh_matches"), col("n_pairs"), col("inter_sum"),
        col("min_sum"),
        (col("inter_sum").cast("double") /
          col("min_sum").cast("double")).as("exact_containment"),
        (col("mh_matches") * col("size_sum")).as("est_num"),
        ((col("mh_matches") + lit(k.toLong)) * col("min_sum"))
          .as("est_den"))
      .withColumn("est_containment",
        col("est_num").cast("double") / col("est_den").cast("double"))
  }

  /** d31: DEDUP PRESSURE CURVE — corpus survival as a function of the
    * Jaccard threshold: for each candidate θ, how many exact-verified
    * near-dup pairs fire, how many documents the first-seen-wins keep
    * policy removes (distinct later-id members of a ≥θ pair — d02/
    * st10's policy), and what share of the corpus survives. This is
    * the OTHER axis of d27's tuning table: d27 fixes θ and tunes the
    * LSH banding; this fixes nothing and answers "what does each
    * notch of dedup aggressiveness COST in corpus size" — the number
    * a data-mix owner signs off on before a 100 TB dedup run.
    *
    * One exact pair materialization (d04's capped inverted-list
    * shape, integer (c, na, nb) kept pre-division) serves every rung;
    * the threshold test is the integer cross-multiplication
    * 1000·c ≥ θ·(na+nb−c), so rows land in rungs bit-exactly. */
  def dedupPressure(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3,
      thetasMilli: Seq[Int] = Seq(500, 600, 700, 800),
      maxDocFreq: Int = 100): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val sh = df
      .select(id.as("doc_id"), nativeShingles(df, text, shingleN).as("sa"))
      .select(col("doc_id"), size(col("sa")).as("n"),
        explode(col("sa")).as("s"))
    val shf = sh
      .withColumn("df", count(lit(1))
        .over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("s"))))
      .filter(col("df") <= maxDocFreq)
    val grouped = shf.groupBy(col("s"))
      .agg(collect_list(struct(col("doc_id"), col("n"))).as("docs"))
    val pairs = grouped
      .select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("da"), col("b.doc_id").as("db"))
      .agg(count(lit(1)).as("c"),
        min(col("a.n")).as("na"), min(col("b.n")).as("nb"))
    val nDocs = df.select(id).distinct().count()
    val th = thetasMilli.map(_.toLong).toDF("theta_milli")
    val agg = pairs.crossJoin(broadcast(th))
      .filter(col("c") * 1000L >=
        col("theta_milli") * (col("na") + col("nb") - col("c")))
      .groupBy(col("theta_milli"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("db")).as("n_removed"))
    th.join(agg, Seq("theta_milli"), "left")
      .na.fill(0L, Seq("n_pairs", "n_removed"))
      .select(col("theta_milli"), col("n_pairs"), col("n_removed"),
        (lit(nDocs) - col("n_removed")).as("n_kept"),
        ((lit(nDocs) - col("n_removed")).cast("double") /
          lit(nDocs.toDouble)).as("kept_share"))
  }

  /** d27: the (bands × rows) TUNING TABLE for MinHash-LSH — the s37
    * "dial measured" idea on the dedup side: every banding of the same
    * k=16 signatures trades recall for candidate volume (more bands of
    * fewer rows ⇒ more collisions ⇒ higher recall, lower precision),
    * and this emits the measured table per configuration: candidate
    * count, true-pair hits, precision, recall — the numbers one
    * consults before committing a 100 TB dedup to a banding, instead
    * of the 1−(1−s^r)^b folklore curve.
    *
    * Ground truth = exact-Jaccard-verified pairs within the FINEST
    * config's candidate universe: contiguous banding makes an
    * r·2-row band collision exactly the conjunction of its two r-row
    * halves, so every coarser config's candidate set is a SUBSET of
    * the finest's — the universe covers all configs and recall is
    * measured against all true pairs any of them could surface.
    * Signatures and shingle sets come from the one-pass kernels
    * (checkpointed, corpus scanned once); each config costs one banded
    * equi-join; the verify is candidate-sized. */
  def bandTuningTable(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bandConfigs: Seq[Int] = Seq(8, 4, 2),
      threshold: Double = 0.5): DataFrame = {
    require(bandConfigs.forall(b => k % b == 0), s"bands must divide $k")
    val perDoc = sigAndShingles(df, text, id, shingleN, k)
    val sigOnly = perDoc.select(col("doc_id"), col("sig"))
    val cands = bandConfigs.map(b =>
      b -> candidatesOf(bandsOf(sigOnly, k, b)).localCheckpoint()).toMap
    val truth = cands(bandConfigs.max)
      .join(perDoc.select(col("doc_id").as("da"), col("sa").as("seta")),
        Seq("da"))
      .join(perDoc.select(col("doc_id").as("db"), col("sa").as("setb")),
        Seq("db"))
      .select(col("da"), col("db"),
        size(array_intersect(col("seta"), col("setb"))).as("c"),
        size(col("seta")).as("na"), size(col("setb")).as("nb"))
      .filter(col("c").cast("double") /
        (col("na") + col("nb") - col("c")) >= threshold)
      .select(col("da"), col("db"))
      .localCheckpoint()
    bandConfigs.map { b =>
      val c = cands(b)
      c.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(truth.agg(count(lit(1)).as("n_true")))
        .crossJoin(c.join(truth, Seq("da", "db"))
          .agg(count(lit(1)).as("n_hits")))
        .select(lit(b.toLong).as("bands"),
          lit((k / b).toLong).as("rows_per_band"),
          col("n_candidates"), col("n_true"), col("n_hits"),
          when(col("n_candidates") > 0L,
            col("n_hits").cast("double") /
              col("n_candidates").cast("double")).as("precision"),
          when(col("n_true") > 0L,
            col("n_hits").cast("double") / col("n_true").cast("double"))
            .as("recall"))
    }.reduce(_ unionByName _)
  }

  /** MinHash-estimator audit over the LSH candidate pairs — the
    * tuning-loop observability for a banded dedup: per candidate pair,
    * the signature-agreement estimate of Jaccard (`n_eq/k`, the
    * textbook MinHash estimator) NEXT TO the exact n-gram Jaccard, so
    * the band/row configuration can be tuned against measured
    * estimator error instead of folklore (est ≫ exact ⇒ too few
    * permutations; systematic est < threshold on true dups ⇒ band
    * shape too strict).
    *
    * Cost shape: everything is already paid for by the dedup itself —
    * signatures come from the map-only native kernel, candidates from
    * the banded self-join, and the exact side is the same two
    * candidate×doc-array equi-joins as [[lshVerifiedPairs]]. `n_eq` is
    * a per-row zip_with fold over two k-arrays; no new shuffle beyond
    * the verify joins. */
  def minhashEstimatePairs(df: DataFrame, text: Column, id: Column,
      shingleN: Int = 3, k: Int = 16, bands: Int = 4): DataFrame = {
    val perDoc = sigAndShingles(df, text, id, shingleN, k)
    val cand = candidatesOf(bandsOf(perDoc, k, bands))
    val nEq = aggregate(
      zip_with(col("siga"), col("sigb"),
        (x, y) => when(x === y, 1L).otherwise(0L)),
      lit(0L), (acc, v) => acc + v)
    cand
      .join(perDoc.select(col("doc_id").as("da"), col("sig").as("siga"),
        col("sa").as("seta")), Seq("da"))
      .join(perDoc.select(col("doc_id").as("db"), col("sig").as("sigb"),
        col("sa").as("setb")), Seq("db"))
      .select(col("da"), col("db"), nEq.as("n_eq"),
        size(array_intersect(col("seta"), col("setb"))).as("c"),
        size(col("seta")).as("na"), size(col("setb")).as("nb"))
      .select(col("da"), col("db"), col("n_eq"),
        (col("n_eq").cast("double") / lit(k.toDouble)).as("est_jaccard"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("jaccard"))
  }

  /** Benchmark decontamination: for every training document, how much of
    * its shingle set also appears in a held-out benchmark/eval corpus
    * (the n-gram-overlap decontamination step every LLM training pipeline
    * runs before training — cf. GPT-3 App. C / PaLM §6-style 8-gram
    * collision checks; 3-gram here to match the corpus fixtures).
    *
    * Scale shape: the two sides come from two *filtered* scans — the
    * `isBench` predicate is applied before shingling on each branch, so
    * the bench-side scan reads only the (KBs-to-MBs) eval split under
    * predicate pushdown while the train side scans the corpus once. The
    * benchmark's distinct shingle set is broadcast when small — the
    * textbook broadcast side — so the per-doc hit count is a map-side
    * join + one aggregation on doc_id; an oversized bench split falls
    * back to a shuffle join instead of OOMing the driver
    * (`maxBroadcastShingles`). No shuffle touches the full train shingle
    * stream except the final per-doc groupBy.
    *
    * Output: (doc_id, n_shingles, n_shared, contam_ratio, contaminated)
    * for every training doc with ≥1 shingle; ratio is one IEEE divide of
    * two exact integers, so the oracle matches bit-for-bit. */
  def decontaminate(df: DataFrame, text: Column, id: Column,
      isBench: Column, shingleN: Int = 3,
      threshold: Double = 0.5,
      maxBroadcastShingles: Long = 10_000_000L): DataFrame = {
    def shingleStream(side: DataFrame) = side
      .select(id.as("doc_id"), nativeShingles(side, text, shingleN).as("sa"))
      .select(col("doc_id"),
        size(col("sa")).cast("long").as("n"), explode(col("sa")).as("s"))
    val bench = shingleStream(df.filter(isBench)).select(col("s")).distinct()
    // Broadcast only within a sanity bound: the bench split is small by
    // contract, but its size is data-dependent on the caller's predicate
    // — counting it first costs one job over the (filtered, tiny) bench
    // scan and buys a guaranteed-safe fallback to a shuffle join.
    val benchSide = bench.withColumn("hit", lit(1))
    val joinSide =
      if (bench.count() <= maxBroadcastShingles) broadcast(benchSide)
      else benchSide
    shingleStream(df.filter(!isBench))
      .join(joinSide, Seq("s"), "left")
      .groupBy(col("doc_id"), col("n").as("n_shingles"))
      .agg(sum(coalesce(col("hit"), lit(0))).as("n_shared"))
      .select(col("doc_id"), col("n_shingles"), col("n_shared"),
        (col("n_shared").cast("double") / col("n_shingles").cast("double"))
          .as("contam_ratio"))
      .withColumn("contaminated", col("contam_ratio") >= threshold)
  }

  /** FUZZY decontamination — [[decontaminate]]'s near-dup complement.
    * Exact shingle overlap misses lightly-paraphrased eval leakage; the
    * fuzzy pass runs the d11 two-stage machinery BIPARTITE: MinHash
    * bands on both splits, train×bench bucket collisions as the only
    * candidate pairs, exact Jaccard verify on candidates, then a
    * per-train-doc verdict (GPT-3 App. C's fuzzy-collision check,
    * 3-gram/0.5 to match the corpus fixtures).
    *
    * Scale shape: ONE checkpointed pass computes both native kernels
    * for both splits; the candidate join is bench-bucket-sized (the
    * eval suite is small by contract, so collisions are rare and the
    * join never approaches train×train volume); verify joins ship
    * shingle arrays only for candidate pairs; the final left join
    * keys on doc_id. Every train doc with ≥1 shingle gets a row —
    * false-positive candidates survive as n_matches = 0, the same
    * observability contract as [[lshVerifiedPairs]]. */
  def fuzzyDecontaminate(df: DataFrame, text: Column, id: Column,
      isBench: Column, shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val perDoc = df.select(id.as("doc_id"), isBench.as("is_bench"),
        call_function("graft_minhash", text, lit(shingleN), lit(k)).as("sig"),
        call_function("graft_shingles", text, lit(shingleN)).as("sa"))
      .filter(col("sig").isNotNull)
      .localCheckpoint()
    val bandedT = bandsOf(perDoc.filter(!col("is_bench")), k, bands)
    val bandedB = bandsOf(perDoc.filter(col("is_bench")), k, bands)
    val cand = bandedT.as("a").join(bandedB.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig"))
      .select(col("a.doc_id").as("tid"), col("b.doc_id").as("bid"))
      .distinct()
    val verified = cand
      .join(perDoc.select(col("doc_id").as("tid"), col("sa").as("seta")),
        Seq("tid"))
      .join(perDoc.select(col("doc_id").as("bid"), col("sa").as("setb")),
        Seq("bid"))
      .select(col("tid"),
        size(array_intersect(col("seta"), col("setb"))).as("c"),
        size(col("seta")).as("na"), size(col("setb")).as("nb"))
      .select(col("tid"),
        (col("c").cast("double") / (col("na") + col("nb") - col("c")))
          .as("j"))
    val perTrain = verified.filter(col("j") >= threshold)
      .groupBy(col("tid").as("doc_id"))
      .agg(count(lit(1)).as("n_matches"), max(col("j")).as("max_jaccard"))
    perDoc.filter(!col("is_bench")).select(col("doc_id"))
      .join(perTrain, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_matches"), lit(0L)).as("n_matches"),
        col("max_jaccard"),
        (coalesce(col("n_matches"), lit(0L)) > 0).as("fuzzy_contaminated"))
  }

  /** Bloom-filter decontamination + measured false-positive audit —
    * the O(m)-state variant of [[decontaminate]] (Bloom 1970). The
    * benchmark's shingles are folded into an m-bit filter (k
    * deterministic md5-derived positions per shingle; the bit set is
    * modeled as the ≤ m distinct positions, so the broadcast side is
    * BOUNDED BY CONSTRUCTION — at 100 TB the filter stays m bits while
    * [[decontaminate]]'s bench set grows with the benchmark). A probe
    * shingle "bloom-hits" iff ALL k positions are set — which admits
    * exactly the false-positive semantics a real deployment has, so
    * the operator ALSO carries the exact join and reports the measured
    * FP count per doc, the d13/s09/t14 estimator-audit pattern.
    * Everything is exact integer arithmetic on md5 prefixes — both
    * engines compute the identical filter, hence identical false
    * positives. */
  def bloomDecontaminate(df: DataFrame, text: Column, id: Column,
      isBench: Column, shingleN: Int = 3, mBits: Int = 4096,
      kHash: Int = 3,
      maxBroadcastShingles: Long = 10_000_000L): DataFrame = {
    def shingleStream(side: DataFrame) = side
      .select(id.as("doc_id"), nativeShingles(side, text, shingleN).as("sa"))
      .select(col("doc_id"),
        size(col("sa")).cast("long").as("n"), explode(col("sa")).as("s"))
    def positions(s: Column): Column = array((0 until kHash).map { j =>
      conv(substring(md5(concat_ws("_", lit(j.toString), s)), 1, 8), 16, 10)
        .cast("long") % mBits }: _*)
    // One materialization of the bench distinct-shingle set — the count
    // guard, the filter-bit derivation, and the exact-probe join are
    // three separate actions that would otherwise each re-run the
    // shingle explode + distinct shuffle (the sigAndShingles pattern).
    val bench = shingleStream(df.filter(isBench)).select(col("s")).distinct()
      .localCheckpoint()
    val filterBits = bench
      .select(explode(positions(col("s"))).as("pos")).distinct()
    val benchSide = bench.withColumn("hit", lit(1))
    val joinSide =
      if (bench.count() <= maxBroadcastShingles) broadcast(benchSide)
      else benchSide
    probeStreamWithAudit(shingleStream(df.filter(!isBench)), joinSide,
      filterBits, positions, kHash)
  }

  private def probeStreamWithAudit(probe: DataFrame, joinSide: DataFrame,
      filterBits: DataFrame, positions: Column => Column,
      kHash: Int): DataFrame = {
    val perShingle = probe
      .join(joinSide, Seq("s"), "left")
      .select(col("doc_id"), col("n"), col("s"),
        coalesce(col("hit"), lit(0)).cast("long").as("exact_hit"),
        explode(positions(col("s"))).as("pos"))
      // the filter is ≤ mBits rows — broadcast unconditionally
      .join(broadcast(filterBits.withColumn("inb", lit(1))),
        Seq("pos"), "left")
      .groupBy(col("doc_id"), col("n"), col("s"), col("exact_hit"))
      .agg(min(coalesce(col("inb"), lit(0))).cast("long").as("bloom_hit"))
    perShingle.groupBy(col("doc_id"), col("n").as("n_shingles"))
      .agg(sum(col("exact_hit")).as("n_exact"),
        sum(col("bloom_hit")).as("n_bloom"))
      .select(col("doc_id"), col("n_shingles"), col("n_exact"),
        col("n_bloom"), (col("n_bloom") - col("n_exact")).as("n_false_pos"))
  }

  /** Duplicate-passage statistics — the positional window variant of
    * exact substring dedup (Lee et al. 2022, "Deduplicating Training
    * Data Makes Language Models Better": suffix-array 50-token windows;
    * here n-word sliding windows, the same signal at fixture scale).
    * Unlike [[jaccardPairs]] this is NOT set-based: every window
    * occurrence counts, so a doc that repeats a passage taken from an
    * earlier doc scores on every occurrence.
    *
    * A window in doc D is *duplicated* iff the identical n-gram occurs
    * in some document with a smaller doc_id (first-writer-keeps, the
    * deterministic tie-break a re-runnable pipeline needs). min(doc_id)
    * per gram comes from a window-function count over the gram partition
    * — spill-safe (WindowExec external buffer), no per-gram list ever
    * materializes, same shape as the d04 df-cap — followed by the
    * per-doc aggregation. Two shuffles total, both on bounded rows. */
  def windowDupStats(df: DataFrame, text: Column, id: Column,
      windowN: Int = 8): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    // positional (non-distinct) windows — occurrences matter here; the
    // native kernel's distinct=false mode, one pass per row
    val wins = call_function("graft_shingles", text, lit(windowN), lit(false))
    val grams = df.select(id.as("doc_id"), explode(wins).as("g"))
    val owner = min(col("doc_id"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("g")))
    grams.withColumn("owner", owner)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("owner") < col("doc_id"), 1L).otherwise(0L))
          .as("n_dup_windows"))
      .select(col("doc_id"), col("n_windows"), col("n_dup_windows"),
        (col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
          .as("dup_frac"))
  }

  /** Maximal duplicated-substring spans — the span-granular half of
    * exact substring dedup (Lee et al. 2022's ExactSubstr removes the
    * duplicated BYTES, not the whole doc; `/root/reference` has no
    * analogue — this is the additive pipeline surface). Where
    * [[windowDupStats]] (d10) reports per-doc ratios, this returns the
    * actual spans: for every run of consecutive duplicated windows in a
    * doc, the word offset and length, ready for span excision.
    *
    * A window at word offset p (length `windowN`) is *duplicated* iff
    * the identical n-gram occurs in a smaller doc_id (first-writer-keeps,
    * d10's tie-break). Consecutive duplicated offsets merge by the
    * classic islands trick: `pos - row_number()` is constant within a
    * run, so one per-doc window + one groupBy recovers maximal spans —
    * no self-join, no per-gram list. `minWindows` drops short islands
    * (a span of w windows covers w + windowN - 1 words).
    *
    * Scale shape: the gram-ownership window is d10's spill-safe
    * WindowExec (partition by gram — keys are near-unique, the skewed
    * boilerplate grams are exactly the df-cap story documented there);
    * the island window partitions by doc_id over DUPLICATED windows
    * only — bounded by doc length, no corpus-wide sort anywhere. */
  def dupSpans(df: DataFrame, text: Column, id: Column,
      windowN: Int = 8, minWindows: Int = 2): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val wins = call_function("graft_shingles", text, lit(windowN), lit(false))
    val grams = df.select(id.as("doc_id"), posexplode(wins).as(Seq("pos", "g")))
    val owner = min(col("doc_id"))
      .over(org.apache.spark.sql.expressions.Window.partitionBy(col("g")))
    val dup = grams.withColumn("owner", owner)
      .where(col("owner") < col("doc_id"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"))
    val rn = row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos")))
    dup.withColumn("island", col("pos") - rn)
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) - min(col("pos")) + windowN).as("span_words"),
        count(lit(1)).as("n_windows"))
      .where(col("n_windows") >= minWindows)
      .select(col("doc_id"), col("span_start"), col("span_words"),
        col("n_windows"))
  }

  /** Duplicated-span REMOVAL — the actionable cleaning step on top of
    * [[dupSpans]]: Lee et al. 2022 apply exactly this surgery (cut
    * the repeated span from every non-owning document, keep the rest
    * of the doc — dropping whole documents for one repeated paragraph
    * throws away good text). Non-owning spans' word positions explode
    * into a removal set (spans from DIFFERENT islands can overlap
    * when their window runs sit closer than windowN — hence the
    * distinct), the doc's words anti-join it, and survivors
    * re-assemble in position order. A doc losing every word survives
    * with empty text (left join from the corpus), so the operator is
    * total.
    *
    * Scale shape: after dupSpans' own window, everything is keyed by
    * doc_id — the word explode fans out to O(words) rows but both the
    * anti-join and the rebuild aggregate on doc_id with map-side
    * partials; no self-join, no cross-doc shuffle. */
  def removeDupSpans(df: DataFrame, text: Column, id: Column,
      windowN: Int = 8, minWindows: Int = 2): DataFrame = {
    val rm = dupSpans(df, text, id, windowN, minWindows)
      .select(col("doc_id"), explode(sequence(col("span_start"),
        col("span_start") + col("span_words") - lit(1L))).as("pos"))
      .distinct()
    val words = df.select(id.as("doc_id"),
        posexplode(split(text, " ")).as(Seq("pos", "w")))
      .withColumn("pos", col("pos").cast("long"))
    val kept = words.join(rm, Seq("doc_id", "pos"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          sort_array(collect_list(struct(col("pos"), col("w")))),
          s => s("w")), " ").as("clean_text"))
    df.select(id.as("doc_id"),
        size(split(text, " ")).cast("long").as("n_words"))
      .join(kept, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_words"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_words") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Connected-component dedup clusters: near-duplicate PAIRS (from any
    * of the pair generators above) are only half the job — training-data
    * dedup keeps ONE representative per transitive group (a~b, b~c ⇒
    * {a,b,c} even when a,c never paired). Output: (doc_id, cluster)
    * for EVERY id in `allIds`, cluster = min doc_id of the component;
    * singletons map to themselves.
    *
    * Iterative min-label propagation WITH pointer jumping: each round
    * (a) joins labels to the symmetric edge list and takes the
    * per-node min (one hop), then (b) adopts the label's own current
    * label (label(label(v)) — the shortcut of Kiveris et al.'s
    * star-contraction family), so a chain's surviving label distance
    * HALVES per round and convergence is O(log diameter) rounds, not
    * O(diameter). Dedup graphs are usually near-cliques from bucket
    * co-membership (2-3 rounds), but long chains are exactly what
    * templated corpora produce at scale — A≈B≈C drifting one edit per
    * hop — and a 30× synthetic sweep drove the plain one-hop loop
    * past its round cap (BASELINE.md round-15 sweep) while this form
    * converges in ≤7. Per-round `localCheckpoint` truncates the
    * growing lineage; labels only decrease, so a stable checksum ==
    * fixpoint. */
  def connectedComponents(pairs: DataFrame, allIds: DataFrame,
      id: Column, maxIter: Int = 20): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("da").as("src"), col("db").as("dst"))
      .union(pairs.select(col("db").as("src"), col("da").as("dst")))
      .localCheckpoint()
    var labels = allIds.select(id.cast("long").as("id"))
      .distinct().withColumn("lbl", col("id")).localCheckpoint()
    // Overflow-safe convergence checksum (labels are non-increasing).
    def checksum(df: DataFrame): java.math.BigDecimal = df
      .agg(sum(col("lbl").cast("decimal(38,0)"))).head().getDecimal(0)
    var prev = checksum(labels)
    var iter = 0
    var done = prev == null // empty id set: sum() is null, nothing to do
    while (!done) {
      iter += 1
      require(iter <= maxIter,
        s"connected components did not converge in $maxIter rounds")
      val propagated = edges.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("lbl"))
      val hopped = labels.select(col("id"), col("lbl")).union(propagated)
        .groupBy(col("id")).agg(min(col("lbl")).as("lbl"))
        .localCheckpoint()
      // Pointer jumping: v also adopts label(label(v)). Every label IS
      // a node id (labels start as id→id and only move to smaller
      // EXISTING ids via min), so the lookup always matches — inner.
      // The jump table is rebuilt as a fresh projection (toDF) rather
      // than a direct self-join alias: the checkpointed plan self-
      // joined against itself trips Union constraint rewriting on
      // LocalRelation inputs (key-not-found on the dedup'd attribute).
      // First two rounds stay hop-only: bucket-co-membership dedup
      // graphs are near-cliques that CONVERGE there, and the jump
      // join would be a pure extra labels-sized shuffle for them; the
      // shortcut arms from round 3, so a chain still closes in
      // 2 + O(log diameter) rounds while the common case pays zero.
      val next = if (iter <= 2) hopped else {
        val jump = hopped.toDF("jid", "jlbl")
        hopped.join(jump, col("lbl") === col("jid"))
          .select(col("id"), least(col("lbl"), col("jlbl")).as("lbl"))
          .localCheckpoint() // hopped's own pin covers the hop-only path
      }
      val cur = checksum(next)
      labels = next
      if (cur.compareTo(prev) == 0) done = true else prev = cur
    }
    labels.select(col("id").as("doc_id"), col("lbl").as("cluster"))
  }

  /** Cross-source contamination matrix — for every source pair, how
    * many distinct word 3-grams they share, plus the shingle-set
    * Jaccard: the "who overlaps whom" report run before mixing crawl
    * dumps or licensing corpora (a high off-diagonal means one source
    * republishes another and the mix double-counts it).
    *
    * Scale shape: distinct (source, shingle) pairs shuffle once on the
    * shingle; a shingle held by k sources emits k(k-1)/2 pair
    * increments — bounded by #sources², never by corpus size — and the
    * pair counts combine map-side. The self-join is DICTIONARY-ENCODED
    * (the [[cappedTokenIdsUnordered]] scheme, uncapped here because
    * the overlap metric is defined over the full vocabulary): a
    * unique integer id per shingle from the pinned vocab, so the
    * posting self-join and its k(k-1)/2 emitted pairs carry an 8-byte
    * long instead of the ~20-byte shingle string — the encoding that
    * cut d28's 100×-cell peak spill ~3×. Output is #source-pair
    * rows. */
  def sourceOverlap(df: DataFrame, text: Column, source: Column,
      n: Int = 3): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val sh = df.select(source.as("source"),
        explode(call_function("graft_shingles", text, lit(n))).as("s"))
      .distinct()
    // Unordered dictionary (the [[cappedTokenIdsUnordered]] scheme,
    // uncapped): ids from monotonically_increasing_id on the pinned
    // distinct vocab. The vocab join drops no rows (every shingle is
    // in vocab), so sizes over enc equal sizes over sh.
    val vocab = sh.select(col("s")).distinct()
      .select(col("s"), monotonically_increasing_id().as("rk"))
      .localCheckpoint()
    // enc is NOT pinned: one action, three consumers — ReusedExchange
    // shares the shuffle; the vocab pin freezes the ids (see
    // [[cappedTokenIdsUnordered]]).
    val enc = sh.join(vocab, Seq("s"))
      .select(col("source"), col("rk"))
    val sizes = enc.groupBy(col("source")).agg(count(lit(1)).as("nsh"))
    val pairs = enc.as("a").join(enc.as("b"),
        col("a.rk") === col("b.rk") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("shared_shingles"))
    pairs
      .join(sizes.select(col("source").as("src_a"), col("nsh").as("na")),
        Seq("src_a"))
      .join(sizes.select(col("source").as("src_b"), col("nsh").as("nb")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("shared_shingles"),
        (col("shared_shingles").cast("double") /
          (col("na") + col("nb") - col("shared_shingles")).cast("double"))
          .as("jaccard"))
  }

  /** Corpus-frequency boilerplate removal — the C4/CCNet/RefinedWeb
    * line-dedup stage: a SEGMENT (here a fixed `segWords`-word window,
    * the no-newline corpus's analogue of a line) that appears verbatim
    * in >= `minDf` distinct documents is boilerplate (headers, footers,
    * cookie banners) and is excised from EVERY document; the survivors
    * are reassembled in order. Differs from [[dupSpans]]/`removeDupSpans`
    * (pairwise positional matching between candidate pairs) in being
    * driven by global corpus frequency — no pairing at all.
    *
    * Scale shape: segmentation is map-only (HOF over the token array,
    * no posexplode shuffle); segments shuffle by their 16-hex md5
    * fingerprint, never raw text; document frequency is a two-phase
    * `countDistinct` groupBy (map-side partial dedup of (fp, doc)
    * pairs — deliberately NOT a `collect_set` window, which would
    * materialize every doc id of a hot boilerplate segment in one
    * task), then one shuffle back on doc_id to reassemble. Hot
    * segments (the interesting ones — a banner in millions of docs)
    * stay safe: they contribute partial counts, never a row list. */
  def boilerplateRemoval(df: DataFrame, text: Column, id: Column,
      segWords: Int = 10, minDf: Int = 2): DataFrame = {
    val segs = df.select(id.as("doc_id"), split(text, " ").as("toks"))
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, (size(toks)-1) div $segWords), " +
          s"i -> array_join(slice(toks, i*$segWords+1, $segWords), ' '))"))
        .as(Seq("seg_id", "seg")))
      .withColumn("fp", substring(md5(col("seg")), 1, 16))
    val dfreq = segs.groupBy(col("fp"))
      .agg(countDistinct(col("doc_id")).as("docfreq"))
    segs.join(dfreq, Seq("fp"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_segs"),
        count(when(col("docfreq") >= minDf, 1)).as("n_removed"),
        array_join(transform(sort_array(collect_list(
          when(col("docfreq") < minDf,
            struct(col("seg_id"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))
  }

  /** d26: content-defined chunking (CDC) dedup stats — the
    * rsync/LBFS boundary idea applied to corpus dedup: a chunk break
    * falls AFTER any word whose hash ≡ 0 (mod `modulus`), so chunk
    * boundaries are a function of CONTENT, not position — insert one
    * word into a doc and every chunk except the one containing the
    * edit keeps its identity, where d10's fixed positional windows
    * all shift. Expected chunk length = `modulus` words.
    *
    * The boundary hash is the low byte of md5(word) — engine-portable
    * (the oracle reproduces it in SQL) and deterministic. Chunk
    * identity = md5 of the space-joined chunk; an instance is a
    * DUPLICATE iff an identical chunk exists at a strictly smaller
    * (doc_id, chunk_idx) — first-writer-keeps, within-doc repeats
    * counted (d10's tie-break extended to chunk granularity).
    *
    * Shape: one scan → posexplode → per-doc running-sum window
    * assigns chunk ids → per-(doc, chunk) rebuild → one fingerprint
    * window for ownership. No self-join; the fingerprint exchange
    * carries 16-byte keys. Per-doc windows are doc-length-bounded;
    * the fp window has near-unique keys (hot boilerplate chunks are
    * the d24 df-cap story). */
  def cdcChunkStats(df: DataFrame, text: Column, id: Column,
      modulus: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val isBrk = conv(substring(md5(col("w")), 1, 2), 16, 10)
      .cast("long") % modulus === 0L
    val words = df.select(id.as("doc_id"),
        posexplode(split(text, " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    // chunk index = number of breaks strictly BEFORE this word
    val chunkIdx = sum(when(isBrk, 1L).otherwise(0L))
      .over(Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, -1))
    val chunks = words
      .select(col("doc_id"), col("pos"), col("w"),
        coalesce(chunkIdx, lit(0L)).as("chunk_idx"))
      .groupBy(col("doc_id"), col("chunk_idx"))
      .agg(md5(array_join(transform(sort_array(collect_list(
        struct(col("pos"), col("w")))), x => x.getField("w")), " "))
        .as("fp"))
    // scalar instance ordinal (portable to the oracle's integer min):
    // chunk_idx is word-count-bounded, far below the 10^6 stride
    val ord = col("doc_id") * lit(1000000L) + col("chunk_idx")
    val owner = min(ord).over(Window.partitionBy(col("fp")))
    chunks.withColumn("own", owner)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("own") <
          col("doc_id") * lit(1000000L) + col("chunk_idx"), 1L)
          .otherwise(0L)).as("n_dup_chunks"))
  }

  /** d34: SOFT DEDUP — per-document sampling weight 1/multiplicity of
    * its exact fingerprint, the modern alternative to dropping exact
    * duplicates outright (train-time downweighting preserves the
    * distribution's support while removing the duplication bias; the
    * SoftDeDup idea applied at the exact tier). Weight is emitted at
    * MICRO grain by integer floor-division, so the whole table is
    * engine-exact — the only arithmetic is one count and one div.
    * One fingerprint aggregate + one keyed join back: the d01 shape,
    * keyed shuffles only.
    *
    * Reference basis: goka has no dedup ops; documents-suite
    * extension (SURVEY section 2.5). */
  def softDedupWeights(df: DataFrame, text: Column, id: Column): DataFrame = {
    val fp = df.select(id.as("doc_id"), md5(text).as("fp"))
    val counts = fp.groupBy(col("fp")).agg(count(lit(1)).as("n_copies"))
    fp.join(counts, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("n_copies"),
        expr("1000000 div n_copies").as("weight_micro"))
  }

  /** SimHash-to-Jaccard calibration table — the d32/d36 discipline
    * applied to the third signature family: for every exact banded
    * candidate pair at hamming distance ≤ 5 (bands=6 ⇒ pigeonhole-
    * exact, no brute pass), the EXACT distinct-token Jaccard is
    * pooled per distance — the table that turns "hamming ≤ k" into a
    * defensible similarity threshold before anyone deploys d03/d06 at
    * scale. SimHash is computed over distinct word tokens, so the
    * truth side uses the SAME feature set (token-set Jaccard, not
    * shingles). Integer inter/union sums; one division per row. */
  def simhashFidelity(df: DataFrame, text: Column, id: Column): DataFrame = {
    val sims = simhash(df, text, id)
    val pairs = simhashPairs(sims, maxDist = 5, bands = 6)
      .localCheckpoint() // consumed by the inter join and the rollup
    val tok = df.select(id.as("doc_id"),
      explode(array_distinct(split(text, " "))).as("w")).distinct()
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = pairs
      .join(tok.select(col("doc_id").as("da"), col("w")), Seq("da"))
      .join(tok.select(col("doc_id").as("db"), col("w")), Seq("db", "w"))
      .groupBy(col("da"), col("db")).agg(count(lit(1)).as("inter"))
    pairs
      .join(inter, Seq("da", "db"), "left").na.fill(0L, Seq("inter"))
      .join(sizes.select(col("doc_id").as("da"), col("n").as("na")),
        Seq("da"))
      .join(sizes.select(col("doc_id").as("db"), col("n").as("nb")),
        Seq("db"))
      .groupBy(col("dist"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("inter")).cast("long").as("inter_sum"),
        sum(col("na") + col("nb") - col("inter")).cast("long")
          .as("union_sum"))
      .withColumn("pooled_jaccard",
        col("inter_sum").cast("double") / col("union_sum").cast("double"))
      .select(col("dist").cast("long").as("dist"), col("n_pairs"),
        col("inter_sum"), col("union_sum"), col("pooled_jaccard"))
  }

  /** Sub-document (block-level) dedup — the CCNet paragraph-dedup
    * class (Wenzek et al. 2020 §3.1 deduplicate repeated paragraphs
    * ACROSS documents, keeping one copy): documents are cut into
    * non-overlapping `blockWords`-word blocks, a block's KEEPER is its
    * globally first occurrence (smallest (doc_id, block_index)), and
    * every other occurrence is removed. Per doc: block counts and the
    * md5 of the surviving text — the REWRITE the whole-doc ops
    * (d01-d36) by definition cannot express, and at 100 TB the op
    * that reclaims boilerplate-dominated crawls whose docs are never
    * byte-identical. Shuffles: explode to blocks, one
    * groupBy(fingerprint) for the keeper argmin (min of a packed
    * (doc, idx) long — no window), one equi-join back, one per-doc
    * ordered fold — the keeper shuffles carry the 8-byte [[blockFp]],
    * never the ~120-byte block string. */
  def blockDedup(df: DataFrame, text: Column, id: Column,
      blockWords: Int = 20): DataFrame = {
    // pinned: the cutting pipeline (explode + ordered per-block fold)
    // feeds TWO consumers (keeper argmin + rewrite) and must not
    // re-scan the corpus per consumer — the r13 pin discipline; what
    // a real line-dedup pass materializes anyway
    val blocks = blocksOf(df, text, id, blockWords).localCheckpoint()
    // keeper = min packed (doc_id, bid) — see [[packedBlockKey]]'s
    // loud range guard (r14 ADVICE: the bound was comment-only)
    val keeper = blocks.groupBy(blockFp(col("block")).as("fp"))
      .agg(min(packedBlockKey(col("doc_id"), col("bid"))).as("keeper"))
    rewriteWithKeepers(blocks, keeper)
  }

  /** 64-bit block fingerprint — the keeper registry's join key:
    * [[blockDedup]]'s argmin groupBy, [[rewriteWithKeepers]]'s
    * registry join and st77's streaming state all key on this 8-byte
    * long instead of the raw ~20-word (~120-byte) block string — the
    * d28 dictionary-encoding discipline applied where no rank table
    * is needed (blocks are never ordered, only matched). Same 64-bit
    * width and same tradeoff as d30's 16-hex md5 segment
    * fingerprints: a collision merges two distinct blocks and drops
    * one as a false duplicate, at rate ~n²/2⁶⁵ — at 10¹² blocks
    * (100 TB-scale) ~10⁻⁸ of blocks affected, the standard
    * fingerprint-dedup tradeoff. xxhash64 is codegen'd and map-side;
    * no hash table, no extra shuffle. */
  def blockFp(block: Column): Column = xxhash64(block)

  /** (doc_id, bid) packed into one orderable BIGINT for the keeper
    * argmin. Collision-free only while doc_id < 2^40 and bid < 2^20
    * (a 2^20-block doc is ~20M words at the default blockWords) — a
    * violation would silently corrupt keeper selection, so out-of-
    * range ids FAIL LOUDLY instead, matching the exactLong house
    * rule. The guard is a codegen'd `when`, free in the hot path. */
  def packedBlockKey(doc: Column, bid: Column): Column =
    when(doc >= 0L && doc < lit(1L << 40) &&
        bid >= 0L && bid < lit(1L << 20),
        doc * lit(1L << 20) + bid)
      .otherwise(raise_error(concat(
        lit("blockDedup packed key out of range: doc_id="),
        doc.cast("string"), lit(" bid="), bid.cast("string")))
        .cast("long"))

  /** [[blockDedup]]'s cutting stage: one (doc_id, bid, block) row per
    * non-overlapping `blockWords`-word block. */
  def blocksOf(df: DataFrame, text: Column, id: Column,
      blockWords: Int): DataFrame =
    df.select(id.as("doc_id"), posexplode(split(text, " "))
        .as(Seq("pos", "w")))
      .groupBy(col("doc_id"),
        expr(s"pos div ${blockWords}L").as("bid"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("block"))

  /** [[blockDedup]]'s rewrite stage over any (fp, keeper) registry —
    * keyed by [[blockFp]], so the registry join shuffles 8-byte longs,
    * not block strings. st77 joins the SAME rewrite against a keeper
    * table maintained as streaming state (keyed by the same fp),
    * sharing d37's oracle. */
  def rewriteWithKeepers(blocks: DataFrame, keeper: DataFrame): DataFrame =
    blocks.withColumn("fp", blockFp(col("block")))
      .join(keeper, Seq("fp"))
      .withColumn("keep",
        packedBlockKey(col("doc_id"), col("bid")) === col("keeper"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("long").as("n_blocks"),
        sum(when(col("keep"), 0L).otherwise(1L)).as("n_removed"),
        md5(array_join(transform(filter(
          array_sort(collect_list(struct(col("bid"), col("block"),
            col("keep")))),
          x => x.getField("keep")), x => x.getField("block")), " "))
          .as("kept_fp"))
}
