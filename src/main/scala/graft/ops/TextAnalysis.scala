package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Hashes._

/** Text-analysis operators for training-data curation: language ID,
  * quality scoring, token counting, fingerprinting. Pure Catalyst
  * expressions (split/filter/regexp) — codegen'd, no UDFs, and every
  * computation is replicable in the SQL oracle. */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword heuristic
    * language classifier. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "is", "in", "to"),
    "es" -> Seq("el", "la", "de", "que", "y", "los", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我"))

  private def stopCount(words: Column, lang: String): Column =
    size(filter(words, w =>
      w.isInCollection(stopwords(lang))))

  /** Stopword-vote language ID: score each language by stopword hits;
    * argmax with fixed priority order (en,es,de,fr,zh) for determinism. */
  def langId(text: Column): Column = {
    val words = split(lower(text), " ")
    val langs = Seq("en", "es", "de", "fr", "zh")
    val scores = langs.map(l => l -> stopCount(words, l)).toMap
    // en wins ties (priority order = declaration order)
    langs.tail.foldLeft[(Column, Column)]((lit("en"), scores("en"))) {
      case ((bestLang, bestScore), l) =>
        (when(scores(l) > bestScore, lit(l)).otherwise(bestLang),
          when(scores(l) > bestScore, scores(l)).otherwise(bestScore))
    }._1
  }

  /** Heuristic quality metrics + composite score. All ratios are
    * IEEE-deterministic given the same integer counts. */
  def qualityMetrics(df: DataFrame, text: Column, id: Column): DataFrame = {
    val words = split(text, " ")
    val nChars = length(text)
    val nWords = size(words)
    val stopHits = size(filter(split(lower(text), " "), w =>
      w.isInCollection(stopwords("en"))))
    val nDigits = length(regexp_replace(text, "[^0-9]", ""))
    val nPunct = length(regexp_replace(text, "[A-Za-z0-9 ]", ""))
    df.select(
      id.as("doc_id"),
      nChars.cast("long").as("n_chars"),
      nWords.cast("long").as("n_words"),
      ((nChars - nWords + 1).cast("double") / nWords.cast("double"))
        .as("avg_word_len"),
      (stopHits.cast("double") / nWords.cast("double")).as("stopword_ratio"),
      (nDigits.cast("double") / nChars.cast("double")).as("digit_ratio"),
      (nPunct.cast("double") / nChars.cast("double")).as("punct_ratio"))
      .withColumn("quality",
        col("stopword_ratio") * lit(2.0) +
          col("avg_word_len") * lit(0.1) -
          col("digit_ratio") * lit(1.0) -
          col("punct_ratio") * lit(1.0))
  }

  /** The 8-word "essential English" set of Gopher's stopword gate
    * (Rae et al. 2021, public): a document must contain at least two. */
  val gopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style rule gates (Rae et al., "Scaling Language Models:
    * ... Gopher", 2021 — the doc-level subset; the line-level rules
    * need multi-line docs): hard keep/drop RULES next to
    * [[qualityMetrics]]'s soft score. Per doc: the measured quantity,
    * one boolean per rule, and the composite `keep` (AND of all).
    * Thresholds are the paper's: word count in [minWords, maxWords],
    * mean word length in [minMeanLen, maxMeanLen], ≥ minAlphaRatio of
    * words containing an alphabetic char, ≥ minStopHits DISTINCT words
    * from the essential-English set (the paper's "at least 2 of the
    * following" — a doc repeating one stopword does not pass).
    * All counts are exact integers; the two
    * ratios are single IEEE divides of exact ints — deterministic in
    * any engine. Map-only: one projection, no shuffle, scales as a
    * pure scan stage. */
  def gopherGates(df: DataFrame, text: Column, id: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.8, minStopHits: Int = 2): DataFrame = {
    val words = split(text, " ")
    val nWords = size(words)
    val nChars = length(text)
    // single-space docs: total word chars = chars - (words-1) separators
    val meanLen = (nChars - nWords + 1).cast("double") / nWords.cast("double")
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val alphaRatio = alphaWords.cast("double") / nWords.cast("double")
    val stopHits = size(array_distinct(filter(split(lower(text), " "),
      w => w.isInCollection(gopherStops))))
    val (pw, pm, pa, ps) = gopherFlagCols(text, minWords, maxWords,
      minMeanLen, maxMeanLen, minAlphaRatio, minStopHits)
    df.select(
      id.as("doc_id"),
      nWords.cast("long").as("n_words"),
      meanLen.as("mean_word_len"),
      alphaRatio.as("alpha_ratio"),
      stopHits.cast("long").as("stop_hits"),
      pw.as("pass_words"), pm.as("pass_mean_len"),
      pa.as("pass_alpha"), ps.as("pass_stops"))
      .withColumn("keep",
        col("pass_words") && col("pass_mean_len") &&
          col("pass_alpha") && col("pass_stops"))
  }

  /** The four Gopher rule flags as raw Columns (Catalyst dedups the
    * shared sub-expressions with the metric columns). */
  private def gopherFlagCols(text: Column, minWords: Int, maxWords: Int,
      minMeanLen: Double, maxMeanLen: Double, minAlphaRatio: Double,
      minStopHits: Int): (Column, Column, Column, Column) = {
    val words = split(text, " ")
    val nWords = size(words)
    val meanLen = (length(text) - nWords + 1).cast("double") /
      nWords.cast("double")
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val stopHits = size(array_distinct(filter(split(lower(text), " "),
      w => w.isInCollection(gopherStops))))
    (nWords >= minWords && nWords <= maxWords,
      meanLen >= minMeanLen && meanLen <= maxMeanLen,
      alphaWords.cast("double") >= nWords.cast("double") * minAlphaRatio,
      stopHits >= minStopHits)
  }

  /** The composite Gopher keep decision as ONE reusable Column — the
    * same expression whether it gates a batch table ([[gopherGates]])
    * or a live ingest stream (st12's stateless pre-filter), so the two
    * paths can share one oracle. */
  def gopherKeep(text: Column,
      minWords: Int = 50, maxWords: Int = 100000,
      minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
      minAlphaRatio: Double = 0.8, minStopHits: Int = 2): Column = {
    val (pw, pm, pa, ps) = gopherFlagCols(text, minWords, maxWords,
      minMeanLen, maxMeanLen, minAlphaRatio, minStopHits)
    pw && pm && pa && ps
  }

  /** DSIR-style hashed-bigram importance weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * per doc, the mean target/raw probability ratio of its hashed
    * bigram features — the weight an importance resampler feeds a
    * Gumbel top-k draw to tilt a raw crawl toward a target domain.
    *
    * Feature space is `nBuckets` md5-hashed bigram buckets (DSIR's
    * hashed n-grams; md5 keeps the bucketing engine-portable). Both
    * bucket distributions get add-one smoothing, so a bucket unseen in
    * the target still yields a finite ratio. DSIR's weight is the
    * log-PRODUCT of per-feature ratios; the mean-ratio form here is
    * the same per-feature evidence folded without libm (no ln — each
    * ratio is ONE IEEE divide of two exact int64 products, and the
    * per-doc fold runs in sorted bucket order on both engines, t13's
    * discipline), keeping the oracle bit-exact. The products stay
    * exactly representable while each side's total bigram count is
    * < ~2^26; past that, move the ratio to ln-space — ordering is
    * preserved, only oracle bit-equality is given up.
    *
    * Fit-then-transform like t13, but the model here is bounded by
    * CONSTRUCTION at `nBuckets` rows + one totals row — broadcast
    * needs no count guard, and the transform is one broadcast-join
    * pass over the corpus (two scans total, no shuffle of the text). */
  def dsirWeights(df: DataFrame, text: Column, id: Column,
      inTarget: Column, nBuckets: Int = 64): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val grams = df.select(id.as("doc_id"), inTarget.as("tgt"),
      explode(call_function("graft_shingles", text, lit(2), lit(false)))
        .as("g"))
      .withColumn("b", graft.functions.Hashes.h32(col("g")) % nBuckets)
    val model = grams.groupBy(col("b"))
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
        count(lit(1)).as("cr"))
      .localCheckpoint()
    val totals = model.agg(sum(col("ct")).as("st"), sum(col("cr")).as("sr"))
    val scored = grams.join(broadcast(model), Seq("b"))
      .crossJoin(broadcast(totals))
      .select(col("doc_id"), col("b"),
        (((col("ct") + 1L) * (col("sr") + nBuckets)).cast("double")
          / ((col("cr") + 1L) * (col("st") + nBuckets)).cast("double"))
          .as("r"))
    scored.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("b"), col("r")))).as("lst"))
      .select(col("doc_id"),
        size(col("lst")).cast("long").as("n_bigrams"),
        (aggregate(col("lst"), lit(0.0), (acc, x) => acc + x("r"))
          / size(col("lst")).cast("double")).as("dsir_weight"))
  }

  /** PII detection + redaction — the privacy-scrub stage a training
    * pipeline runs before any text persists downstream (the reference
    * has no text layer; additive pipeline surface, cf. the email/IP/
    * phone scrubbers in public web-corpus recipes).
    *
    * Three pattern families are COUNTED on the raw text, then redacted
    * in a fixed order (email → IPv4 → phone; the families are disjoint
    * on any input, the fixed order just makes the composed rewrite
    * deterministic). The patterns use no backreferences or lookaround,
    * so they mean the same thing under Java's regex (Spark) and RE2
    * (the DuckDB oracle), and Java's backtracking engine stays linear
    * on them. Map-only — one projection, no shuffle, a pure scan stage
    * at 100 TB; the 16-hex fingerprint keeps the verified result
    * narrow (a real pipeline writes `redacted` itself to the next
    * stage instead). */
  def piiRedact(df: DataFrame, text: Column, id: Column): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val redacted = regexp_replace(
      regexp_replace(
        regexp_replace(text, lit(email), lit("<EMAIL>")),
        lit(ipv4), lit("<IP>")),
      lit(phone), lit("<PHONE>"))
    df.select(
      id.as("doc_id"),
      regexp_count(text, lit(email)).cast("long").as("n_emails"),
      regexp_count(text, lit(ipv4)).cast("long").as("n_ips"),
      regexp_count(text, lit(phone)).cast("long").as("n_phones"),
      substring(md5(redacted), 1, 16).as("redacted_fp"))
      .withColumn("has_pii",
        col("n_emails") + col("n_ips") + col("n_phones") > 0)
  }

  /** Token counts: whitespace tokens + BPE-ish regex tokens
    * (letter-runs / digit-runs / single non-alnum marks). */
  def tokenStats(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(
      id.as("doc_id"),
      size(split(text, " ")).cast("long").as("ws_tokens"),
      size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"),
        lit(0))).cast("long").as("bpeish_tokens"))

  /** Overlapping context-window chunking — the RAG / training-sequence
    * preparation step: each document's whitespace tokens are emitted as
    * windows of `window` tokens starting every `stride` tokens
    * (overlap = window − stride; the trailing windows may be short).
    * Complements [[PipelineQueries.packSequences]]' greedy whole-doc
    * packing (t12): packing fills fixed budgets with whole documents,
    * chunking splits ONE long document into retrievable/trainable
    * pieces.
    *
    * Scale shape: map-only — `split`/`sequence`/`explode`/`slice`/
    * `array_join` are all codegen'd builtins; no shuffle, no state,
    * output is ≤ ⌈window/stride⌉ × input tokens, embarrassingly
    * parallel at any corpus size. */
  def chunkDocs(df: DataFrame, text: Column, id: Column,
      window: Int = 64, stride: Int = 48): DataFrame =
    df.select(id.as("doc_id"), split(text, " ").as("toks"))
      .withColumn("start",
        explode(sequence(lit(0), size(col("toks")) - 1, lit(stride))))
      .select(col("doc_id"),
        (col("start") / stride).cast("long").as("chunk_id"),
        size(slice(col("toks"), col("start") + 1, lit(window)))
          .cast("long").as("n_tokens"),
        array_join(slice(col("toks"), col("start") + 1, lit(window)), " ")
          .as("chunk_text"))

  /** 64-hex-char-free fingerprint: md5 of normalized text (16-hex prefix
    * kept as the join/dedup key). */
  def fingerprint(df: DataFrame, text: Column, id: Column): DataFrame =
    df.select(id.as("doc_id"),
      substring(contentFingerprint(text), 1, 16).as("fp"))

  /** Top-k salient terms per document by (tf DESC, df ASC, term ASC) —
    * integer-exact TF-IDF ordering (df replaces the idf log: log is
    * monotone-decreasing in df, so ranking by ascending df at equal tf
    * is the same order without float determinism risk). ONE scan, one
    * linear pipeline: per-(doc, term) counts, document frequency as a
    * window count over the term partition (a df-from-tf self-join would
    * rescan the corpus — same trick as the Jaccard df cap), then the
    * bounded per-doc rank window. */
  def topTerms(df: DataFrame, text: Column, id: Column, k: Int = 3)
      : DataFrame = {
    val tok = df.select(id.as("doc_id"), explode(split(text, " ")).as("term"))
      .filter(length(col("term")) > 0)
    val tf = tok.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val wTerm = org.apache.spark.sql.expressions.Window
      .partitionBy(col("term"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.withColumn("df", count(lit(1)).over(wTerm))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rank"))
  }

  /** Max multiplicity of any element in a string array, computed
    * per-row with NO shuffle: sort the array, then a linear fold over
    * the sorted runs (aggregate HOF). O(n log n) per row vs the
    * explode→groupBy→max alternative's two shuffles — for bounded-length
    * documents the map-only form is the 100 TB shape (each row's work is
    * independent; nothing leaves the task). */
  private def maxMultiplicity(arr: Column): Column = {
    val init = struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best"))
    aggregate(
      array_sort(arr),
      init,
      (acc, w) => {
        val run = when(w === acc("prev"), acc("run") + 1).otherwise(1)
        struct(w.as("prev"), run.as("run"),
          greatest(acc("best"), run).as("best"))
      },
      acc => acc("best"))
  }

  /** Gopher-style repetition filters (Rae et al. 2021 §A1.1, adapted to
    * single-line space-tokenized docs): fraction of occurrences taken by
    * the most frequent word / bigram, distinct-word ratio, duplicate-
    * bigram fraction, and a composite keep flag. All counts are exact
    * integers; each ratio is one IEEE divide, so the SQL oracle
    * reproduces them bit-for-bit. Map-only: no explode, no shuffle. */
  def repetitionMetrics(df: DataFrame, text: Column, id: Column): DataFrame = {
    val ws = filter(split(text, " "), w => w =!= "")
    val n = size(ws)
    // bigrams of adjacent words; sequence() guarded (n<2 would yield a
    // DESCENDING range — default step -1)
    val bigrams = when(n >= 2,
      transform(sequence(lit(0), n - 2), i =>
        concat_ws(" ", element_at(ws, i + 1), element_at(ws, i + 2))))
      .otherwise(array().cast("array<string>"))
    val nBg = size(bigrams)
    val out = df.select(
      id.as("doc_id"),
      n.cast("long").as("n_words"),
      (size(array_distinct(ws)).cast("double") / n.cast("double"))
        .as("distinct_word_ratio"),
      (maxMultiplicity(ws).cast("double") / n.cast("double"))
        .as("top_word_frac"),
      when(nBg > 0, maxMultiplicity(bigrams).cast("double") / nBg.cast("double"))
        .otherwise(lit(0.0)).as("top_bigram_frac"),
      when(nBg > 0, (nBg - size(array_distinct(bigrams))).cast("double")
        / nBg.cast("double")).otherwise(lit(0.0)).as("dup_bigram_frac"))
    out.withColumn("keep",
      col("top_word_frac") <= 0.12 &&
        col("distinct_word_ratio") >= 0.35 &&
        col("dup_bigram_frac") <= 0.05)
  }

  /** Deterministic per-stratum downsampling — the domain/language
    * rebalancing step of every training-data mix (e.g. cap English at
    * 50% while keeping low-resource languages whole). Rates are basis
    * points per 10,000 so membership is an INTEGER compare on the same
    * content-free hash bucket as [[hashSplit]]: no RNG, no floats, the
    * same doc survives on every run, engine, and partition count, and
    * re-running with a larger rate strictly grows the sample (nested
    * samples — the property reproducible data ablations need).
    * Map-only; reads only the id + stratum columns. */
  def stratifiedSample(df: DataFrame, id: Column, stratum: Column,
      ratesBp: Map[String, Int], defaultBp: Int = 10000): DataFrame = {
    val bucket = (conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long") % 10000)
    val rate = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (s, bp)) =>
      when(stratum === s, lit(bp)).otherwise(acc)
    }
    df.select(id.as("doc_id"), stratum.as("stratum"),
        bucket.as("bucket"), rate.as("rate_bp"))
      .filter(col("bucket") < col("rate_bp"))
  }

  /** Per-document rarity score — mean inverse document frequency over the
    * doc's distinct words: rare-vocabulary documents score high, boiler-
    * plate scores low. The data-selection signal behind "select for
    * novelty" mixes (a DSIR/cross-entropy stand-in that needs no model —
    * and no transcendentals, see below).
    *
    * Float determinism: a plain `sum(1/df)` would depend on aggregation
    * order, which Spark does not fix. Instead the per-doc terms are
    * collected, sorted (each (doc, word) is unique, so the sort order is
    * total), and folded left with `aggregate` — IEEE divide and add in a
    * deterministic order that the SQL oracle reproduces exactly with
    * `list(... ORDER BY w)` + `list_reduce`. No `ln`/`log` on purpose:
    * libm implementations differ across engines in the last ulp; `/` and
    * `+` are IEEE-exact everywhere.
    *
    * Scale shape: document frequency is a window count over the word
    * partition (one shuffle, spill-safe); the per-doc collect_list is
    * bounded by the doc's distinct-word count (thousands, not corpus-
    * sized). */
  def rarityScore(df: DataFrame, text: Column, id: Column): DataFrame = {
    val tok = df.select(id.as("doc_id"),
        explode(array_distinct(split(text, " "))).as("w"))
      .filter(col("w") =!= "")
    val wWord = org.apache.spark.sql.expressions.Window.partitionBy(col("w"))
    val terms = tok.withColumn("df", count(lit(1)).over(wWord))
    terms.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("w"), col("df")))).as("lst"))
      .select(col("doc_id"), size(col("lst")).cast("long").as("n_terms"),
        (aggregate(col("lst"), lit(0.0),
          (acc, x) => acc + lit(1.0) / x("df").cast("double"))
          / size(col("lst")).cast("double")).as("rarity"))
  }

  /** KMV (k-minimum-values) distinct-count sketch per stratum — the
    * mergeable cardinality sketch of the theta/KMV family (Bar-Yossef
    * et al. 2002), here with a DETERMINISTIC md5 hash so, unlike HLL
    * implementations, every sketch register — and therefore the
    * estimate itself — is bit-identical in any engine and
    * oracle-checkable. Estimate: with x_k = the k-th smallest distinct
    * 32-bit hash value, distinct ≈ (k-1)·2^32 / x_k; strata with fewer
    * than k distinct hashes report their exact count (the sketch is
    * exact below its capacity). The exact distinct count rides along,
    * so the output doubles as the sketch's own error audit.
    *
    * Scale shape — two-level k-minimum, so parallelism never collapses
    * to #strata: level 1 takes the k smallest hashes per (stratum,
    * salt-bucket) where salt = hash mod `nSalts` (deterministic — the
    * same hash always lands in the same bucket, so the global k minima
    * are guaranteed to survive level 1); level 2 merges the ≤ k·nSalts
    * survivors per stratum and re-takes k — a bounded 2048-row-per-
    * stratum aggregation, not a sort of the stratum's full distinct
    * hash set in one task. n_hashes comes from a plain partial-agg
    * count, never a window. A production deployment keeps only the
    * k-row sketch per stratum; merge = union + re-take-k-min, exactly
    * level 2 re-run. */
  def kmvDistinct(df: DataFrame, text: Column, stratum: Column,
      k: Int = 64, nSalts: Int = 32): DataFrame = {
    val tok = df.select(stratum.as("stratum"),
        explode(array_distinct(split(text, " "))).as("w"))
      .filter(col("w") =!= "")
      .distinct()
    val hs = tok.select(col("stratum"), h32(col("w")).as("hw")).distinct()
    val exact = tok.groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_exact"))
    // level 1: k minima per (stratum, salt) — #strata × nSalts tasks
    val wSalt = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum"), col("salt")).orderBy(col("hw"))
    val cand = hs.withColumn("salt", pmod(col("hw"), lit(nSalts)))
      .withColumn("rn", row_number().over(wSalt))
      .filter(col("rn") <= k)
      .select(col("stratum"), col("hw"))
    // level 2: merge the ≤ k·nSalts survivors, re-take k
    val wS = org.apache.spark.sql.expressions.Window
      .partitionBy(col("stratum")).orderBy(col("hw"))
    val counts = hs.groupBy(col("stratum")).agg(count(lit(1)).as("n_hashes"))
    cand.withColumn("rn", row_number().over(wS))
      .groupBy(col("stratum"))
      .agg(max(when(col("rn") <= k, col("hw"))).as("kth"))
      .join(counts, Seq("stratum"))
      .join(exact, Seq("stratum"))
      .select(col("stratum"), col("n_exact"), col("n_hashes"),
        when(col("n_hashes") >= k, col("kth")).as("kth_hash"),
        when(col("n_hashes") >= k,
          lit((k - 1L) * 4294967296L).cast("double")
            / col("kth").cast("double"))
          .otherwise(col("n_exact").cast("double")).as("est_distinct"))
  }

  /** t46: [[kmvDistinct]] on the NATIVE sketch aggregate
    * ([[graft.functions.KmvSketchAgg]]) — the throughput path: ONE
    * keyed aggregate whose map-side partials carry ≤ k longs per
    * (stratum, task), replacing the declarative version's distinct +
    * two salted window passes (kept above as the parity reference,
    * the [[graft.ops.Vectors.sqDistDeclarative]] pattern). The two
    * exact-count audit columns still need their distinct aggregates —
    * they are the AUDIT; a production run keeps only the sketch. Same
    * output contract and oracle as t14: the hash match proves the
    * imperative buffer (bounded TreeSet, O(k) merges) computes
    * exactly the k-th smallest distinct hash. */
  def kmvDistinctNative(df: DataFrame, text: Column, stratum: Column,
      k: Int = 16): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val tok = df.select(stratum.as("stratum"),
        explode(array_distinct(split(text, " "))).as("w"))
      .filter(col("w") =!= "")
    tok.groupBy(col("stratum"))
      .agg(call_function("graft_kmv", h32(col("w")), lit(k)).as("mins"),
        countDistinct(col("w")).as("n_exact"),
        countDistinct(h32(col("w"))).as("n_hashes"))
      .select(col("stratum"), col("n_exact"), col("n_hashes"),
        when(size(col("mins")) >= k, element_at(col("mins"), k))
          .as("kth_hash"),
        when(size(col("mins")) >= k,
          lit((k - 1L) * 4294967296L).cast("double")
            / element_at(col("mins"), k).cast("double"))
          .otherwise(col("n_exact").cast("double")).as("est_distinct"))
  }

  /** Per-document novel n-gram ratio — the share of a doc's distinct
    * n-grams whose GLOBAL first occurrence (min doc_id = ingest order)
    * is this doc. The memorization/novelty dial of a training corpus:
    * boilerplate-heavy docs score near 0, fresh content near 1 — the
    * aggregate view of what d15 extracts span-by-span, and the
    * standard pre-training curation signal between exact dedup (whole
    * doc) and span excision (8-gram islands).
    *
    * Scale shape: per-doc distinct shingles from the native kernel
    * (map-only), ownership = a min window over the shingle partition
    * (shuffle 1, by shingle — same key d15 uses), then the per-doc
    * rollup (shuffle 2, by doc). No self-join, no broadcast; both
    * exchanges key on unbounded-cardinality columns and scale
    * horizontally. */
  def noveltyRatio(df: DataFrame, text: Column, id: Column,
      n: Int = 3): DataFrame = {
    val sh = Dedup.shingles(df, text, id, n)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("s"))
    sh.withColumn("owner", min(col("doc_id")).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("owner") === col("doc_id"), 1L).otherwise(0L))
          .as("novel_grams"))
      .select(col("doc_id"), col("n_grams"), col("novel_grams"),
        (col("novel_grams").cast("double") / col("n_grams").cast("double"))
          .as("novelty_ratio"))
  }

  /** Deterministic global shuffle + sharding — the "shuffle once, shard
    * for N trainers" write path of every training-data pipeline. Shard =
    * md5 bucket of the id (mod `shards`), position = dense order of the
    * full md5 within the shard: content-free, so the permutation is
    * identical on every run, engine, and partition count, and adding
    * docs never reorders surviving ones relative to each other.
    * One shuffle (the window by shard) — at scale this is exactly the
    * `repartition(shard).sortWithinPartitions(hash)` parquet write. */
  def shuffleShard(df: DataFrame, id: Column, shards: Int = 8): DataFrame = {
    val hx = md5(id.cast("string"))
    val shard = (conv(substring(hx, 1, 4), 16, 10).cast("long") % shards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("hx"))
    df.select(id.as("doc_id"), hx.as("hx"), shard.as("shard"))
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** Greedy sequence packing — fill fixed-size context windows (token
    * budget B) with consecutive documents, the batch-assembly step of
    * every LLM training run (docs are concatenated until the next one
    * would overflow, then a new pack starts; an oversized doc gets a
    * pack of its own). Packing is inherently sequential, so it runs
    * *per shard*: docs are hash-sharded exactly like [[shuffleShard]]
    * (same md5 order, so "shuffle then pack" compose into one
    * partitioning), and each shard's walk is an O(shard) streaming fold.
    *
    * Scale shape: `repartition(shard)` + `sortWithinPartitions` + a
    * `mapPartitions` carry-along fold — the same secondary-sort pattern
    * as the goka state fold (BatchExecutor): nothing is ever collected,
    * per-task memory is O(1), shards parallelize across the cluster.
    * Spark's query planner cannot express the sequential carry; this is
    * the documented (d)-tier mapPartitions case. */
  def packSequences(df: DataFrame, id: Column, tokens: Column,
      budget: Long = 256, shards: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val base = df
      .select(id.cast("long").as("doc_id"), tokens.cast("long").as("n_tokens"))
      .withColumn("hx", md5(col("doc_id").cast("string")))
      .withColumn("shard",
        conv(substring(col("hx"), 1, 4), 16, 10).cast("long") % shards)
    base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("hx"))
      .select(col("doc_id"), col("shard"), col("n_tokens"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        // several shards may share a task; reset the walk on shard change
        var curShard = Long.MinValue
        var bin = 0L
        var fill = 0L
        it.map { case (docId, shard, nTok) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          if (fill > 0 && fill + nTok > budget) { bin += 1; fill = nTok }
          else fill += nTok
          (docId, shard, nTok, bin)
        }
      }
      .toDF("doc_id", "shard", "n_tokens", "bin")
  }

  /** Self-trained bigram language-model quality score — the model-based
    * fluency signal of a CCNet/KenLM-style curation stage, with the model
    * fitted on the corpus itself (no external artifact): per document,
    * the mean add-one-smoothed conditional bigram probability
    * `p(w2|w1) = (c(w1 w2) + 1) / (c(w1 ·) + V)` over the doc's
    * positional bigrams. High score = the doc's word transitions are
    * common corpus-wide (fluent boilerplate scores high, word salad
    * scores near 1/V); the usual LM filter keeps a middle band.
    *
    * Numeric discipline: NO logarithms on purpose — libm `ln` differs
    * across engines in the last ulp, while every quantity here is an
    * exact int64 count and the probabilities are single IEEE divides.
    * The arithmetic mean replaces log-perplexity's geometric mean; it
    * induces a monotone-equivalent enough ranking for gating and keeps
    * the operator bit-reproducible (the per-doc sum folds over the
    * bigram list in sorted order, same as [[rarityScore]]).
    *
    * Scale shape: the "model" (bigram counts `cb`, left-context totals
    * `c1`, vocab size V) is the classic small side — Zipf-truncated
    * count tables, MBs for web-scale corpora after `minCount` pruning
    * (a pruned-away bigram scores as unseen: c=0, the add-one floor).
    * The fitted `cb` table is `localCheckpoint`ed so the corpus is
    * scanned exactly TWICE (once to fit, once to score — the canonical
    * fit-then-transform shape); `c1` and V are derived from the
    * materialized model, not from fresh corpus scans (V = |distinct
    * left contexts| = |c1|, the smoothing alphabet). Scoring is two
    * model joins + one per-doc aggregation; the model is broadcast only
    * within a counted bound — the model size is data-dependent, and
    * counting the already-checkpointed table costs one metadata-cheap
    * job and buys a guaranteed-safe fallback to shuffle joins on
    * `g`/`w1` instead of OOMing the driver (same guard as
    * [[Dedup.decontaminate]]'s `maxBroadcastShingles`). */
  def bigramLmScore(df: DataFrame, text: Column, id: Column,
      minCount: Long = 1L,
      maxBroadcastBigrams: Long = 10_000_000L): DataFrame =
    bigramLmScoreWith(df, text, id,
      bigramLmFit(df, text, minCount), maxBroadcastBigrams)

  /** FIT side of the bigram LM: the pruned bigram-count table — the
    * model artifact. `localCheckpoint`ed so the corpus is scanned
    * exactly once per fit; persist it to parquet for the
    * train-once/score-forever lifecycle (st26 serves from exactly that
    * stored artifact, the s25/st24 split applied to the text model). */
  def bigramLmFit(df: DataFrame, text: Column,
      minCount: Long = 1L): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    // positional bigrams (occurrences matter for an LM) — the native
    // one-pass kernel, distinct=false
    df.select(
        explode(call_function("graft_shingles", text, lit(2), lit(false)))
          .as("g"))
      .groupBy(col("g")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
      .localCheckpoint()
  }

  /** SCORE side: per-doc mean smoothed bigram probability under a
    * FROZEN model `cb` (from [[bigramLmFit]] or a stored parquet
    * artifact). The smoothing alphabet (`c1`, V) is derived from the
    * model itself, never from the scored corpus, so scoring a slice —
    * or one streaming micro-batch — yields bit-identical rows to
    * scoring the whole corpus, the slice-union property st26 rests
    * on. */
  def bigramLmScoreWith(df: DataFrame, text: Column, id: Column,
      cb: DataFrame,
      maxBroadcastBigrams: Long = 10_000_000L): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val grams = df.select(id.as("doc_id"),
      explode(call_function("graft_shingles", text, lit(2), lit(false)))
        .as("g"))
    val c1 = cb.groupBy(split_part(col("g"), lit(" "), lit(1)).as("w1"))
      .agg(sum(col("cb")).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    // Broadcast guard: counts the checkpointed MODEL (not the corpus).
    val (cbSide, c1Side) =
      if (cb.count() <= maxBroadcastBigrams) (broadcast(cb), broadcast(c1))
      else (cb, c1)
    // Left joins + coalesce-to-0: with minCount=1 every corpus bigram is
    // in the model and this is exactly the inner-join plan; with pruning
    // a dropped bigram/context scores as unseen rather than dropping the
    // doc's bigram from the mean.
    val scored = grams
      .join(cbSide, Seq("g"), "left")
      .withColumn("w1", split_part(col("g"), lit(" "), lit(1)))
      .join(c1Side, Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .select(col("doc_id"), col("g"),
        ((coalesce(col("cb"), lit(0L)) + lit(1)).cast("double")
          / (coalesce(col("c1"), lit(0L)) + col("v")).cast("double")).as("p"))
    scored.groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("g"), col("p")))).as("lst"))
      .select(col("doc_id"),
        size(col("lst")).cast("long").as("n_bigrams"),
        (aggregate(col("lst"), lit(0.0), (acc, x) => acc + x("p"))
          / size(col("lst")).cast("double")).as("lm_score"))
  }

  /** t34: the CCNet PERPLEXITY gate (Wenzek et al. 2020 §3.3 — the
    * actual filter CCNet runs, where t13/t20 rank by mean raw
    * probability): per-doc cross-entropy in BITS under the frozen
    * bigram LM, plus the keep flag. The per-bigram information
    * content −log2 p = log2 odds, odds = (c1 + V)/(cb + 1), is
    * computed as [[graft.functions.PortableMath.withLog2Fixed]]
    * 16-fraction-bit INTEGERS, so the per-doc score is an exact
    * integer SUM (order-free, no double-fold discipline) and the
    * keep decision `score < τ·n` is an exact integer comparison —
    * immune to the engine-dependent mul-add contraction that makes
    * transcendental double folds fragile (see PortableMath's fixed-
    * point rationale). odds ≥ 1 always (c1 ≥ cb, V ≥ 1), inside the
    * ladder domain at ANY corpus size. Scale shape: the ladder +
    * 16 squarings evaluate on the MODEL table only (one row per
    * distinct bigram); scoring is the same broadcast-guarded model
    * join as t13 — map-only over the corpus, the frozen-model
    * slice-union property included. */
  def perplexityGate(df: DataFrame, text: Column, id: Column,
      keepBelowBitsFx: Long,
      minCount: Long = 1L,
      maxBroadcastBigrams: Long = 10_000_000L): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val cb = bigramLmFit(df, text, minCount)
    val grams = df.select(id.as("doc_id"),
      explode(call_function("graft_shingles", text, lit(2), lit(false)))
        .as("g"))
    val c1 = cb.groupBy(split_part(col("g"), lit(" "), lit(1)).as("w1"))
      .agg(sum(col("cb")).as("c1"))
    val vocab = c1.agg(count(lit(1)).as("v"))
    // log2 over the MODEL rows only; with minCount=1 every corpus
    // bigram is in the model, so the inner scoring join drops nothing.
    val scoredModel = graft.functions.PortableMath.withLog2Fixed(
      cb.join(c1, split_part(col("g"), lit(" "), lit(1)) === col("w1"))
        .crossJoin(broadcast(vocab))
        .select(col("g"),
          ((col("c1") + col("v")).cast("double") /
            (col("cb") + lit(1L)).cast("double")).as("odds")),
      col("odds"), "lfx").select(col("g"), col("lfx"))
    val modelSide =
      if (cb.count() <= maxBroadcastBigrams) broadcast(scoredModel)
      else scoredModel
    grams.join(modelSide, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        sum(col("lfx")).as("score_fx"))
      .select(col("doc_id"), col("n_bigrams"), col("score_fx"),
        (col("score_fx").cast("double") /
          (col("n_bigrams") * lit(65536L)).cast("double")).as("h_bits"),
        (col("score_fx") < lit(keepBelowBitsFx) * col("n_bigrams"))
          .as("keep"))
  }

  /** CCNet-style per-language quality bucketing (Wenzek et al. 2020,
    * "CCNet: Extracting High Quality Monolingual Datasets from Web
    * Crawl Data", public): documents split head/middle/tail WITHIN
    * each language at the terciles of the LM-score distribution —
    * CCNet's central device for turning a raw crawl into
    * quality-stratified training slices. The LM is [[bigramLmScore]]'s
    * corpus-fitted bigram model (its lm_score rises with fluency, so
    * head = top tercile); the tercile boundaries are DISCRETE
    * (rank-selected score values, the q29 machinery — no
    * interpolation arithmetic), making the whole operator exact and
    * oracle-checkable. Docs tied at a boundary value land on one
    * deterministic side.
    *
    * Scale shape: ranking windows partition BY LANGUAGE (distributed
    * — no global sort); the boundary table is 2 values per language
    * and broadcasts back; the bucketing itself is a map-only CASE.
    * At 100 TB the only supra-linear stage is the per-language sort
    * the window needs, the same cost CCNet's own percentile pass pays. */
  def ccnetBuckets(df: DataFrame, text: Column, id: Column,
      lang: Column): DataFrame = {
    // One materialization: the scored table feeds BOTH the boundary
    // derivation and the final bucketing join (the sigAndShingles
    // lesson — without this the whole LM scoring plan runs twice).
    val scored = bigramLmScore(df, text, id)
      .join(df.select(id.as("doc_id"), lang.as("lang")), Seq("doc_id"))
      .localCheckpoint()
    ccnetBucketed(scored, ccnetBounds(scored))
  }

  /** Per-language tercile boundaries of a scored table
    * `(doc_id, lang, lm_score)` — the trained half of the CCNet gate,
    * 2 values per language; persist alongside [[bigramLmFit]]'s model
    * for online bucketing (st26). */
  def ccnetBounds(scored: DataFrame): DataFrame = {
    val byLang = Window.partitionBy(col("lang"))
    scored
      .withColumn("rk",
        row_number().over(byLang.orderBy(col("lm_score"), col("doc_id"))))
      .withColumn("n", count(lit(1)).over(byLang))
      .groupBy(col("lang")).agg(
        max(when(col("rk") === expr("ceil(n / 3.0)"), col("lm_score")))
          .as("b1"),
        max(when(col("rk") === expr("ceil(2 * n / 3.0)"), col("lm_score")))
          .as("b2"))
  }

  /** Bucket a scored table against FROZEN boundaries — a broadcast
    * join + map-only CASE, the serve half usable per micro-batch. */
  def ccnetBucketed(scored: DataFrame, bounds: DataFrame): DataFrame =
    scored.join(broadcast(bounds), Seq("lang"))
      .select(col("doc_id"), col("lang"), col("lm_score"),
        when(col("lm_score") <= col("b1"), lit("tail"))
          .when(col("lm_score") <= col("b2"), lit("middle"))
          .otherwise(lit("head")).as("bucket"))

  /** Deterministic train/val/test split by content-free key hash —
    * the reproducible sharding every training pipeline needs (same doc
    * lands in the same split on every run, every engine, any partition
    * count). Bucket = first 4 md5 hex digits of the id, mod 100:
    * train < 90, val < 95, else test. Pure Catalyst, no sampling RNG. */
  def hashSplit(df: DataFrame, id: Column,
      trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val (bucket, split) = splitCols(id, trainPct, valPct)
    df.select(id.as("doc_id"), bucket.as("bucket"), split.as("split"))
  }

  /** The (bucket, split) expressions of [[hashSplit]], exposed so wider
    * plans (the curation composite) can embed the assignment without a
    * join. */
  def splitCols(id: Column,
      trainPct: Int = 90, valPct: Int = 5): (Column, Column) = {
    val bucket = conv(substring(md5(id.cast("string")), 1, 4), 16, 10)
      .cast("long") % 100
    val split = when(bucket < trainPct, "train")
      .when(bucket < trainPct + valPct, "val")
      .otherwise("test")
    (bucket, split)
  }

  /** c41: SPLIT-BALANCE AUDIT — is the [[hashSplit]] assignment
    * actually iid with respect to source composition? Per
    * (split, source): doc and token counts, plus the exact
    * cross-multiplied deviation test
    * 100·|nd_ss·N − N_split·nd_src| > N_split·nd_src
    * (±1% relative deviation of the split's source share from the
    * corpus share) — the check that catches a content-correlated id
    * scheme silently skewing val/test before anyone trains on it.
    * All counts are exact longs; the deviation products ride
    * DECIMAL(38,0) so the audit is engine-exact at any corpus size.
    *
    * Scale shape: one corpus scan into a (split, source) aggregate;
    * the three marginals are tiny re-aggregations of THAT frame
    * (splits·sources rows) joined back broadcast — the corpus is
    * never rescanned or reshuffled. */
  def splitBalance(df: DataFrame, id: Column, source: Column,
      tokens: Column, trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    val d38 = (c: Column) => c.cast(DecimalType(38, 0))
    val (_, split) = splitCols(id, trainPct, valPct)
    val g = df.select(split.as("split"), source.as("source"),
        tokens.cast("long").as("toks"))
      .groupBy(col("split"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("n_tokens"))
      .localCheckpoint()
    val bySplit = g.groupBy(col("split"))
      .agg(sum(col("n_docs")).as("n_split"))
    val bySrc = g.groupBy(col("source"))
      .agg(sum(col("n_docs")).as("n_src"))
    val total = g.select(sum(col("n_docs")).as("n_all"))
    g.join(broadcast(bySplit), Seq("split"))
      .join(broadcast(bySrc), Seq("source"))
      .crossJoin(broadcast(total))
      .select(col("split"), col("source"), col("n_docs"),
        col("n_tokens"),
        when(lit(100L) * abs(d38(col("n_docs")) * col("n_all") -
              d38(col("n_split")) * col("n_src")) >
            d38(col("n_split")) * col("n_src"), 1L)
          .otherwise(0L).as("skewed"))
  }

  /** t25: deterministic mask corruption — the denoising-objective
    * construction step (BERT's masked-LM / the per-token limit of
    * T5-style span corruption, Devlin et al. 2018 / Raffel et al.
    * 2020, public) run as a data-prep pass: token position i of doc d
    * is masked iff `h32(d ∥ '_' ∥ i) mod modulo == 0` (≈1/modulo of
    * positions, content-free and reproducible — the same doc always
    * yields the same example, the property a resumable training run
    * needs), producing per doc the corrupted `input_text`, the
    * `target_text` of masked tokens in order, and the counts.
    *
    * Scale shape: map-only — two indexed higher-order functions
    * (`transform`/`filter` with the (element, index) lambda) per row,
    * all codegen'd Catalyst, no explode, no shuffle, no state; the
    * output is exactly one row per input row, so this composes with
    * t09/t12 downstream at any corpus size. */
  def maskCorruption(df: DataFrame, text: Column, id: Column,
      modulo: Int = 7): DataFrame = {
    def masked(i: Column, idc: Column) =
      conv(substring(md5(concat(idc.cast("string"), lit("_"),
        i.cast("string"))), 1, 8), 16, 10).cast("long") % modulo === 0
    df.select(id.as("doc_id"), split(text, " ").as("w"))
      .select(col("doc_id"),
        size(col("w")).cast("long").as("n_tokens"),
        size(filter(col("w"), (_, i) => masked(i, col("doc_id"))))
          .cast("long").as("n_masked"),
        array_join(transform(col("w"), (x, i) =>
          when(masked(i, col("doc_id")), lit("<mask>")).otherwise(x)), " ")
          .as("input_text"),
        array_join(filter(col("w"), (_, i) => masked(i, col("doc_id"))), " ")
          .as("target_text"))
  }

  /** c07: dataset SEAL — the reproducibility manifest a training run
    * pins before touching data: per t07 hash-split, the doc count,
    * token count, and an ORDER-INDEPENDENT content digest (bit_xor of
    * each doc's 60-bit text hash — XOR commutes and never overflows,
    * so the digest is identical whatever partitioning, task order or
    * file layout produced it, and any added / removed / edited doc
    * flips it). Verifying a dataset copy = recomputing three numbers
    * per split; this is the content-address the c04 dataset card and
    * d21 snapshot diff both implicitly assume exists.
    *
    * Scale shape: one scan, map-side split assignment + per-doc hash,
    * a 3-group aggregation; bit_xor combines partially map-side like
    * any algebraic agg. */
  def datasetSeal(df: DataFrame, text: Column, id: Column): DataFrame = {
    val (_, split) = splitCols(id)
    df.select(split.as("split"),
        size(org.apache.spark.sql.functions.split(text, " ")).cast("long")
          .as("toks"),
        h60(text).as("digest0"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("n_tokens"),
        expr("bit_xor(digest0)").as("digest"))
  }

  /** Temperature-based corpus mixture sampling (α = 1/2): source k is
    * sampled at rate ∝ √n_k — the standard multilingual/multi-corpus
    * rebalancing (Conneau & Lample 2019's exponentiated sampling;
    * flattens the head without drowning the tail). Selection is
    * HASH-THRESHOLDED, not ranked: doc d survives iff its content-free
    * md5 fraction < rate(source) — one map-side comparison against a
    * broadcast table of ≤ #sources rows, which is the 100 TB shape (an
    * exact-count variant would rank every doc within its source: one
    * task per source, the t14 window collapse). Rates are IEEE doubles
    * built from exact integer counts + sqrt (correctly rounded by IEEE
    * 754), so both engines compute bit-identical thresholds and the
    * sample is reproducible anywhere. */
  def temperatureSample(df: DataFrame, id: Column, source: Column,
      totalTarget: Long): DataFrame = {
    val counts = df.groupBy(source.as("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("w", sqrt(col("n").cast("double")))
    val rates = counts
      .crossJoin(broadcast(counts.agg(sum(col("w")).as("tot"))))
      .select(col("source"),
        least(lit(1.0), lit(totalTarget.toDouble) * col("w")
          / (col("tot") * col("n").cast("double"))).as("rate"))
    val frac = conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("double") / lit(4294967296.0)
    df.select(id.as("doc_id"), source.as("source"), frac.as("frac"))
      .join(broadcast(rates), Seq("source"))
      .filter(col("frac") < col("rate"))
      .select(col("source"), col("doc_id"))
  }

  /** Per-source vocabulary statistics — the corpus-health numbers a
    * curation run reads before and after filtering: token volume,
    * vocabulary size, hapax count (Heaps-law tail) and the mass share
    * of the top-k terms (the Zipf head; a near-1 share flags templated
    * or boilerplate sources). All counts are exact integers; the only
    * float is the final mass ratio, one IEEE divide.
    *
    * Scale shape: tokens shuffle ONCE into the (source, term) count —
    * the vocabulary-sized table both readers consume via a reused
    * exchange. The totals are a plain per-source rollup; the top-k
    * side ranks with a row_number window whose WindowGroupLimit prunes
    * every partition to k rows per source BEFORE the source-keyed
    * shuffle — no per-source global sort materializes (the t14
    * lesson). The closing join is per-source rows only. */
  def vocabStats(df: DataFrame, text: Column, source: Column,
      topK: Int = 10): DataFrame = {
    val tok = df.select(source.as("source"),
      explode(split(text, " ")).as("term"))
      .filter(length(col("term")) > 0)
    val c = tok.groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val totals = c.groupBy(col("source"))
      .agg(sum(col("cnt")).as("total_tokens"),
        count(lit(1)).as("vocab"),
        count(when(col("cnt") === 1, 1)).as("hapax"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("cnt").desc, col("term"))
    val top = c.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= topK)
      .groupBy(col("source")).agg(sum(col("cnt")).as("topk_tokens"))
    totals.join(top, Seq("source"))
      .select(col("source"), col("total_tokens"), col("vocab"),
        col("hapax"),
        (col("topk_tokens").cast("double")
          / col("total_tokens").cast("double")).as("topk_mass"))
  }

  /** Fair-share quota mix — the per-domain cap + global budget
    * allocation of crawl curation (Common Crawl pipelines cap documents
    * per registrable domain BEFORE applying the corpus budget, so one
    * giant domain cannot eat the mix). Two deterministic ranks:
    * within-source rank by (quality desc, id) capped at `perSource`,
    * then the survivors ranked ROUND-ROBIN — by (srank, quality desc,
    * id) — so every source places its best doc before any source
    * places its second, and the global `budget` cuts across sources
    * fairly. Output: the admitted docs with both ranks.
    *
    * Scale shape: one shuffle on source for the per-source window
    * (domains are many → fine-grained partitions; a pathological
    * mega-domain is bounded by the cap itself); the survivors
    * (≤ #sources · perSource rows, localCheckpoint-pinned so the
    * corpus window runs once) are then round-robin-ranked by the
    * bucketed [[graft.ops.Ranks]] pass — bounded OR NOT, no stage
    * ever ranks through a single task. */
  def quotaMix(df: DataFrame, id: Column, source: Column,
      quality: Column, perSource: Int, budget: Int): DataFrame = {
    val wSrc = Window.partitionBy(col("source"))
      .orderBy(col("q").desc, col("id"))
    val survivors = df
      .select(id.as("id"), source.as("source"), quality.as("q"))
      .withColumn("srank", row_number().over(wSrc))
      .filter(col("srank") <= perSource)
      .localCheckpoint()
    val (ranked, _, _) = Ranks.rankedCumsumTotalsTies(survivors,
      col("srank"), Seq(-col("q"), col("id")), lit(1L),
      rankCol = "grank", cumCol = "__qm_cum")
    ranked.filter(col("grank") <= budget)
      .select(col("id").as("doc_id"), col("source"),
        col("srank").cast("long").as("srank"),
        col("grank").cast("long").as("grank"))
  }

  /** Curriculum construction — order the corpus by a difficulty proxy
    * and cut it into token-budgeted phases (curriculum learning,
    * Bengio et al. 2009, public; in LLM pipelines: easy/short docs
    * first, the mix hardening per phase). Docs sort by (difficulty,
    * id); each doc's phase is its STARTING token offset divided by the
    * per-phase budget ceil(total/nPhases) — integer arithmetic
    * end-to-end, so the assignment is engine-exact and a doc never
    * straddles phases by rounding.
    *
    * Scale shape: same as [[ppsSample]] — the global (difficulty, id)
    * rank and the running token sum ride ONE bucketed
    * [[graft.ops.Ranks.rankedCumsumTotals]] pass (two tiny driver
    * folds + per-bucket windows, parallel across buckets — never an
    * unpartitioned window), and the corpus token total falls out of
    * the same pass for free, so the phase budget is a plan-time
    * literal instead of a broadcast 1-row join. */
  def curriculumPhases(df: DataFrame, id: Column, difficulty: Column,
      tokens: Column, nPhases: Int): DataFrame = {
    val base = df.select(id.as("id"), difficulty.as("diff"),
      tokens.cast("long").as("n_tokens"))
    val (ranked, n, tot) = Ranks.rankedCumsumTotals(
      base, col("diff"), col("id"), col("n_tokens"),
      rankCol = "seq", cumCol = "cum", pin = true)
    val budget = (tot + nPhases - 1) / nPhases
    // Empty corpus → empty phase table; a NON-empty corpus with zero
    // total tokens would divide by a zero budget — fail loudly.
    require(n == 0 || budget > 0,
      s"curriculumPhases: corpus token total $tot yields a zero " +
        s"per-phase budget for $nPhases phases")
    ranked.select(col("id").as("doc_id"), col("seq"), col("n_tokens"),
      expr(s"(cum - n_tokens) div ${math.max(budget, 1L)}").as("phase"))
  }

  /** Systematic probability-proportional-to-size sampling — the
    * integer-exact weighted sampler (Madow's systematic PPS): docs in
    * id order, cumulative weight W_i, step = total // n; doc i is
    * drawn iff the cumulative interval (W_{i-1}, W_i] contains a
    * multiple of the step, i.e. W_i // step > W_{i-1} // step. Every
    * arithmetic step is integer, so the draw is bit-deterministic in
    * any engine — no float u^(1/w) priorities, no RNG. With weights
    * below the step (true here: max n_chars 553 vs step ~2.5k) this
    * is the classic without-replacement PPS draw of ~n docs.
    *
    * Scale shape: the cumulative sum in id order is ONE bucketed
    * [[graft.ops.Ranks.rankedCumsumTotals]] pass — per-bucket windows
    * parallel across buckets, never an unpartitioned window — and the
    * weight total (hence the sampling step) falls out of the same
    * pass's driver folds, so the draw filter is pure codegen'd
    * integer arithmetic against a literal step. */
  def ppsSample(df: DataFrame, id: Column, weight: Column, n: Int)
      : DataFrame = {
    val base = df.select(id.as("id"), weight.cast("long").as("w"))
    val (ranked, _, tot) = Ranks.rankedCumsumTotals(
      base, col("id"), col("id"), col("w"),
      rankCol = "__pps_rank", cumCol = "cum", pin = true)
    val step = tot / n
    require(step > 0,
      s"ppsSample: total weight $tot < n=$n — step would be 0")
    ranked.filter(expr(s"(cum div $step) > ((cum - w) div $step)"))
      .select(col("id").as("doc_id"), col("w").as("weight"), col("cum"))
  }

  /** t33: Flesch-style readability grading, integer-exact. The three
    * per-doc counts are regex-derived (words `[A-Za-z0-9]+`, syllable
    * proxy = vowel GROUPS `[aeiou]+` case-insensitive — the standard
    * heuristic when no dictionary is available); unpunctuated corpora
    * (this fixture) get the documented 20-words-per-sentence
    * convention: `n_sentences = max(1, ceil(words/20))`. The Flesch
    * comparison `206.835 − 1.015·(w/s) − 84.6·(y/w) ≥ T` is
    * CROSS-MULTIPLIED by `s·w·1000` so grading involves only int64
    * products — no division, no floats, bit-identical in any engine
    * (the counts bound the products far below overflow: a 1 M-word
    * doc is ~2·10¹⁶ < 2⁶³). Map-only: one scan stage, no shuffle. */
  def readability(df: DataFrame, text: Column, id: Column,
      wordsPerSentence: Int = 20): DataFrame = {
    val w = size(regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0)))
      .cast("long")
    val y = size(regexp_extract_all(lower(text), lit("[aeiou]+"), lit(0)))
      .cast("long")
    // F >= T  <=>  206835·s·w − 1015·w² − 84600·s·y >= 1000·T·s·w
    def atLeast(t: Long, sw: Column, ww: Column, sy: Column) =
      lit(206835L) * sw - lit(1015L) * ww - lit(84600L) * sy >=
        lit(1000L * t) * sw
    df.select(id.as("doc_id"), w.as("n_words"), y.as("n_syllables"))
      .withColumn("n_sentences", greatest(lit(1L),
        expr(s"(n_words + ${wordsPerSentence - 1}) div $wordsPerSentence")))
      .withColumn("grade",
        when(atLeast(70, col("n_sentences") * col("n_words"),
          col("n_words") * col("n_words"),
          col("n_sentences") * col("n_syllables")), "easy")
        .when(atLeast(50, col("n_sentences") * col("n_words"),
          col("n_words") * col("n_words"),
          col("n_sentences") * col("n_syllables")), "standard")
        .otherwise("hard"))
  }

  /** t35: per-source CORPUS DRIFT as Jensen-Shannon divergence in
    * exact fixed point — the "did this source's language shift away
    * from the mix" monitor a training-data pipeline runs per ingest
    * source (the t17 DSIR / t19 temperature machinery weighs sources;
    * this measures how far each one's unigram distribution sits from
    * everyone else's). JS(P‖Q) = ½·KL(P‖M) + ½·KL(Q‖M), M = ½(P+Q);
    * per word the log argument p/m = 2·cp·tq / (cp·tq + cq·tp) is a
    * ratio of exact integer products — held in DECIMAL(38,0), exact
    * to 10^38, matching the oracle's HUGEINT — its log2 is the FMA-proof
    * [[graft.functions.PortableMath.withLog2Fixed]] integer, and each
    * KL numerator is a plain integer SUM Σ cp·lfx — no double fold
    * anywhere; the only doubles are the final two divisions and one
    * 0.5·(a+b) (identically rounded everywhere). Scale shape: counts
    * are one (source, word) exchange; the scored grid is
    * sources × vocabulary — model-sized, like every t-series
    * artifact — and the corpus is scanned once. */
  def jsDrift(df: DataFrame, text: Column, src: Column): DataFrame = {
    import graft.functions.PortableMath
    val tok = df.select(src.as("src"), explode(split(text, " ")).as("w"))
      .filter(col("w") =!= "")
    val c = tok.groupBy(col("src"), col("w"))
      .agg(count(lit(1)).as("cp")).localCheckpoint()
    val g = c.groupBy(col("w")).agg(sum(col("cp")).as("gw"))
    val tpf = c.groupBy(col("src")).agg(sum(col("cp")).as("tp"))
    val tot = g.agg(sum(col("gw")).as("tt"))
    val grid = tpf.crossJoin(broadcast(g))
      .join(c, Seq("src", "w"), "left")
      .withColumn("cp", coalesce(col("cp"), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("cq", col("gw") - col("cp"))
      .withColumn("tq", col("tt") - col("tp"))
    // Products in DECIMAL(38,0): cp·tq terms are (count × corpus-total)
    // products that pass 2^63 long before any real 100 TB corpus does;
    // the oracle's sums are HUGEINT already, so decimal is what ALIGNS
    // the engines (both round the same exact integer to double). The
    // emitted KL sums stay BIGINT through exactLong — loud on overflow,
    // like the oracle's HUGEINT→BIGINT cast, never a silent wrap.
    val d38 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    def klSum(cnt: String, num: Column, out: String, nOut: String) =
      PortableMath.withLog2Fixed(
        grid.filter(col(cnt) > 0L)
          .withColumn("odds", num.cast("double") /
            (d38(col("cp")) * col("tq") + d38(col("cq")) * col("tp"))
              .cast("double")),
        col("odds"), "lfx")
        .groupBy(col("src"))
        .agg(PortableMath.exactLong(
            sum(d38(col(cnt)) * col("lfx")), out).as(out),
          count(lit(1)).as(nOut))
    val p = klSum("cp", lit(2L) * d38(col("cp")) * col("tq"), "sp_fx",
      "n_words_p")
    val q = klSum("cq", lit(2L) * d38(col("cq")) * col("tp"), "sq_fx",
      "n_words_q")
    tpf.crossJoin(broadcast(tot))
      .withColumn("tq", col("tt") - col("tp"))
      .join(p, Seq("src")).join(q, Seq("src"))
      .select(col("src").as("source"), col("tp"), col("tq"),
        col("n_words_p"), col("n_words_q"), col("sp_fx"), col("sq_fx"),
        (lit(0.5) * (col("sp_fx").cast("double") /
            (col("tp") * lit(65536L)).cast("double") +
          col("sq_fx").cast("double") /
            (col("tq") * lit(65536L)).cast("double"))).as("js_bits"))
  }

  /** t36: Heaps'-law vocabulary-growth curve — cumulative distinct
    * tokens vs cumulative token count at `steps` corpus checkpoints
    * (does vocabulary keep growing, i.e. is more data still bringing
    * new words?). The naive formulation (cumulative COUNT DISTINCT
    * per prefix) is quadratic; this one is two shuffles total via the
    * first-occurrence identity: vocab(D) = #tokens whose FIRST doc
    * has position ≤ D. Doc positions come from
    * [[graft.ops.Ranks.rankedCumsum]] (which also yields the
    * cumulative token counts); first docs from one token-keyed
    * min-aggregate; the checkpoint grid is 10 broadcast rows. All
    * counts exact longs. */
  /** t47: VOCABULARY COVERAGE CURVE — for each candidate vocabulary
    * budget k, the share of all corpus token OCCURRENCES covered by
    * the k most frequent words: the table a tokenizer/vocab design
    * consults before fixing its size (Zipf makes the head huge —
    * t35's slope says how fast; this says exactly how much a budget
    * buys). Complements t36 (Heaps: how vocabulary GROWS with corpus)
    * with the dual: how coverage grows with vocabulary.
    *
    * The frequency-descending rank and the running covered-token sum
    * ride ONE bucketed [[graft.ops.Ranks]] pass over the collapsed
    * word-count table (weight = count, so `cum` IS covered tokens);
    * each budget then reads a single boundary row — a ≤|ks|-row
    * driver collect, the sanctioned bounded pattern. */
  def vocabCoverage(df: DataFrame, text: Column,
      ks: Seq[Int] = Seq(100, 1000, 10000)): DataFrame = {
    val spark = df.sparkSession
    val c = df
      .select(explode(split(text, " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
    val (ranked, n, tot) = graft.ops.Ranks.rankedCumsumTotals(
      c.withColumn("neg", -col("cnt")),
      col("neg"), col("word"), col("cnt"))
    val bounds = ks.map(k => math.min(k.toLong, n)).distinct
    val cumAt = ranked.filter(col("rank").isin(bounds: _*))
      .select(col("rank"), col("cum"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // Empty corpus: every budget covers 0 of 0 tokens (coverage 0.0)
    // rather than crashing on cumAt(0) / dividing by tot = 0.
    val rows = ks.map { k =>
      val vs = math.min(k.toLong, n)
      val covered = if (vs == 0) 0L else cumAt(vs)
      (k.toLong, vs, covered, tot,
        if (tot == 0) 0.0 else covered.toDouble / tot.toDouble)
    }
    import spark.implicits._
    rows.toDF("k", "vocab_size", "covered_tokens", "total_tokens",
      "coverage")
  }

  def heapsLaw(df: DataFrame, text: Column, id: Column,
      steps: Int = 10): DataFrame = {
    val ws = filter(split(text, " "), w => w =!= "")
    val perDoc = df.select(id.as("did"), size(ws).cast("long").as("ntok"))
    val ranked = Ranks.rankedCumsum(perDoc, col("did"), col("did"),
      col("ntok"))
    val n = ranked.count()
    val spark = df.sparkSession
    val cpDf = broadcast(spark.createDataFrame(
      (1 to steps).map(f => (f.toLong, (f * n + steps - 1) / steps)))
      .toDF("checkpoint", "d"))
    val tokCum = ranked.join(cpDf, col("rank") === col("d"))
      .select(col("checkpoint"), col("d"), col("cum"))
    val firstDoc = df.select(id.as("did"), explode(ws).as("w"))
      .groupBy(col("w")).agg(min(col("did")).as("did"))
    val vocab = firstDoc.join(ranked.select(col("did"), col("rank")),
        Seq("did"))
      .crossJoin(cpDf)
      .filter(col("rank") <= col("d"))
      .groupBy(col("checkpoint")).agg(count(lit(1)).as("vocab_cum"))
    tokCum.join(vocab, Seq("checkpoint"))
      .select(col("checkpoint"), col("d").as("n_docs_cum"),
        col("cum").as("tokens_cum"), col("vocab_cum"))
  }

  /** t38: weighted sampling WITHOUT replacement — Efraimidis–Spirakis
    * A-ES, the reservoir canon (each item keyed u^(1/w), top-k keys
    * win; inclusion probability ∝ weight, no replacement by
    * construction). Sampling must be REPRODUCIBLE in a pipeline, so u
    * is an md5-derived uniform on a 2^20 grid (exact double, inside
    * the fixed-point-log ladder's domain) and the ranking key is
    * log-transformed: maximizing u^(1/w) == maximizing log2(u)/w,
    * computed as the exact integer (log2fx(u)·1024) div w — both
    * engines truncate identically, so the SAMPLE ITSELF is
    * bit-reproducible anywhere (t27's PPS is systematic/with-
    * replacement; this is the without-replacement estimator).
    * Map-only scoring + one top-k. */
  def weightedSample(df: DataFrame, id: Column, weight: Column,
      k: Int = 50): DataFrame = {
    import graft.functions.PortableMath
    val base = df.select(id.as("sid"), weight.cast("long").as("w"))
      .filter(col("w") > 0)
      .withColumn("u",
        (pmod(graft.functions.Hashes.h60(col("sid").cast("string")),
          lit(1048576L)) + lit(1L)).cast("double") / lit(1048576.0))
    PortableMath.withLog2Fixed(base, col("u"), "lfx")
      .withColumn("s_fp", expr("(lfx * 1024L) div w"))
      .orderBy(col("s_fp").desc, col("sid"))
      .limit(k)
      .select(col("sid").as("doc_id"), col("w"), col("lfx"), col("s_fp"))
  }

  /** t37: PMI collocations — the pointwise-mutual-information ranking
    * of word pairs (Church–Hanks), the collocation-mining canon. PMI
    * needs a log, and a cross-engine-checkable log means
    * [[graft.functions.PortableMath.withLog2Fixed]]: the odds
    * p(ab)/(p(a)p(b)) = (c_ab·N_tok²)/(N_bi·c_a·c_b) is one double
    * division of DECIMAL(38,0) products (exact to 10^38 — any corpus;
    * both engines round the same decimal→double conversion
    * identically), and the fixed-point log2 is bit-identical in any
    * engine, so the top-k ORDER is exact. Bigram/unigram counts are
    * two shuffles; the ladder evaluates only on the support-filtered
    * pair table (t34's already-aggregated-frames discipline), and the
    * broadcast unigram side is semi-joined down to the words of the
    * surviving pairs — pair-bounded, never vocabulary-bounded. */
  def pmiCollocations(df: DataFrame, text: Column,
      minCount: Long = 5L, k: Int = 20): DataFrame = {
    import graft.functions.PortableMath
    val ws = filter(split(text, " "), w => w =!= "")
    val toks = df.select(explode(ws).as("w"))
    val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val nTok = toks.agg(count(lit(1)).as("nt"))
    val bi = df.select(ws.as("ws"))
      .select(explode(when(size(col("ws")) >= 2,
        transform(sequence(lit(1), size(col("ws")) - 1),
          i => concat(element_at(col("ws"), i), lit(" "),
            element_at(col("ws"), i + 1))))
        .otherwise(array())).as("g"))
    val nBi = bi.agg(count(lit(1)).as("nb"))
    // The support filter bounds the pair table; materialize it once so
    // the word semi-join below does not re-run the bigram count. The
    // UNIGRAM table is corpus-vocabulary-sized — never broadcast it
    // whole; shrink it to the words that actually appear in surviving
    // pairs (pair-bounded, ≤ 2·|pairs| words) first.
    val pairs0 = bi.groupBy(col("g")).agg(count(lit(1)).as("cb"))
      .filter(col("cb") >= minCount)
      .withColumn("w1", split_part(col("g"), lit(" "), lit(1)))
      .withColumn("w2", split_part(col("g"), lit(" "), lit(2)))
      .localCheckpoint()
    val pairWords = pairs0.select(col("w1").as("w"))
      .union(pairs0.select(col("w2").as("w"))).distinct()
    val uniP = uni.join(pairWords, Seq("w"), "left_semi")
    // Odds in DECIMAL(38,0): the integer products stay exact far past
    // the 2^53 double range (supported up to 10^38 — beyond any real
    // corpus; the oracle widens identically via HUGEINT), and the one
    // decimal→double conversion is correctly rounded in both engines.
    val d38 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val pairs = pairs0
      .join(broadcast(uniP.withColumnRenamed("w", "w1")
        .withColumnRenamed("cu", "c1")), Seq("w1"))
      .join(broadcast(uniP.withColumnRenamed("w", "w2")
        .withColumnRenamed("cu", "c2")), Seq("w2"))
      .crossJoin(broadcast(nTok)).crossJoin(broadcast(nBi))
      .withColumn("odds",
        (d38(col("cb")) * col("nt") * col("nt")).cast("double") /
          (d38(col("nb")) * col("c1") * col("c2")).cast("double"))
    PortableMath.withLog2Fixed(pairs, col("odds"), "pmi_fp")
      .select(col("g").as("bigram"), col("cb").as("n_pair"),
        col("c1").as("n_w1"), col("c2").as("n_w2"), col("pmi_fp"),
        (col("pmi_fp").cast("double") / lit(65536.0)).as("pmi_bits"))
      .orderBy(col("pmi_fp").desc, col("bigram"))
      .limit(k)
  }

  /** t40: TF-IDF top-k keyword extraction per document — the corpus-
    * wide tagging op (t22's BM25 scores ad-hoc QUERIES against docs;
    * this scores every document's own terms against the corpus, the
    * label a curation pipeline attaches to each record). Exactness:
    * tf and df are exact longs, idf = log2(N/df) is ONE correctly-
    * rounded double division (both operands integer-valued, < 2^53)
    * fed to [[graft.functions.PortableMath.withLog2Fixed]] — the
    * fixed-point integer score tf·idf_fp sums/ranks exactly, so the
    * per-doc top-k ORDER is bit-deterministic in any engine. Scale
    * shape: one (doc, term) exchange for tf, one vocab exchange for
    * df, ranks attach by a vocab-keyed SHUFFLE equi-join (document
    * frequencies grow with the corpus — never broadcast), the log2
    * chain is map-only codegen, and the per-doc top-k window is
    * doc-partitioned. N rides a one-row broadcast. */
  def tfidfKeywords(df: DataFrame, text: Column, id: Column,
      k: Int = 3): DataFrame = {
    import graft.functions.PortableMath
    val ws = filter(split(text, " "), w => w =!= "")
    val toks = df.select(id.as("doc_id"), explode(ws).as("w"))
    val tf = toks.groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val n = toks.select(col("doc_id")).distinct()
      .agg(count(lit(1)).as("n"))
    val scored = tf.join(dfreq, Seq("w")).crossJoin(broadcast(n))
      .withColumn("ratio",
        col("n").cast("double") / col("df").cast("double"))
    PortableMath.withLog2Fixed(scored, col("ratio"), "idf_fp")
      .withColumn("score_fp", col("tf") * col("idf_fp"))
      .withColumn("rank", row_number().over(Window
        .partitionBy(col("doc_id"))
        .orderBy(col("score_fp").desc, col("w"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("w").as("term"),
        col("tf"), col("df"), col("score_fp"))
  }

  /** t39: Zipf rank-frequency slope — the power-law exponent of the
    * corpus vocabulary (Zipf's law: freq ∝ rank^s, s ≈ −1 for natural
    * language), the companion diagnostic to t36's Heaps' law: a
    * machine-generated or template-heavy corpus bends the slope, so
    * the fit is a one-row corpus-quality gate. Least squares over
    * (log2 rank, log2 freq) with BOTH logs in
    * [[graft.functions.PortableMath.withLog2Fixed]] integer fixed
    * point — the sums Σx, Σy, Σxy, Σx² are exact DECIMAL(38,0)
    * integers (the oracle's HUGEINT), num/den of the closed-form
    * slope are exact integer expressions, and the only floating point
    * is the two final correctly-rounded decimal→double conversions
    * and one division — bit-identical in any engine. The global
    * frequency rank comes from [[Ranks.rankedCumsum]] (vocab-scaled,
    * bucket-partitioned — never a single-task window); everything
    * after the rank is one map + one scalar aggregate. */
  def zipfSlope(df: DataFrame, text: Column): DataFrame = {
    import graft.functions.PortableMath
    val d38 = (c: Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val ws = filter(split(text, " "), w => w =!= "")
    val uni = df.select(explode(ws).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cu"))
    val ranked = Ranks.rankedCumsum(uni, -col("cu"), col("w"), lit(1L))
      .select(col("cu"), col("rank"))
    val withX = PortableMath.withLog2Fixed(ranked,
      col("rank").cast("double"), "xfx")
    val withXY = PortableMath.withLog2Fixed(withX,
      col("cu").cast("double"), "yfx")
    withXY
      .agg(count(lit(1)).as("k"),
        sum(d38(col("xfx"))).as("sx"), sum(d38(col("yfx"))).as("sy"),
        sum(d38(col("xfx")) * col("yfx")).as("sxy"),
        sum(d38(col("xfx")) * col("xfx")).as("sxx"))
      .select(col("k").as("n_vocab"),
        (d38(col("k")) * col("sxy") - col("sx") * col("sy"))
          .cast("double").as("num"),
        (d38(col("k")) * col("sxx") - col("sx") * col("sx"))
          .cast("double").as("den"))
      .withColumn("slope", col("num") / col("den"))
  }

  /** t41: per-document lexical diversity — type-token ratio and hapax
    * share, the cheap proxy for "template spam vs real prose" that
    * corpus reports run next to the Gopher gates (a doc whose TTR
    * collapses is boilerplate even when its char-class mix looks
    * clean). All-integer outputs: counts are longs, ratios are ppm by
    * integer division — no float anywhere, so the hash is trivially
    * engine-identical. Scale: one (doc, word) aggregate then one
    * per-doc aggregate — both keyed shuffles that parallelize with
    * the corpus; nothing global, nothing collected. */
  def lexicalDiversity(df: DataFrame, text: Column, id: Column): DataFrame = {
    val ws = filter(split(text, " "), w => w =!= "")
    val tf = df.select(id.as("doc_id"), explode(ws).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    tf.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(when(col("tf") === 1, 1L).otherwise(0L)).as("hapax"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"), col("hapax"),
        expr("n_types * 1000000L div n_tokens").as("ttr_ppm"),
        expr("hapax * 1000000L div n_types").as("hapax_ppm"))
  }

  /** t42: per-document Shannon entropy of the token distribution —
    * the information-density gate (near-zero entropy = one token
    * repeated = degenerate text; the metric CCNet-style pipelines
    * bucket on next to perplexity). Exactness: H = log2(n) −
    * (Σ tf·log2 tf)/n is assembled from [[PortableMath.withLog2Fixed]]
    * integers — the numerator log2n_fp·n − Σ tf·l2tf is an EXACT long
    * (tf and l2tf are per-doc bounded: a 10⁶-token doc keeps the
    * product under 2⁴⁰ — documented bound, far above any training
    * document), and the single closing divide is correctly-rounded
    * IEEE on both engines. Same two keyed aggregates as
    * [[lexicalDiversity]] plus the 16-round log ladder per distinct
    * (doc, token) — map-side work that scales with the corpus. */
  /** t45: skip-gram window co-occurrence — the word2vec/GloVe
    * preprocessing artifact t37's adjacent bigrams cannot provide:
    * unordered word pairs co-occurring within a ±`window` token
    * distance, counted over the corpus, top-k by count. Pairs are
    * canonicalized (lexicographic least/greatest) so (a,b) and (b,a)
    * accumulate together. The position self-join is doc-keyed with a
    * bounded distance predicate — per-doc work scales with doc length
    * × window, the shuffle carries (pair, partial count), and the
    * closing top-k is TakeOrdered + a k-row rank window. All counts
    * are longs; no floats anywhere. */
  def skipgramCooc(df: DataFrame, text: Column, id: Column,
      window: Int = 2, minCount: Long = 5L, k: Int = 20): DataFrame = {
    val ws = filter(split(text, " "), w => w =!= "")
    val pos = df.select(id.as("doc_id"), posexplode(ws).as(Seq("i", "w")))
    val pairs = pos.as("a").join(pos.as("b"),
        col("a.doc_id") === col("b.doc_id") &&
          col("b.i") > col("a.i") &&
          col("b.i") <= col("a.i") + window)
      .select(least(col("a.w"), col("b.w")).as("w1"),
        greatest(col("a.w"), col("b.w")).as("w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= minCount)
    val top = pairs.orderBy(col("c").desc, col("w1"), col("w2")).limit(k)
    top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w1"), col("w2"))))
  }

  /** t44: dedup-weighted token accounting — the honest corpus size:
    * raw token counts over-state a corpus exactly by its duplication,
    * so the number that predicts training value is the EFFECTIVE
    * count where each exact-duplicate cluster contributes its tokens
    * once (equivalently: every copy weighted 1/cluster-size). Emitted
    * per source in exact micro-tokens (toks·10⁶ div c — integer
    * division, engine-identical), next to the raw count and the
    * duplicated-doc tally: the three numbers a data card quotes when
    * it says "500 GB, 320 GB effective". Clusters come from t04's
    * whitespace-normalized content fingerprint; one fp-grain
    * aggregate + one fp-keyed join + one source-grain aggregate —
    * every shuffle is keyed, nothing global. */
  def effectiveTokens(df: DataFrame, text: Column, id: Column,
      source: Column): DataFrame = {
    val fp = md5(regexp_replace(lower(text), "\\s+", " "))
    val base = df.select(id.as("doc_id"), source.as("source"),
      size(split(text, " ")).cast("long").as("toks"), fp.as("fp"))
    val dup = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
    base.join(dup, Seq("fp"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("toks")).as("raw_tokens"),
        sum(expr("toks * 1000000L div c")).as("eff_tokens_micro"),
        sum(when(col("c") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
  }

  /** t43: code-vs-prose detector — the curation gate that routes
    * source code out of (or into) a text corpus: natural-language
    * quality filters (t02/t15) misscore code catastrophically, so the
    * split must happen FIRST. Pure heuristic over character classes
    * and keyword hits: code-punctuation density (braces, brackets,
    * semicolons, operators) and reserved-word count, combined into an
    * integer score in ppm of document length. Everything is counts
    * and integer division — map-only, codegen-friendly, and trivially
    * engine-identical; both engines count via the same
    * length-difference trick and the same non-overlapping regex. */
  def codeDetect(df: DataFrame, text: Column, id: Column,
      thresholdPpm: Long = 30000L): DataFrame = {
    val nChars = length(text).cast("long")
    val codePunct = (length(text) -
      length(regexp_replace(text, "[{}\\[\\]();=<>]", ""))).cast("long")
    val kw = regexp_count(text,
      lit("\\b(def|return|import|class|const|void|int|function|var)\\b"))
      .cast("long")
    df.select(id.as("doc_id"), nChars.as("n_chars"),
        codePunct.as("code_punct"), kw.as("n_keywords"))
      .filter(col("n_chars") > 0)
      .withColumn("score_ppm",
        expr("(code_punct * 10 + n_keywords * 200) * 1000000L div n_chars"))
      .withColumn("is_code", col("score_ppm") >= lit(thresholdPpm))
  }

  def tokenEntropy(df: DataFrame, text: Column, id: Column): DataFrame = {
    import graft.functions.PortableMath
    val ws = filter(split(text, " "), w => w =!= "")
    val tf = df.select(id.as("doc_id"), explode(ws).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val withL = PortableMath.withLog2Fixed(tf, col("tf").cast("double"),
      "l2tf")
    val perDoc = withL.groupBy(col("doc_id"))
      .agg(sum(col("tf")).as("n_tokens"), count(lit(1)).as("n_types"),
        sum(col("tf") * col("l2tf")).as("sum_tlog_fp"))
    PortableMath.withLog2Fixed(perDoc, col("n_tokens").cast("double"),
        "log2n_fp")
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        col("sum_tlog_fp"), col("log2n_fp"),
        ((col("log2n_fp") * col("n_tokens") - col("sum_tlog_fp"))
            .cast("double") /
          (col("n_tokens").cast("double") * lit(65536.0d))).as("entropy"))
  }

  /** t50: N-GRAM NOVELTY RATE per document — how much of each doc's
    * distinct 3-gram vocabulary appears in NO earlier document (by
    * doc_id order). The diversity-contribution measure a curation
    * pipeline uses to rank sources ("which feed still adds new
    * content") and to early-stop crawls whose novelty rate decays to
    * the template floor; the per-doc complement of d31's corpus-level
    * survival curve. First ownership is min(doc_id) per shingle — one
    * keyed aggregate over the exploded shingles (the d28 vocabulary
    * shuffle shape) and one keyed join back; no window, no broadcast
    * of anything row-scale. Docs with no 3-gram (< 3 words) emit
    * nothing, matching the oracle.
    *
    * Reference basis: goka has no text ops; this extends the
    * documents-table suite (SURVEY section 2.5). */
  def ngramNovelty(df: DataFrame, text: Column, id: Column,
      n: Int = 3): DataFrame = {
    val sh = graft.ops.Dedup.shingles(df, text, id, n)
    val first = sh.groupBy(col("s")).agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, Seq("s"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
          .as("n_novel"))
      .withColumn("novelty_rate", col("n_novel").cast("double") /
        col("n_shingles").cast("double"))
  }

  /** t51: INTRA-DOCUMENT REPETITION GATE — Gopher's duplicate-n-gram
    * class of rules ("Scaling Language Models", Rae et al. 2021,
    * table A1's dup-fraction rows): the fraction of a doc's 3-gram
    * OCCURRENCES that are repeats of an earlier occurrence in the
    * SAME doc, plus the top-n-gram mass share — the template/boiler/
    * looping-generation detector that cross-doc dedup (d01-d34) by
    * definition cannot see. Occurrences come from the non-distinct
    * shingle kernel; everything is one (doc, shingle) count and a
    * per-doc rollup — keyed shuffles only, never corpus-global. */
  def repetitionGate(df: DataFrame, text: Column, id: Column,
      n: Int = 3, maxDupFrac: Double = 0.2): DataFrame = {
    graft.plans.GraftExtensions.register(df.sparkSession)
    val occ = df.select(id.as("doc_id"),
        explode(call_function("graft_shingles", text, lit(n),
          lit(false))).as("s"))
      .groupBy(col("doc_id"), col("s"))
      .agg(count(lit(1)).as("c"))
    occ.groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_occ"),
        count(lit(1)).as("n_distinct"),
        max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_occ").cast("long").as("n_occ"),
        col("n_distinct"), col("top_c").cast("long").as("top_c"),
        ((col("n_occ") - col("n_distinct")).cast("double") /
          col("n_occ").cast("double")).as("dup_frac"),
        (col("top_c").cast("double") / col("n_occ").cast("double"))
          .as("top_frac"))
      .withColumn("keep",
        (col("n_occ") - col("n_distinct")) * 1000L <=
          col("n_occ") * lit((maxDupFrac * 1000).toLong))
  }

  /** Encoding-health audit — the mojibake detector of a web-crawl
    * curation stage: per doc, counts of (a) U+FFFD replacement
    * characters (a decoder already gave up), (b) the classic
    * UTF-8-read-as-Latin-1 double-encoding digraphs (Ã or Â followed
    * by another non-ASCII char — how "é" becomes "Ã©"), and (c) C0
    * control characters other than tab/newline (binary bleed). All
    * three are exact regexp counts; `keep` is zero-tolerance on (a)
    * and (c) and a per-kilochar budget on (b). Map-only, a pure scan
    * stage at 100 TB — encoding damage is per-row evidence, never a
    * join. */
  def encodingAudit(df: DataFrame, text: Column, id: Column,
      maxDigraphPerKiloChar: Long = 2L): DataFrame = {
    val digraph = "[\\x{C3}\\x{C2}][\\x{A0}-\\x{FF}]"
    val ctl = "[\\x{00}-\\x{08}\\x{0B}\\x{0C}\\x{0E}-\\x{1F}]"
    df.select(
      id.as("doc_id"),
      length(text).cast("long").as("n_chars"),
      regexp_count(text, lit("\uFFFD")).cast("long").as("n_replacement"),
      regexp_count(text, lit(digraph)).cast("long").as("n_digraphs"),
      regexp_count(text, lit(ctl)).cast("long").as("n_controls"))
      .withColumn("keep",
        col("n_replacement") === 0L && col("n_controls") === 0L &&
          col("n_digraphs") * 1000L <=
            col("n_chars") * lit(maxDigraphPerKiloChar))
  }

  /** Cross-source score quantile normalization — the harmonization
    * step before mixing quality scores from heterogeneous sources
    * (each source's classifier has its own scale; rank within source
    * is the comparable signal): per doc, the score's WITHIN-SOURCE
    * discrete quantile in ppm, `q_ppm = cum·1,000,000 div n_source`
    * over the tie-collapsed per-(source, score) counts — ties share
    * the quantile of their band's UPPER edge, the standard empirical-
    * CDF convention. Integers end to end; the per-source cumulative
    * window runs on the collapsed frame (value-domain-bounded), the
    * repo's q94/q102 discipline. */
  def quantileNormalize(scored: DataFrame): DataFrame =
    quantileNormalizeCollapsed(scored
      .groupBy(col("source"), col("score"))
      .agg(count(lit(1)).as("cnt")))

  /** [[quantileNormalize]] over an already-collapsed
    * (source, score, cnt) frame — st76 folds it over streamed
    * per-(source, score) counts, sharing t55's oracle hash. */
  def quantileNormalizeCollapsed(byScore: DataFrame): DataFrame = {
    val ord = Window.partitionBy(col("source")).orderBy(col("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col("source"))
    byScore
      .withColumn("cum", sum(col("cnt")).over(ord))
      .withColumn("n_source", sum(col("cnt")).over(all))
      .select(col("source"), col("score"), col("cnt").cast("long").as("cnt"),
        col("cum").cast("long").as("cum"),
        col("n_source").cast("long").as("n_source"),
        expr("(cum * 1000000) div n_source").as("q_ppm"))
  }

  /** Cohen's κ over a (source, a_keep, b_keep) flag frame — chance-
    * corrected agreement between two raters (here: two quality gates
    * run over the same corpus). The 2×2 confusion counts are exact
    * integers and κ = (n·(both+neither) − pe) / (n² − pe) with
    * pe = (a_pos·b_pos + a_neg·b_neg) stays integer until ONE final
    * division — at curation scale the question is never "do the gates
    * agree" (with 99% keep rates raw agreement is vacuously high) but
    * "do they agree MORE THAN CHANCE", which is exactly what κ
    * corrects for. One keyed aggregation; no per-pair work. */
  def kappaAgreement(flags: DataFrame): DataFrame =
    flags.groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("a_keep") && col("b_keep"), 1L).otherwise(0L))
          .as("both_keep"),
        sum(when(col("a_keep") && !col("b_keep"), 1L).otherwise(0L))
          .as("a_only"),
        sum(when(!col("a_keep") && col("b_keep"), 1L).otherwise(0L))
          .as("b_only"),
        sum(when(!col("a_keep") && !col("b_keep"), 1L).otherwise(0L))
          .as("neither"))
      .withColumn("pe_num",
        (col("both_keep") + col("a_only")) * (col("both_keep") + col("b_only")) +
          (col("b_only") + col("neither")) *
            (col("a_only") + col("neither")))
      .withColumn("kappa_num",
        col("n") * (col("both_keep") + col("neither")) - col("pe_num"))
      .withColumn("kappa_den", col("n") * col("n") - col("pe_num"))
      .withColumn("kappa",
        col("kappa_num").cast("double") / col("kappa_den").cast("double"))

  /** Expected calibration error over a collapsed
    * (source, bin, n, pos, sum_milli) reliability frame (bin = fixed-
    * width decile of the milli-score, pos = positives, sum_milli = the
    * bin's score mass): per bin, confidence = sum_milli/(1000·n_b) and
    * accuracy = pos/n_b; ECE = Σ_b (n_b/n)·|acc_b − conf_b|, which
    * collapses to the exact integer Σ_b |1000·pos_b − sum_milli_b|
    * over 1000·n — the quality-classifier audit a curation pipeline
    * runs before trusting a score as a sampling weight. The only
    * doubles are the per-bin readout ratios and ONE final division. */
  def eceCollapsed(binsIn: DataFrame): DataFrame = {
    val bins = binsIn.groupBy(col("source"), col("bin"))
      .agg(sum(col("n")).as("n_b"), sum(col("pos")).as("pos"),
        sum(col("sum_milli")).as("sum_milli"))
    val per = bins.groupBy(col("source"))
      .agg(sum(col("n_b")).as("n"),
        sum(abs(col("pos") * 1000L - col("sum_milli"))).as("ece_num"))
      .withColumn("ece_den", col("n") * 1000L)
      .withColumn("ece",
        col("ece_num").cast("double") / col("ece_den").cast("double"))
    bins
      .withColumn("accuracy",
        col("pos").cast("double") / col("n_b").cast("double"))
      .withColumn("confidence",
        col("sum_milli").cast("double") / (col("n_b") * 1000L)
          .cast("double"))
      .join(broadcast(per), Seq("source"))
  }
}
