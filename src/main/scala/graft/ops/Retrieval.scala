package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-retrieval serving operators over the curated corpus: BM25
  * ranked retrieval and inverted-index boolean search. Like the rest
  * of the t-ladder these are pure Catalyst plans (explode / groupBy /
  * window), no UDFs, and every score is replicable bit-for-bit by the
  * SQL oracle.
  *
  * Reference scope: goka itself has no retrieval surface (its tables
  * are key-value processor state, cf. reference systemtest/
  * multitopic_test.go's word-count tables); these operators are part
  * of SURVEY §2.5's additive pipeline surface — the "serve the corpus
  * you just curated" half of a training-data pipeline.
  */
object Retrieval {

  /** BM25 ranked retrieval (Robertson et al., TREC-3) with the true
    * Robertson–Spärck Jones log idf,
    * `idf = ln((N - df + 0.5) / (df + 0.5))` — made oracle-portable
    * by evaluating the `ln` through [[PortableMath.withLn]]'s pinned
    * `+ - * /` expression tree instead of a library log (library
    * `ln`s differ in the last ulp across engines; the portable tree
    * is bit-identical by construction, within ~1e-11 of `Math.log` —
    * RetrievalSpec pins the measured error AND top-k agreement with
    * a `Math.log`-scored in-JVM reference).
    *
    * Everything else is exact outright: tf, df, dl are integers;
    * avgdl and the score are IEEE doubles derived from integers
    * through the same literal expression tree the oracle uses
    * (k1 = 1.5 and b = 0.75 are exactly representable, so the
    * constants carry no literal-rounding risk); the per-document sum
    * over query terms folds in pinned term order (t13's ordered-list
    * fold). Note this corpus is tiny-vocabulary: common terms appear
    * in >half the documents, so their idf is NEGATIVE — the classic
    * RSJ behavior (Lucene adds +1 inside the log to suppress it); we
    * keep the unclamped TREC form and the fixture exercises both
    * signs.
    *
    * Scale shape: the query set is a broadcast literal; tokens are
    * filtered to query terms BEFORE the first shuffle, so the tf
    * aggregation moves O(matching tokens), not the corpus. The
    * 61-way-CASE ln ladder evaluates on the per-TERM df frame
    * (cardinality = query vocabulary, here 6 rows) and never per
    * corpus row. df and the global (N, sum dl) statistics are
    * partial-aggregated map-side. The only window is the per-query
    * rank over already-scored candidates — there is no window or
    * sort over the full corpus.
    */
  def bm25(df: DataFrame, text: Column, id: Column,
      queries: Seq[(String, Seq[String])],
      k1: Double = 1.5, b: Double = 0.75, k: Int = 10): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
    val allTerms = queries.flatMap(_._2).distinct
    val words = filter(split(text, " "), w => w =!= "")
    val sized = df.select(id.as("doc_id"), size(words).as("dl"),
      words.as("ws"))
    val stats = sized.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    val tf = sized
      .select(col("doc_id"), col("dl"), explode(col("ws")).as("w"))
      .filter(col("w").isInCollection(allTerms))
      .groupBy(col("doc_id"), col("dl"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val nD = col("n_docs").cast("double")
    val avgdl = col("sum_dl").cast("double") / nD
    // idf on the per-TERM frame: |query vocabulary| rows, so the
    // portable-ln ladder is evaluated a handful of times total.
    val idf = graft.functions.PortableMath.withLn(
      tf.groupBy(col("w")).agg(count(lit(1)).as("dft"))
        .crossJoin(broadcast(stats))
        .withColumn("odds",
          (nD - col("dft").cast("double") + lit(0.5)) /
            (col("dft").cast("double") + lit(0.5))),
      col("odds"), "idf")
      .select(col("w"), col("idf"))
    val tfD = col("tf").cast("double")
    val tfNorm = (tfD * (lit(k1) + lit(1.0))) /
      (tfD + lit(k1) * (lit(1.0) - lit(b) + lit(b) *
        (col("dl").cast("double") / avgdl)))
    val contrib = tf.join(broadcast(idf), "w").join(broadcast(qt),
        col("w") === col("term"))
      .crossJoin(broadcast(stats))
      .select(col("qid"), col("doc_id"), col("w"),
        (col("idf") * tfNorm).as("c"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("bm25").desc, col("doc_id").asc)
    contrib.groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_hit_terms"),
        sort_array(collect_list(struct(col("w"), col("c")))).as("l"))
      .select(col("qid"), col("doc_id"), col("n_hit_terms"),
        aggregate(col("l"), lit(0.0), (acc, x) => acc + x("c"))
          .as("bm25"))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col("qid"), col("doc_id"), col("n_hit_terms"),
        col("bm25"), col("rank"))
  }

  /** Library-log BM25 contribution for one (tf, df, dl) triple — the
    * in-JVM reference RetrievalSpec audits [[bm25]]'s portable-ln
    * scores and rankings against. */
  def bm25LogContribution(tf: Long, dfT: Long, dl: Long, nDocs: Long,
      sumDl: Long, k1: Double = 1.5, b: Double = 0.75): Double = {
    val avgdl = sumDl.toDouble / nDocs.toDouble
    val idf = math.log((nDocs.toDouble - dfT.toDouble + 0.5) /
      (dfT.toDouble + 0.5))
    val tfn = (tf.toDouble * (k1 + 1.0)) /
      (tf.toDouble + k1 * (1.0 - b + b * (dl.toDouble / avgdl)))
    idf * tfn
  }

  /** Conjunctive boolean search over an inverted index: for each
    * query (a set of required terms) return every document containing
    * ALL of them, with its per-term tf sum riding along as evidence.
    *
    * The plan IS the inverted index: tokenize once, keep only
    * postings for terms any query needs (broadcast semi-join — the
    * index for a query workload is built lazily for exactly the
    * touched vocabulary, the way a posting-list fetch touches only
    * the query's terms), then the AND is a count-match: a document
    * matches a query iff its number of DISTINCT matched terms equals
    * the query's term count. No intersection loops, no per-term
    * scans — one aggregation whose key is (qid, doc).
    *
    * Scale shape: postings move through ONE shuffle keyed (doc, term)
    * with map-side partial counts; the per-query term count is a
    * broadcast literal; result size is the match set. At 100 TB the
    * same plan serves a batch of thousands of queries in one pass —
    * the query dimension rides the broadcast, never re-scanning the
    * corpus. */
  def booleanSearch(df: DataFrame, text: Column, id: Column,
      queries: Seq[(String, Seq[String])]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val qt = queries.flatMap { case (q, ts) => ts.map(t => (q, t)) }
      .toDF("qid", "term")
    val nTerms = queries.map { case (q, ts) => (q, ts.distinct.size) }
      .toDF("qid", "q_n_terms")
    val allTerms = queries.flatMap(_._2).distinct
    val tf = df.select(id.as("doc_id"),
        explode(filter(split(text, " "), w => w =!= "")).as("w"))
      .filter(col("w").isInCollection(allTerms))
      .groupBy(col("doc_id"), col("w"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(qt), col("w") === col("term"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(count(lit(1)).as("n_matched"), sum(col("tf")).as("tf_sum"))
      .join(broadcast(nTerms), "qid")
      .filter(col("n_matched") === col("q_n_terms"))
      .select(col("qid"), col("doc_id"), col("n_matched"),
        col("tf_sum"))
  }

  /** Reciprocal-rank fusion of two per-query rankings — the standard
    * hybrid-search combiner (sparse BM25 + dense vector, Cormack et
    * al. 2009): `score(d) = Σ_r 1/(k + rank_r(d))` over the rankings
    * that contain d. Rank-based, so the two retrievers' incomparable
    * score scales never meet; a document missing from one list simply
    * contributes nothing (coalesce-to-0, the standard convention).
    *
    * Both inputs are (qid, doc_id, rank) top-k lists — k·|queries|
    * rows each, so the full-outer equi-join on (qid, doc_id) and the
    * re-rank window are candidate-list-sized, never corpus-sized: at
    * 100 TB the expensive part is the upstream retrievers, and fusion
    * adds one map-side-trivial join. The RRF terms are fixed-order
    * two-operand IEEE sums of exact reciprocals, so fused scores and
    * the re-rank are bit-deterministic cross-engine. */
  def rrfFuse(a: DataFrame, b: DataFrame, k: Int,
      kRrf: Double = 60.0): DataFrame = {
    val sa = a.select(col("qid"), col("doc_id"), col("rank").as("r_a"))
    val sb = b.select(col("qid").as("qid_b"), col("doc_id").as("doc_b"),
      col("rank").as("r_b"))
    def term(r: Column) =
      coalesce(lit(1.0) / (lit(kRrf) + r.cast("double")), lit(0.0))
    val w = Window.partitionBy(col("qid")).orderBy(col("rrf").desc,
      col("doc_id"))
    sa.join(sb, col("qid") === col("qid_b") &&
        col("doc_id") === col("doc_b"), "full_outer")
      .select(coalesce(col("qid"), col("qid_b")).as("qid"),
        coalesce(col("doc_id"), col("doc_b")).as("doc_id"),
        (term(col("r_a")) + term(col("r_b"))).as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}
