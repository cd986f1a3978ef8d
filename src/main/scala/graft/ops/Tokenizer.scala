package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed tokenizer training: byte-pair-encoding merge induction
  * (Sennrich et al. 2016, public) over a corpus — the step that turns
  * raw training text into a tokenizer vocabulary before any model
  * training can start.
  *
  * Classic BPE alternates two phases; their scale profiles differ and
  * the implementation splits accordingly:
  *  - the WORD-FREQUENCY table (corpus-scale: one groupBy over every
  *    token occurrence — at 100 TB this is the dominant shuffle, with
  *    map-side partial counts) is built ONCE and checkpointed; every
  *    later phase touches only the vocabulary (distinct words), which
  *    is orders of magnitude smaller than the corpus;
  *  - each merge round counts ADJACENT SYMBOL PAIRS weighted by word
  *    frequency (vocabulary-sized explode + groupBy), picks the argmax
  *    pair (count desc, then lexicographic (lhs, rhs) — a deterministic
  *    1-row collect, the documented scalar-collect tier), and applies
  *    the merge to every word's symbol array as a LEFT-TO-RIGHT greedy
  *    fold (one `aggregate` HOF — map-only over vocabulary rows;
  *    "a a a" under merge (a,a) correctly yields [aa, a] because the
  *    merged symbol no longer equals the pair's left element).
  *
  * Per-round `localCheckpoint` truncates the growing lineage, exactly
  * as the connected-components loop does. Output: one row per merge
  * step — (step, lhs, rhs, merged, cnt).
  */
object Tokenizer {

  def bpeMerges(df: DataFrame, text: Column, k: Int): DataFrame =
    bpeTrain(df, text, k)._1

  /** Full training result: the merge table AND the final segmented
    * vocabulary (word → symbol array) — the artifact [[bpeTokenCounts]]
    * applies corpus-wide.
    *
    * THE 100 TB CONTRACT (`maxTrainWords`): the corpus-scale work is
    * exactly ONE pass — the word-frequency groupBy (map-side partial
    * counts, the same shuffle profile as a word count). Everything
    * after runs on the DISTINCT-WORD table, and `maxTrainWords` bounds
    * that table to the top-N words by (frequency desc, word) — a
    * bounded TakeOrdered, never a global sort materialization. With
    * the cap set, each of the k merge rounds is a job over ≤N rows
    * regardless of corpus size, so training cost is
    * O(corpus) + O(k·N): the k driver-sequenced rounds survive 100 TB
    * because their inputs stop scaling with the data. This is the
    * sampled-training contract every production tokenizer ships
    * (frequency-truncated or document-sampled corpora — BPE merge
    * counts are dominated by head words, so the truncated tail
    * perturbs late merges only); TokenizerSpec pins that a
    * non-binding cap reproduces the uncapped merges exactly and that
    * a binding cap trains on precisely the top-N table. The default
    * (unbounded) preserves the oracle-checked t31/t48 behavior. */
  def bpeTrain(df: DataFrame, text: Column, k: Int,
      maxTrainWords: Int = Int.MaxValue)
      : (DataFrame, DataFrame) = {
    val spark = df.sparkSession
    import spark.implicits._
    val full = df
      .select(explode(split(text, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
    // deterministic frequency truncation: ties at the cut broken by
    // the word itself, so the training set is row-order independent
    val capped =
      if (maxTrainWords == Int.MaxValue) full
      else full.orderBy(col("cnt").desc, col("w")).limit(maxTrainWords)
    var vocab = capped
      .withColumn("syms",
        expr("transform(sequence(1, length(w)), i -> substr(w, i, 1))"))
      .select(col("w"), col("cnt"), col("syms"))
      .localCheckpoint()

    val merges = Seq.newBuilder[(Long, String, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= k && !exhausted) {
      val top = vocab
        // single-symbol words have no pairs — and Spark's sequence(1, 0)
        // DESCENDS instead of returning empty, so they must not reach
        // the pair expression at all
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, " +
            "element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) =
          (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((step.toLong, l, r, l + r, c))
        val lLit = lit(l)
        val rLit = lit(r)
        vocab = vocab
          .withColumn("syms",
            aggregate(col("syms"),
              array().cast("array<string>"),
              (out, s) =>
                when(size(out) > 0 &&
                  element_at(out, -1) === lLit && s === rLit,
                  concat(slice(out, lit(1), size(out) - 1),
                    array(concat(lLit, rLit))))
                  .otherwise(concat(out, array(s)))))
          .localCheckpoint()
        step += 1
      }
    }
    (merges.result()
      .toDF("step", "lhs", "rhs", "merged", "cnt"), vocab)
  }

  /** BPE APPLY — the other half of the tokenizer lifecycle: the
    * trained segmentation is applied corpus-wide to report per-doc
    * token counts after the merges. The segmented vocabulary is
    * BROADCAST (a tokenizer's vocab is model-sized — exactly the
    * lookup-table tier), so tokenization is a map-side hash join per
    * word occurrence + one groupBy on the doc id; the training cost is
    * paid once regardless of how many corpora the tokenizer is then
    * applied to. Output: (doc_id, n_words, n_tokens). */
  /** t48: TOKENIZER FERTILITY per language — tokens-per-word of the
    * trained BPE, the number a multilingual vocab design is judged by
    * (a language with fertility 2× pays 2× the context window; the
    * standard fix is budget reallocation before retraining). Same
    * trained vocab and broadcast-segmentation join as
    * [[bpeTokenCounts]] (t31), rolled up per language with the exact
    * milli ratio 1000·n_tokens div n_words. */
  def bpeFertility(df: DataFrame, text: Column, lang: Column, k: Int)
      : DataFrame = {
    val (_, vocab) = bpeTrain(df, text, k)
    val vseg = vocab.select(col("w"),
      size(col("syms")).cast("long").as("ntok"))
    df.select(lang.as("lang"), explode(split(text, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(vseg), Seq("w"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
      .select(col("lang"), col("n_words"), col("n_tokens"),
        expr("(1000 * n_tokens) div n_words").as("fertility_milli"))
  }

  def bpeTokenCounts(df: DataFrame, text: Column, id: Column, k: Int)
      : DataFrame = {
    val (_, vocab) = bpeTrain(df, text, k)
    val vseg = vocab.select(col("w"),
      size(col("syms")).cast("long").as("ntok"))
    df.select(id.as("doc_id"), explode(split(text, " ")).as("w"))
      .filter(length(col("w")) > 0)
      .join(broadcast(vseg), Seq("w"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("ntok")).as("n_tokens"))
  }
}
