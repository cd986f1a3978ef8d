package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** BPE merge induction on hand-built corpora: frequency-weighted argmax,
  * deterministic tie-break, left-to-right greedy application, and the
  * composition of merged symbols across rounds. */
class TokenizerSpec extends AnyFunSuite with SparkFixture {

  private def run(k: Int, texts: String*):
      Seq[(Long, String, String, String, Long)] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Tokenizer.bpeMerges(df, col("text"), k)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq.sortBy(_._1)
  }

  test("most frequent pair wins, weighted by word frequency") {
    // "ab" x3, "cd" x1 -> (a,b) with count 3 first.
    val m = run(1, "ab ab ab cd")
    assert(m == Seq((1L, "a", "b", "ab", 3L)))
  }

  test("ties break lexicographically on (lhs, rhs)") {
    // "ab" and "cd" once each: both pairs count 1 -> (a,b) first.
    assert(run(1, "ab cd").head == ((1L, "a", "b", "ab", 1L)))
    // equal counts at the same lhs: (a,b) beats (a,c).
    assert(run(1, "ac ab").head == ((1L, "a", "b", "ab", 1L)))
  }

  test("left-to-right greedy: 'aaa' under (a,a) yields [aa, a]") {
    // word "aaa" x2: round 1 pair (a,a) has count 4 (two per word).
    // After the merge each word is [aa, a], so round 2's top pair is
    // (aa, a) with count 2 — which is only right if the greedy fold
    // did NOT re-merge the trailing 'a' into the new 'aa' symbol.
    val m = run(2, "aaa aaa")
    assert(m(0) == ((1L, "a", "a", "aa", 4L)))
    assert(m(1) == ((2L, "aa", "a", "aaa", 2L)))
  }

  test("merged symbols compose across rounds") {
    // "abab": round 1 (a,b) count 2 -> [ab, ab]; round 2 (ab, ab).
    val m = run(2, "abab")
    assert(m(0) == ((1L, "a", "b", "ab", 2L)))
    assert(m(1) == ((2L, "ab", "ab", "abab", 1L)))
  }

  test("induction stops early when no pairs remain") {
    // single-char words only: no adjacent pairs at all.
    assert(run(3, "a b a").isEmpty)
  }

  private def counts(k: Int, texts: String*): Map[Long, (Long, Long)] = {
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    Tokenizer.bpeTokenCounts(df, col("text"), col("doc_id"), k)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
  }

  test("apply: token counts reflect the trained merges per word") {
    // k=1 trains (a,b) [count 4 from two 'abab' words]. 'abab' then
    // segments to [ab, ab] (2 tokens); 'cd' is untouched ([c, d], 2).
    val m = counts(1, "abab cd", "abab")
    assert(m(0L) == ((2L, 4L)))   // 2 words, 2 + 2 tokens
    assert(m(1L) == ((1L, 2L)))   // 1 word, 2 tokens
  }

  test("apply: untrained continuation — merges compose, greedy holds") {
    // k=2 on 'aaa aaa': round 1 (a,a) -> [aa, a]; round 2 (aa, a) ->
    // [aaa]. Every 'aaa' occurrence is then ONE token.
    val m = counts(2, "aaa aaa aaa")
    assert(m(0L) == ((3L, 3L)))
  }

  test("apply: empty words dropped, counts are per-doc") {
    val m = counts(1, "ab  ab", "", "ab")
    assert(m.get(0L).contains((2L, 2L)))   // double space -> no empty word
    assert(!m.contains(1L))                // empty doc emits nothing
    assert(m.get(2L).contains((1L, 1L)))
  }

  // ---- the 100 TB sampled-training contract (maxTrainWords) ---- //

  private def merges(df: org.apache.spark.sql.DataFrame, k: Int,
      cap: Int): Seq[(Long, String, String, String, Long)] =
    Tokenizer.bpeTrain(df, col("text"), k, maxTrainWords = cap)._1
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4)))
      .toSeq.sortBy(_._1)

  test("sample contract: a non-binding cap reproduces uncapped merges") {
    import spark.implicits._
    val df = Seq("abab cd cd ef", "abab abab gh ef", "ij ij kl")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    // 8 distinct words; any cap >= 8 must train identically.
    assert(merges(df, 4, cap = 8) == merges(df, 4, cap = Int.MaxValue))
    assert(merges(df, 4, cap = 1000) == merges(df, 4, cap = Int.MaxValue))
  }

  test("sample contract: a binding cap trains on exactly the top-N " +
      "frequency-truncated table (ties broken by word)") {
    import spark.implicits._
    // frequencies: xy x3, pq x2, zz x2, rs x1 — cap 2 keeps {xy, pq}
    // (pq beats zz at count 2 by word order), so (z,z) can never be
    // learned and round 1 is (x,y) with the CAPPED count 3.
    val df = Seq("xy xy xy pq pq zz zz rs")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val m = merges(df, 2, cap = 2)
    assert(m(0) == ((1L, "x", "y", "xy", 3L)))
    assert(m(1) == ((2L, "p", "q", "pq", 2L)))
    assert(!m.exists(_._2 == "z"))
  }
}
