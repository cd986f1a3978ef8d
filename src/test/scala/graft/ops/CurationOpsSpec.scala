package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The round-11 curation additions on hand-built corpora: d24
  * corpus-frequency boilerplate excision, t26 fair-share quota mix,
  * t27 systematic PPS sampling, m06 VAD segmentation. */
class CurationOpsSpec extends AnyFunSuite with SparkFixture {

  test("boilerplate: cross-doc segments excised, within-doc repeats kept") {
    import spark.implicits._
    // seg words = 2 for readability. Docs 1 and 2 share segment "a b";
    // doc 3 repeats "x y" twice WITHIN itself (df = 1 -> kept).
    val df = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "x y x y")).toDF("doc_id", "text")
    val out = Dedup.boilerplateRemoval(df, col("text"), col("doc_id"),
      segWords = 2, minDf = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "c d")))
    assert(out(2L) == ((2L, 1L, "e f")))
    assert(out(3L) == ((2L, 0L, "x y x y")))
  }

  test("boilerplate: a fully-boilerplate doc reassembles to empty") {
    import spark.implicits._
    val df = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = Dedup.boilerplateRemoval(df, col("text"), col("doc_id"),
      segWords = 2, minDf = 2)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(out(1L) == "" && out(2L) == "")
  }

  test("quota mix: per-source cap, then round-robin global budget") {
    import spark.implicits._
    // Source A has 3 docs, B has 2; cap 2, budget 3. A's rank-3 doc is
    // cut by the cap; the budget then admits every source's rank-1
    // BEFORE any rank-2 (fair share), so B's best beats A's second
    // even though A's second has more chars.
    val df = Seq(
      (1L, "A", 100L), (2L, "A", 90L), (3L, "A", 80L),
      (4L, "B", 10L), (5L, "B", 5L)).toDF("doc_id", "source", "n_chars")
    val out = TextAnalysis.quotaMix(df, col("doc_id"), col("source"),
      col("n_chars"), perSource = 2, budget = 3)
      .orderBy(col("grank"))
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((1L, 1L, 1L), (4L, 1L, 2L), (2L, 2L, 3L)))
  }

  test("pps: uniform weights draw exactly every k-th doc") {
    import spark.implicits._
    // 10 docs of weight 10, n = 5 -> step 20: cumulative multiples of
    // 20 land on docs 2, 4, 6, 8, 10.
    val df = (1L to 10L).map(i => (i, 10L)).toDF("doc_id", "n_chars")
    val got = TextAnalysis.ppsSample(df, col("doc_id"), col("n_chars"),
      n = 5).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(got.toSeq == Seq(2L, 4L, 6L, 8L, 10L))
  }

  test("pps: heavier docs are proportionally more likely (exact case)") {
    import spark.implicits._
    // weights 1,1,1,1,96: total 100, n = 4 -> step 25. The heavy doc's
    // interval (4, 100] contains 25, 50, 75, 100 -> drawn; the light
    // docs' unit intervals contain no multiple -> not drawn.
    val df = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 96L))
      .toDF("doc_id", "n_chars")
    val got = TextAnalysis.ppsSample(df, col("doc_id"), col("n_chars"),
      n = 4).select("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(5L))
  }

  test("vad: voiced runs below min length are dropped; runs report frames") {
    import spark.implicits._
    // frameChars = 4. 'z' (122) loud, 'a' (97) quiet. Frames:
    // zzzz aaaa zzzz zzzz -> mean compare: z-frames voiced, a-frame
    // not. Runs: [0,0] (dropped, < 2), [2,3] (kept).
    val df = Seq((1L, "zzzz" + "aaaa" + "zzzz" + "zzzz"))
      .toDF("doc_id", "text")
    val out = Multimodal.audioSegments(df, col("text"), col("doc_id"),
      frameChars = 4, minFrames = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((1L, 2L, 3L, 2L)))
  }

  test("vad: open run at end of blob closes; partial tail frame counts") {
    import spark.implicits._
    // 10 chars, frames of 4: zzzz zzzz zz -> all voiced (uniform blob
    // means every frame mean equals the global mean) -> one segment
    // covering frames 0..2 including the 2-char tail.
    val df = Seq((1L, "zzzzzzzzzz")).toDF("doc_id", "text")
    val out = Multimodal.audioSegments(df, col("text"), col("doc_id"),
      frameChars = 4, minFrames = 2)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.toSeq == Seq((1L, 0L, 2L, 3L)))
  }

  test("shot boundaries: change detection, not level detection") {
    import spark.implicits._
    // frames (4 chars): aaaa aaaa zzzz zzzz -> one cut at frame 2;
    // the steady frames on both sides never cut. A uniform blob has
    // no cuts at all (deltas are zero).
    val df = Seq((1L, "aaaa" + "aaaa" + "zzzz" + "zzzz"),
      (2L, "zzzzzzzzzzzz")).toDF("doc_id", "text")
    val out = Multimodal.shotBoundaries(df, col("text"), col("doc_id"),
      frameChars = 4, denom = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 2L)))
  }

  test("shot boundaries: single-frame blobs cannot cut") {
    import spark.implicits._
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(Multimodal.shotBoundaries(df, col("text"), col("doc_id"),
      frameChars = 4).collect().isEmpty)
  }

  test("vad: empty and all-quiet-tail blobs emit nothing unqualifying") {
    import spark.implicits._
    // 'a'-heavy blob where only one frame is loud -> no >= 2 run.
    val df = Seq((1L, ""), (2L, "aaaa" + "zzzz" + "aaaa"))
      .toDF("doc_id", "text")
    val out = Multimodal.audioSegments(df, col("text"), col("doc_id"),
      frameChars = 4, minFrames = 2).collect()
    assert(out.isEmpty)
  }

  test("cdc chunking: one inserted word disturbs at most 2 chunks — " +
      "the content-defined property positional windows lack") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // 64 distinct tokens: with boundary probability 1/8 per word the
    // vocabulary is essentially guaranteed to contain breaks (and the
    // assertion below would fail loudly if a hash change ever removed
    // them all, rather than silently passing)
    val vocab = Vector.tabulate(64)(i => s"tok$i")
    val base = Vector.fill(400)(vocab(rnd.nextInt(vocab.size)))
    // insert one word mid-doc; every chunk except the edited one (and
    // at most one split neighbor) must re-identify as a duplicate
    val edited = (base.take(200) :+ "INSERTED") ++ base.drop(200)
    val df = Seq((1L, base.mkString(" ")), (2L, edited.mkString(" ")))
      .toDF("doc_id", "text")
    val out = Dedup.cdcChunkStats(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    val (n2, dup2) = out(2L)
    assert(n2 - dup2 <= 2, s"edit blast radius too wide: $n2 vs $dup2 dup")
    assert(dup2 > 0, "sanity: shared chunks must be detected")
    // doc 1 owns everything it has (within-doc repeats aside, the
    // random 400-word draw over a 10-word vocab can repeat chunks —
    // only assert it never points at doc 2)
    val (n1, dup1) = out(1L)
    assert(n1 > 10 && dup1 < n1)
  }

  test("cdc chunking: chunk count ~ words/modulus and empty docs vanish") {
    import spark.implicits._
    val df = Seq((1L, ("w " * 799).trim), (2L, "")).toDF("doc_id", "text")
    val out = Dedup.cdcChunkStats(df, col("text"), col("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // identical words -> identical per-word hash: either every word
    // breaks (800 chunks) or none does (1 chunk)
    assert(out(1L) == 1L || out(1L) == 799L)
    assert(!out.contains(2L))
  }

  test("degenerate-input guards: vocabCoverage on an empty corpus " +
      "emits zero-coverage rows; curriculumPhases returns an empty " +
      "table; ppsSample and editDistanceJoin fail loudly") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val cov = TextAnalysis.vocabCoverage(empty, col("text"), Seq(10, 100))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4)))
    assert(cov.toSeq == Seq((10L, 0L, 0L, 0L, 0.0), (100L, 0L, 0L, 0L, 0.0)))
    assert(TextAnalysis.curriculumPhases(empty, col("doc_id"),
      col("text"), length(col("text")), nPhases = 4).count() == 0)
    val e1 = intercept[IllegalArgumentException](
      TextAnalysis.ppsSample(empty, col("doc_id"), length(col("text")),
        n = 5))
    assert(e1.getMessage.contains("step would be 0"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Dedup.editDistanceJoin(empty, col("text"), col("doc_id"),
        lit("en"), prefixLen = 8, k = 2, q = 4))
    assert(e2.getMessage.contains("prefix filter"), e2.getMessage)
  }
}
