package graft.ops

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** Seeded randomized sweeps for the late-round-11 curation operators:
  * each distributed implementation is checked against a brute-force
  * single-threaded reference on inputs the operator's author did not
  * pick. */
class RandomizedCurationSpec extends AnyFunSuite with SparkFixture {

  private val rnd = new scala.util.Random(20260814L)

  test("capped sessions: random timelines match a plain sequential fold") {
    import spark.implicits._
    val gapUs = 24L * 3600 * 1000000
    val capUs = 48L * 3600 * 1000000
    for (_ <- 1 to 3) {
      val timelines = (1L to 25L).map { u =>
        u -> (0 until rnd.nextInt(40))
          .map(_ => rnd.nextInt(500) * 3600L * 1000000L).sorted
      }.toMap
      val rows = timelines.toSeq.flatMap { case (u, ts) =>
        ts.zipWithIndex.map { case (t, i) =>
          (u, u * 10000 + i, new Timestamp(t / 1000))
        }
      }
      val got = graft.queries.Relational.cappedSessionOver(
        rows.toDF("user_id", "event_id", "ts"), gapUs, capUs)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
      timelines.foreach { case (u, ts) =>
        if (ts.nonEmpty) {
          var (anchor, prev, nsess, ncap) = (0L, 0L, 0L, 0L)
          ts.foreach { t =>
            if (nsess == 0 || t - prev > gapUs) { anchor = t; nsess += 1 }
            else if (t - anchor > capUs) { anchor = t; nsess += 1; ncap += 1 }
            prev = t
          }
          assert(got(u) == ((nsess, ncap)), s"user $u ts=$ts")
        }
      }
    }
  }

  /** Reference BPE: pair counts weighted by word frequency, argmax by
    * (count desc, lhs asc, rhs asc), left-to-right greedy merge. */
  private def refBpe(words: Map[String, Long], k: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] =
      words.map { case (w, c) => w.map(_.toString).toSeq -> c }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var step = 1
    var stop = false
    while (step <= k && !stop) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, c) =>
        syms.sliding(2).filter(_.length == 2).foreach { p =>
          counts((p(0), p(1))) = counts.getOrElse((p(0), p(1)), 0L) + c
        }
      }
      if (counts.isEmpty) stop = true
      else {
        val ((l, r), c) = counts.toSeq
          .sortBy { case ((l, r), c) => (-c, l, r) }.head
        out += ((step.toLong, l, r, l + r, c))
        vocab = vocab.groupMapReduce { case (syms, _) =>
          syms.foldLeft(Seq.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == l && s == r)
              acc.init :+ (l + r)
            else acc :+ s
          }
        }(_._2)(_ + _)
        step += 1
      }
    }
    out.result()
  }

  test("BPE merges: random corpora match the reference implementation") {
    import spark.implicits._
    val alphabet = "abcd"
    for (_ <- 1 to 3) {
      val words = (0 until 40).map { _ =>
        (0 until 1 + rnd.nextInt(6))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }
      val text = words.mkString(" ")
      val expected = refBpe(
        words.groupBy(identity).map { case (w, g) => w -> g.size.toLong },
        k = 3)
      val got = Tokenizer.bpeMerges(
        Seq((1L, text)).toDF("doc_id", "text"), col("text"), k = 3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq.sortBy(_._1)
      assert(got == expected, s"words=$words")
    }
  }

  test("PPS sampling: random weights match the cumulative-interval rule") {
    import spark.implicits._
    for (_ <- 1 to 3) {
      val weights = (1L to 60L).map(i => i -> (1L + rnd.nextInt(200))).toMap
      val n = 8
      val total = weights.values.sum
      val step = total / n
      var cum = 0L
      val expected = (1L to 60L).flatMap { i =>
        val prev = cum; cum += weights(i)
        if (cum / step > prev / step) Some(i) else None
      }.toSet
      val got = TextAnalysis.ppsSample(
        weights.toSeq.toDF("doc_id", "n_chars"), col("doc_id"),
        col("n_chars"), n)
        .collect().map(_.getLong(0)).toSet
      assert(got == expected)
      // every doc at least step-heavy is always drawn
      weights.filter(_._2 >= step).keys
        .foreach(i => assert(got.contains(i), s"heavy doc $i missed"))
    }
  }

  /** Scala reference for the m06/m07 frame model: codepoint energies
    * over `frameChars`-codepoint frames. */
  private def refFrames(t: String, fc: Int): (Seq[Long], Seq[Long]) = {
    val cps = t.codePoints().toArray.map(_.toLong).toSeq
    val es = cps.grouped(fc).map(_.sum).toSeq
    val cs = cps.grouped(fc).map(_.length.toLong).toSeq
    (es, cs)
  }

  test("vad + shot boundaries: random blobs incl. multibyte match the " +
      "frame-model reference") {
    import spark.implicits._
    val alphabet = "az Z9éü漢"
    for (trial <- 1 to 3) {
      val docs = (1L to 15L).map { i =>
        i -> (0 until rnd.nextInt(40))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      }.filter(_._2.nonEmpty)
      val fc = 4
      val df = docs.toDF("doc_id", "text")

      // reference VAD segments
      val expSegs = docs.flatMap { case (id, t) =>
        val (es, cs) = refFrames(t, fc)
        val ts = es.sum; val tn = cs.sum
        val vo = es.indices.map(f => es(f) * tn >= ts * cs(f))
        val runs = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
        var cur = -1
        vo.indices.foreach { f =>
          if (vo(f)) { if (cur < 0) cur = f }
          else if (cur >= 0) { runs += ((cur.toLong, (f - 1).toLong)); cur = -1 }
        }
        if (cur >= 0) runs += ((cur.toLong, (vo.length - 1).toLong))
        runs.filter(r => r._2 - r._1 + 1 >= 2).zipWithIndex.map {
          case ((s, e), i) => (id, (i + 1).toLong, s, e, e - s + 1)
        }
      }.toSet
      val gotSegs = Multimodal.audioSegments(df, col("text"),
        col("doc_id"), frameChars = fc, minFrames = 2)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
      assert(gotSegs == expSegs, s"trial $trial vad")

      // reference shot boundaries
      val expCuts = docs.flatMap { case (id, t) =>
        val (es, cs) = refFrames(t, fc)
        val ts = es.sum; val tn = cs.sum
        (1 until es.length).filter { f =>
          math.abs(es(f) * cs(f - 1) - es(f - 1) * cs(f)) * tn * 16 >
            ts * cs(f) * cs(f - 1)
        }.map(f => (id, f.toLong))
      }.toSet
      val gotCuts = Multimodal.shotBoundaries(df, col("text"),
        col("doc_id"), frameChars = fc, denom = 16)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotCuts == expCuts, s"trial $trial cuts")
    }
  }

  test("boilerplate: conservation and cross-doc removal invariants") {
    import spark.implicits._
    val vocabW = Seq("aa", "bb", "cc", "dd", "ee")
    for (_ <- 1 to 2) {
      val docs = (1L to 20L).map { i =>
        i -> (0 until 4 + rnd.nextInt(12))
          .map(_ => vocabW(rnd.nextInt(vocabW.length))).mkString(" ")
      }
      val segWords = 3
      // reference segment table
      val segs = docs.flatMap { case (id, t) =>
        t.split(" ").grouped(segWords).zipWithIndex
          .map { case (g, si) => (id, si, g.mkString(" ")) }
      }
      val dfreq = segs.groupBy(_._3)
        .map { case (s, g) => s -> g.map(_._1).distinct.size }
      val out = Dedup.boilerplateRemoval(
        docs.toDF("doc_id", "text"), col("text"), col("doc_id"),
        segWords, minDf = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      docs.foreach { case (id, _) =>
        val mySegs = segs.filter(_._1 == id)
        val removed = mySegs.count(s => dfreq(s._3) >= 2)
        val (nSegs, nRemoved, clean) = out(id)
        assert(nSegs == mySegs.size && nRemoved == removed)
        val expectClean = mySegs.sortBy(_._2)
          .filter(s => dfreq(s._3) < 2).map(_._3).mkString(" ")
        assert(clean == expectClean, s"doc $id")
      }
    }
  }

  /** Reference Levenshtein (full DP), for the Ed-Join parity check. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1)(i => i)
    for (j <- 1 to b.length) {
      var prev = d(0); d(0) = j
      for (i <- 1 to a.length) {
        val t = d(i)
        d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
          prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
        prev = t
      }
    }
    d(a.length)
  }

  test("Ed-Join prefix filter: no false negatives on mutated strings") {
    import spark.implicits._
    // Small alphabet + targeted mutations (sub/ins/del/transpose) so
    // many pairs land exactly AT the k=2 boundary, where a prefix-
    // length off-by-one would lose candidates.
    val alpha = "abcd"
    for (round <- 1 to 3) {
      val base = (0 until 60).map { _ =>
        val n = 12 + rnd.nextInt(26)
        (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
      }
      val mutated = base.flatMap { s =>
        (0 until rnd.nextInt(3)).map { _ =>
          var t = s
          (0 until 1 + rnd.nextInt(3)).foreach { _ =>
            val p = rnd.nextInt(t.length)
            rnd.nextInt(4) match {
              case 0 => t = t.updated(p, alpha(rnd.nextInt(alpha.length)))
              case 1 => t = t.take(p) +
                alpha(rnd.nextInt(alpha.length)) + t.drop(p)
              case 2 if t.length > 12 => t = t.take(p) + t.drop(p + 1)
              case _ if p + 1 < t.length =>
                t = t.take(p) + t(p + 1) + t(p) + t.drop(p + 2)
              case _ => ()
            }
          }
          t
        }
      }
      val rows = (base ++ mutated).zipWithIndex
        .map { case (s, i) => (i.toLong, s, "xx") }
      val df = rows.toDF("doc_id", "text", "lang")
      val got = Dedup.editDistanceJoin(df, col("text"), col("doc_id"),
          col("lang"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        .toSet
      val keyed = rows.map { case (i, s, _) => (i, s.take(32)) }
      val want = (for {
        (ia, ta) <- keyed; (ib, tb) <- keyed if ia < ib
        e = lev(ta, tb) if e <= 2
      } yield (ia, ib, e.toLong)).toSet
      assert(got == want,
        s"round=$round missing=${(want -- got).take(3)} " +
          s"extra=${(got -- want).take(3)}")
    }
  }
}
