package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkFixture

class RetrievalSpec extends AnyFunSuite with SparkFixture {

  private def corpus = {
    import spark.implicits._
    // all docs length 3 => dl = avgdl, tf-norm collapses to
    // tf*2.5/(tf+1.5): hand-computable scores
    Seq(
      (1L, "apple banana cherry"),
      (2L, "apple apple banana"),
      (3L, "banana cherry dates"),
      (4L, "dates dates dates"),
      (5L, "elder elder elder"))
      .toDF("doc_id", "text")
  }

  test("bm25: hand-computed score; tf saturation outranks at equal idf") {
    val r = Retrieval.bm25(corpus, col("text"), col("doc_id"),
      Seq("q" -> Seq("apple")), k = 10)
      .collect().map(x => (x.getLong(1), x.getDouble(3), x.getInt(4)))
      .sortBy(_._3)
    // df(apple)=2, N=5: idf = ln((5-2+0.5)/(2+0.5)) = ln(1.4);
    // doc 2 (tf=2): tfn = 2*2.5/(2+1.5); doc 1 (tf=1): tfn = 1
    assert(r.map(_._1).toSeq == Seq(2L, 1L))
    assert(math.abs(r(0)._2 - math.log(1.4) * 5.0 / 3.5) < 1e-9)
    assert(math.abs(r(1)._2 - math.log(1.4)) < 1e-9)
  }

  test("bm25 fidelity: portable-ln scores track a Math.log reference " +
    "and produce the identical top-10 on the sf0.001 fixture") {
    val dir = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val qs = graft.queries.PipelineQueries.bm25Queries
    val got = Retrieval.bm25(docs, col("text"), col("doc_id"), qs)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(3),
        r.getInt(4)))

    // in-JVM Math.log reference from first principles
    val rows = docs.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty)))
    val n = rows.length.toLong
    val sumDl = rows.map(_._2.length.toLong).sum
    val terms = qs.flatMap(_._2).distinct
    val dfT = terms.map(t =>
      t -> rows.count(_._2.contains(t)).toLong).toMap
    val ref = qs.flatMap { case (qid, qterms) =>
      rows.flatMap { case (doc, ws) =>
        val cs = qterms.distinct.sorted.flatMap { t =>
          val tf = ws.count(_ == t).toLong
          if (tf == 0) None
          else Some(Retrieval.bm25LogContribution(
            tf, dfT(t), ws.length.toLong, n, sumDl))
        }
        if (cs.isEmpty) None
        else Some((qid, doc, cs.foldLeft(0.0)(_ + _)))
      }.sortBy { case (_, doc, s) => (-s, doc) }.take(10)
        .zipWithIndex.map { case ((q, doc, s), i) => (q, doc, s, i + 1) }
    }
    val refMap = ref.map(t => (t._1, t._2) -> (t._3, t._4)).toMap
    assert(got.length == ref.length)
    got.foreach { case (qid, doc, score, rank) =>
      val (refScore, refRank) = refMap.getOrElse((qid, doc),
        fail(s"($qid, $doc) ranked by portable-ln but not by Math.log"))
      assert(rank == refRank, s"rank drift at ($qid, $doc)")
      assert(math.abs(score - refScore) < 1e-9,
        s"score drift at ($qid, $doc): $score vs $refScore")
    }
  }

  test("boolean search: conjunctive semantics, tf evidence") {
    val r = Retrieval.booleanSearch(corpus, col("text"), col("doc_id"),
      Seq("a" -> Seq("apple", "banana"), "b" -> Seq("dates"),
        "c" -> Seq("apple", "dates")))
      .collect()
      .map(x => ((x.getString(0), x.getLong(1)), x.getLong(3))).toMap
    assert(r.keySet == Set(("a", 1L), ("a", 2L), ("b", 3L), ("b", 4L)))
    assert(r(("a", 2L)) == 3L) // apple tf 2 + banana tf 1
    assert(r(("b", 4L)) == 3L)
    // no doc has both apple and dates — query c matches nothing
  }

  test("rrf fusion: both-list docs outrank single-list docs; " +
    "missing side contributes zero") {
    import spark.implicits._
    // doc 5 is rank 3 in BOTH lists: 2/(60+3) ≈ 0.0317 beats either
    // list's rank-1 alone (1/61 ≈ 0.0164). doc 9 is dense-only.
    val sparse = Seq(("q", 1L, 1), ("q", 2L, 2), ("q", 5L, 3))
      .toDF("qid", "doc_id", "rank")
    val dense = Seq(("q", 9L, 1), ("q", 3L, 2), ("q", 5L, 3))
      .toDF("qid", "doc_id", "rank")
    val got = Retrieval.rrfFuse(sparse, dense, k = 10)
      .collect().map(r => (r.getLong(1), r.getInt(3))).toMap
    assert(got(5L) == 1, got)                  // fused winner
    assert(Set(1L, 9L).map(got) == Set(2, 3))  // the two rank-1s next
    assert(got.keySet == Set(1L, 2L, 3L, 5L, 9L))
  }

  test("bm25 plan: query set and per-term idf are broadcast; no " +
    "corpus-side window before the per-query rank") {
    val df = Retrieval.bm25(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"),
      col("text"), col("doc_id"),
      graft.queries.PipelineQueries.bm25Queries)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("CartesianProduct"),
      "stats must ride a broadcast nested loop, not a cartesian")
  }
}
