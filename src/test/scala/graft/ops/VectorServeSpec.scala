package graft.ops

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture

/** The IVF serving split behind s25/st24: [[Vectors.ivfInvertedLists]]
  * (train side) + [[Vectors.ivfServeTopK]] (serve side) must compose to
  * exactly [[Vectors.annIvfTopKWith]], the serving plan fed from parquet
  * artifacts must contain no training stage, and serving a query set in
  * independent slices must union to serving it whole — the property
  * that makes per-micro-batch streaming serving (st24) equal its batch
  * oracle with no cross-batch state. */
class VectorServeSpec extends AnyFunSuite with SparkFixture {

  private def vecs = {
    import spark.implicits._
    (0L to 29L).map { i =>
      (i, Array.tabulate(8)(d => ((i * 7 + d * 3) % 13).toFloat / 13f))
    }.toDF("vec_id", "embedding")
  }

  private def cents =
    Vectors.kmeansFit(vecs, col("vec_id"), col("embedding"),
      k = 4, iters = 2)._1

  test("ivfInvertedLists + ivfServeTopK compose to annIvfTopKWith") {
    val c = cents
    val queries = vecs.filter(col("vec_id") < 6)
    val direct = Vectors.annIvfTopKWith(vecs, queries,
      col("vec_id"), col("embedding"), k = 3, c).collect().toSet
    val lists = Vectors.ivfInvertedLists(vecs, col("vec_id"),
      col("embedding"), c)
    val served = Vectors.ivfServeTopK(lists, c, queries,
      col("vec_id"), col("embedding"), k = 3).collect().toSet
    assert(direct === served)
    assert(direct.nonEmpty)
  }

  test("serving from parquet artifacts: no training stage, equi-join candidates") {
    val c = cents
    val dir = Files.createTempDirectory("graft_serve_spec").toString
    c.write.parquet(s"$dir/centroids")
    Vectors.ivfInvertedLists(vecs, col("vec_id"), col("embedding"), c)
      .write.parquet(s"$dir/lists")
    val served = Vectors.ivfServeTopK(
      spark.read.parquet(s"$dir/lists"),
      spark.read.parquet(s"$dir/centroids"),
      vecs.filter(col("vec_id") < 6),
      col("vec_id"), col("embedding"), k = 3)
    val p = served.queryExecution.executedPlan.toString
    assert(p.contains("graft_serve_spec"),
      s"serving must scan the stored artifacts\n$p")
    assert(!p.contains("Scan ExistingRDD"),
      s"no checkpointed training model may leak into the serving plan\n$p")
    assert(!p.contains("CartesianProduct"),
      s"inverted-list candidates must come from the cid equi-join\n$p")
    assert("SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin".r
      .findFirstIn(p).isDefined, s"expected the cell-id equi-join\n$p")
  }

  test("incremental add: appended lists serve identically to a rebuild (s26's invariant)") {
    val c = cents
    val base = vecs.filter(col("vec_id") % 5 =!= 2)
    val arrivals = vecs.filter(col("vec_id") % 5 === 2)
    val appended = Vectors.ivfInvertedLists(base, col("vec_id"),
        col("embedding"), c)
      .unionByName(Vectors.ivfInvertedLists(arrivals, col("vec_id"),
        col("embedding"), c))
    val rebuilt = Vectors.ivfInvertedLists(vecs, col("vec_id"),
      col("embedding"), c)
    def serve(lists: org.apache.spark.sql.DataFrame) =
      Vectors.ivfServeTopK(lists, c, vecs.filter(col("vec_id") < 6),
        col("vec_id"), col("embedding"), k = 3).collect().toSet
    assert(serve(appended) === serve(rebuilt))
  }

  test("slice-and-union serving equals whole-set serving (st24's micro-batch property)") {
    val c = cents
    val lists = Vectors.ivfInvertedLists(vecs, col("vec_id"),
      col("embedding"), c)
    def serve(qs: org.apache.spark.sql.DataFrame) =
      Vectors.ivfServeTopK(lists, c, qs, col("vec_id"), col("embedding"),
        k = 3).collect().toSet
    val whole = serve(vecs.filter(col("vec_id") < 6))
    val sliced = serve(vecs.filter(col("vec_id") < 3)) ++
      serve(vecs.filter(col("vec_id") >= 3 && col("vec_id") < 6))
    assert(whole === sliced)
  }
}
