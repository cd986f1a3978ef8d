package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkFixture
import graft.ops.Dedup

/** Randomized parity sweep for the native codegen kernels — the
  * highest-risk code in the repo (hand-written eval + doGenCode) gets
  * hammered with a seeded corpus far beyond the hand-picked parity
  * cases: multi-byte UTF-8, repeated tokens, double spaces,
  * empty/short docs, long docs. Every doc must produce EXACTLY the
  * declarative (pure-Catalyst) result the kernel replaced, which is
  * also what the DuckDB oracles mirror. Seeded Random = reproducible
  * failures. */
class KernelRandomParitySpec extends AnyFunSuite with SparkFixture {

  private val vocab = Array(
    "a", "b", "cat", "dog", "the", "Zebra", "héllo", "wörld", "日本語",
    "x1", "", "punct.", "comma,", "UPPER", "mIxEd", "0", "42",
    "tab\tinside", "quote'q", "longtokenlongtokenlongtoken")

  private def randomDocs(seed: Long, n: Int): Seq[(Int, String)] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { i =>
      val len = rnd.nextInt(31) // 0..30 tokens
      val sep = if (rnd.nextInt(5) == 0) "  " else " " // double spaces too
      i -> (0 until len).map(_ => vocab(rnd.nextInt(vocab.length)))
        .mkString(sep)
    }
  }

  private def df = {
    val spark0 = spark
    import spark0.implicits._
    graft.plans.GraftExtensions.register(spark)
    randomDocs(seed = 0xCAFE, n = 200).toDF("id", "text")
  }

  test("graft_shingles distinct mode ≡ declarative array pipeline, n=2,3,8") {
    for (n <- Seq(2, 3, 8)) {
      val cmp = df.select(
        call_function("graft_shingles", col("text"), lit(n)).as("nat"),
        Dedup.shingleArray(col("text"), n).as("dec"))
        .filter(not(col("nat") <=> col("dec")))
      assert(cmp.count() == 0, s"n=$n: ${cmp.take(3).mkString("; ")}")
    }
  }

  test("graft_shingles positional mode ≡ declarative sliding windows, n=2,8") {
    for (n <- Seq(2, 8)) {
      val w = split(col("text"), " ")
      val dec = when(size(w) >= n,
        transform(sequence(lit(1), size(w) - (n - 1)),
          i => concat_ws(" ", slice(w, i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val cmp = df.select(
        call_function("graft_shingles", col("text"), lit(n), lit(false))
          .as("nat"),
        dec.as("dec"))
        .filter(not(col("nat") <=> col("dec")))
      assert(cmp.count() == 0, s"n=$n: ${cmp.take(3).mkString("; ")}")
    }
  }

  test("graft_minhash ≡ declarative k-conditional-min aggregation") {
    val declarative = Dedup.minhashSignatures(
        Dedup.shingles(df, col("text"), col("id"), 3), 16)
      .collect()
      .map(r => r.getInt(0) -> (0 until 16).map(j => r.getLong(j + 1)))
      .toMap
    val native = Dedup.minhashSignaturesNative(df, col("text"), col("id"),
        3, 16)
      .collect()
      .map(r => r.getInt(0) -> r.getSeq[Long](1).toIndexedSeq)
      .toMap
    assert(native == declarative)
  }

  test("graft_simhash ≡ declarative majority-vote aggregation") {
    val declarative = Dedup.simhashDeclarative(df, col("text"), col("id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val native = Dedup.simhash(df, col("text"), col("id"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // split("") = [""], so even zero-token docs yield one (empty-string)
    // token on both sides — the row sets must match exactly
    assert(native.keySet == declarative.keySet)
    assert(declarative.forall { case (id, s) => native(id) == s })
  }

  test("graft_phash ≡ declarative block-mean stages, incl. multi-byte " +
      "code points and sub-48-char docs") {
    val kernel = df.filter(length(col("text")) > 0)
      .select(col("id").cast("long").as("mid"),
        call_function("graft_phash", col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // empty docs excluded on BOTH sides: production (phashPairs)
    // filters them, and the declarative's sequence(1, 0) descends in
    // Spark, making it divide by zero on a zero-length doc
    val decl = graft.ops.Multimodal
      .phashDeclarative(df.filter(length(col("text")) > 0),
        col("text"), col("id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kernel === decl)
    assert(kernel.nonEmpty)
  }

  test("graft_idot ≡ declarative zip_with/aggregate fold, incl. null semantics") {
    val spark0 = spark
    import spark0.implicits._
    graft.plans.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(0xD07)
    def vec(len: Int): Seq[java.lang.Long] =
      Seq.fill(len)(java.lang.Long.valueOf(rnd.nextInt(2000001) - 1000000L))
    // Random same-length pairs (the real shape), plus the degenerate
    // shapes the declarative fold defines semantics for: length
    // mismatch (→ null), a null element (→ null), empty arrays (→ 0).
    val pairs: Seq[(Seq[java.lang.Long], Seq[java.lang.Long])] =
      (0 until 100).map { _ => val n = rnd.nextInt(65); (vec(n), vec(n)) } ++
      Seq(
        (vec(8), vec(5)),
        (vec(3).updated(1, null: java.lang.Long), vec(3)),
        (Seq.empty, Seq.empty))
    val cmp = pairs.toDF("a", "b")
      .select(
        graft.ops.Vectors.idot(col("a"), col("b")).as("nat"),
        graft.ops.Vectors.idotDeclarative(col("a"), col("b")).as("dec"),
        call_function("graft_idot", col("a"), col("b")).as("sql"),
        graft.ops.Vectors.sqDist(col("a"), col("b")).as("natd"),
        graft.ops.Vectors.sqDistDeclarative(col("a"), col("b")).as("decd"))
      .filter(not(col("nat") <=> col("dec")) || not(col("sql") <=> col("dec"))
        || not(col("natd") <=> col("decd")))
    assert(cmp.count() == 0, cmp.take(3).mkString("; "))
    // Overflow mirrors the fold's ANSI dependence (asserted on the
    // static helpers both codegen and interpreted paths call): ANSI on
    // (Spark 4 default) throws; ANSI off wraps two's-complement exactly
    // like the non-ANSI fold.
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    intercept[ArithmeticException] {
      VectorOps.idot(
        new GenericArrayData(Array(Long.MaxValue, 7L)),
        new GenericArrayData(Array(3L, Long.MinValue)), ansi = true)
    }
    intercept[ArithmeticException] {
      VectorOps.isqdist(
        new GenericArrayData(Array(Long.MaxValue)),
        new GenericArrayData(Array(Long.MinValue)), ansi = true)
    }
    assert(VectorOps.idot(
      new GenericArrayData(Array(Long.MaxValue, 7L)),
      new GenericArrayData(Array(3L, Long.MinValue)), ansi = false)
      == Long.MaxValue * 3L + 7L * Long.MinValue)
    assert(VectorOps.isqdist(
      new GenericArrayData(Array(Long.MaxValue)),
      new GenericArrayData(Array(Long.MinValue)), ansi = false)
      == { val d = Long.MaxValue - Long.MinValue; d * d })
  }

  test("graft_icount ≡ size(array_intersect) on random sorted unique " +
      "arrays, incl. empty and disjoint") {
    val spark0 = spark
    import spark0.implicits._
    graft.plans.GraftExtensions.register(spark)
    val rnd = new scala.util.Random(0xD28L)
    // Producer-shaped inputs: ascending-sorted, duplicate-free long
    // arrays (sort_array over collect_list of unique token ids),
    // lengths 0..60, values drawn from a small range so overlaps are
    // common, plus forced edge rows.
    def arr(): Seq[Long] =
      rnd.shuffle((0L until 80L).toList).take(rnd.nextInt(61)).sorted
    val rows = (0 until 300).map(i => (i, arr(), arr())) ++ Seq(
      (300, Seq.empty[Long], Seq.empty[Long]),          // both empty
      (301, Seq(1L, 2L, 3L), Seq.empty[Long]),          // one empty
      (302, Seq(1L, 2L), Seq(5L, 9L)),                  // disjoint
      (303, Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)),          // identical
      (304, Seq(Long.MinValue, 0L, Long.MaxValue),
        Seq(Long.MinValue, Long.MaxValue)))             // extremes
    val cmp = rows.toDF("id", "a", "b")
      .select(col("id"),
        call_function("graft_icount", col("a"), col("b")).as("nat"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("dec"))
      .filter(col("nat") =!= col("dec"))
    assert(cmp.count() == 0, cmp.take(5).mkString("; "))
  }

  test("graft_rolling_hash ≡ byte-loop reference on random docs") {
    val rows = df.select(col("id"), col("text"),
        call_function("graft_rolling_hash", col("text")).as("rfp"))
      .collect()
    def ref(s: String): Long = {
      var h = 0L // h_{i+1} = h_i * B + byte_i, B = RollingHash.DefaultBase
      s.getBytes("UTF-8").foreach { b =>
        h = h * RollingHash.DefaultBase + (b.toLong & 0xffL)
      }
      h
    }
    rows.foreach { r =>
      assert(r.getLong(2) == ref(r.getString(1)),
        s"doc ${r.getInt(0)}: '${r.getString(1).take(40)}'")
    }
  }
}
