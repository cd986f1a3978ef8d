package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MinHash signature kernel shared by the interpreted and
  * generated paths of [[MinHashSig]]. Top-level object → static
  * forwarders callable from generated Java. */
object MinHashOps {

  // One MD5 instance per thread, reset per shingle — allocating a digest
  // per shingle would dominate the loop.
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Prime > 2^32 of [[Hashes.minhashPerm]]. */
  val P: Long = 4294967311L

  /** First 32 bits of md5(shingle) as a non-negative long — identical
    * to [[Hashes.h32]] / the oracle's
    * `('0x'||substr(md5(s),1,8))::BIGINT`: 8 hex chars = bytes 0..3. */
  def h32(token: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(token)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** The k MinHash values of `text`'s distinct word n-gram shingles:
    * `mh_j = min over shingles of ((2j+1)·h32(s) + j·12345) mod P` —
    * exactly [[graft.ops.Dedup.minhashSignatures]]'s
    * shingle-explode → h32 → k-conditional-min aggregation, but ONE
    * pass per row with no row fan-out and no shuffle. Returns null for
    * docs with no shingles (< n words), mirroring the aggregation
    * producing no row for them. */
  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val w = text.toString.split(" ", -1)
    if (w.length < n) return null
    val seen = new java.util.HashSet[String]
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= w.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(w(i + j))
        j += 1
      }
      val s = sb.toString
      if (seen.add(s)) {
        val h = h32(s.getBytes("UTF-8"))
        var p = 0
        while (p < k) {
          // (2p+1)·h < 2^37 for k ≤ 32 — no overflow anywhere near 2^63
          val v = ((2L * p + 1L) * h + p * 12345L) % P
          if (v < mins(p)) mins(p) = v
          p += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}

/** Native Catalyst expression for per-document MinHash signatures — the
  * signature stage of MinHash-LSH dedup (SURVEY §2.5 pipeline ops) as a
  * map-only kernel: the declarative form explodes every shingle of
  * every document and shuffles them into a 16-conditional-min
  * aggregation; this computes the same k values in one pass inside
  * whole-stage codegen, so at 100 TB the signature stage is
  * embarrassingly parallel and the first shuffle of the dedup pipeline
  * is the (tiny) banded-signature self-join. NULL text and docs with
  * fewer than n words yield NULL (the aggregation produced no row for
  * them). Parity with the declarative form is asserted in MinHashSpec. */
case class MinHashSig(child: Expression, n: Int, k: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")
  require(k >= 1 && k <= 32, s"signature size must be in [1,32], got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashOps.compute(v.asInstanceOf[UTF8String], n, k)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        |boolean ${ev.isNull} = true;
        |if (!${childGen.isNull}) {
        |  ${ev.value} = graft.functions.MinHashOps.compute(
        |    ${childGen.value}, $n, $k);
        |  ${ev.isNull} = ${ev.value} == null;
        |}
      """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}
