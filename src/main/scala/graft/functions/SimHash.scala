package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 60-bit SimHash kernel shared by the interpreted and
  * generated paths of [[SimHash60]]. Top-level object → static
  * forwarders callable from generated Java. */
object SimHashOps {

  // One MD5 instance per thread, reset per token — allocating a digest
  // per token would dominate the loop.
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(token) — identical to
    * [[Hashes.h60]] / the oracle's `('0x'||substr(md5(t),1,15))::BIGINT`:
    * 15 hex chars = bytes 0..6 in full plus the high nibble of byte 7. */
  def h60(token: Array[Byte]): Long = {
    val md = digest.get()
    md.reset()
    val d = md.digest(token)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** 60-bit SimHash over the DISTINCT single-space-split tokens of
    * `text` (split keeps empty tokens, mirroring `split(text, ' ')`
    * regex semantics with limit -1): bit i of the result is set iff
    * strictly more than half the distinct tokens have bit i set in
    * their 60-bit md5 hash. Exactly the declarative
    * explode→h60→60-conditional-sums aggregation of
    * [[graft.ops.Dedup.simhashDeclarative]], but one pass per row —
    * no token row-explosion, no aggregation, no shuffle. */
  def compute(text: UTF8String): Long = {
    val w = text.toString.split(" ", -1)
    val seen = new java.util.HashSet[String]
    val counts = new Array[Int](60)
    var n = 0
    var i = 0
    while (i < w.length) {
      if (seen.add(w(i))) {
        n += 1
        val h = h60(w(i).getBytes("UTF-8"))
        var b = 0
        while (b < 60) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var b = 0
    while (b < 60) {
      if (2 * counts(b) > n) sim |= 1L << b
      b += 1
    }
    sim
  }
}

/** Native Catalyst expression for per-document 60-bit SimHash — turns
  * the signature stage of SimHash dedup (SURVEY §2.5 pipeline ops) from
  * explode-all-tokens + 60-conditional-sum aggregation (a shuffle whose
  * input is every token of every document) into a map-only kernel
  * inside whole-stage codegen. NULL text propagates to NULL (callers
  * drop null docs, as the exploded form did implicitly). Parity with
  * the declarative aggregation is asserted in SimHashSpec. */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(input: Any): Any =
    SimHashOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SimHashOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}
