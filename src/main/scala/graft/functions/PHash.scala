package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 48-bit block-mean perceptual hash kernel shared by the
  * interpreted and generated paths of [[PHash48]]. Top-level object →
  * static forwarders callable from generated Java. */
object PHashOps {

  /** Exactly the relational block-mean pipeline collapsed to one pass:
    * code point at 0-based position p lands in block `(p·48) div n`
    * (n = code-point length); bit b is set iff the block exists and
    * `s_b·n >= ts·cnt_b` (block mean ≥ global mean, exact integer
    * cross-multiply — s_b·n ≤ n²·0x10FFFF stays far below 2^63 for any
    * realistic document). Empty input hashes to 0; callers drop empty
    * media first, mirroring the exploded form where an empty doc simply
    * produced no block rows. */
  def compute(text: UTF8String): Long = {
    val cps = text.toString.codePoints.toArray
    val n = cps.length
    if (n == 0) return 0L
    val cnt = new Array[Long](48)
    val s = new Array[Long](48)
    var ts = 0L
    var p = 0
    while (p < n) {
      val b = ((p.toLong * 48L) / n).toInt
      cnt(b) += 1
      s(b) += cps(p)
      ts += cps(p)
      p += 1
    }
    var h = 0L
    var b = 0
    while (b < 48) {
      if (cnt(b) > 0 && s(b) * n >= ts * cnt(b)) h |= 1L << b
      b += 1
    }
    h
  }
}

/** Native Catalyst expression for the per-document 48-bit block-mean
  * perceptual hash — turns m04's signature stage from a per-character
  * posexplode (one row per char through two aggregations) into a
  * map-only kernel inside whole-stage codegen. NULL propagates to
  * NULL. Parity with the declarative stages is asserted in OpsSpec. */
case class PHash48(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_phash"

  override protected def nullSafeEval(input: Any): Any =
    PHashOps.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PHashOps.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): PHash48 =
    copy(child = newChild)
}
