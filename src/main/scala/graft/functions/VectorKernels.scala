package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static vector kernels shared by the interpreted and generated paths
  * of [[IDot]]. Top-level object → static forwarders callable from
  * generated Java. */
object VectorOps {

  /** Exact int64 dot product of two long arrays, with semantics
    * identical to the declarative
    * `aggregate(zip_with(a, b, _*_), 0L, _+_)` fold it replaces:
    * `zip_with` pads a length mismatch with nulls and the fold turns
    * any null element into a null result — so length mismatch or a
    * null element anywhere → null. Overflow follows the session's ANSI
    * setting like the fold does: under ANSI mode (Spark 4 default) the
    * fold THROWS on int64 overflow, so this loop does too
    * (`multiplyExact`/`addExact` are JIT intrinsics: a flag branch,
    * free on the non-overflow path every real vector takes); with ANSI
    * off the fold wraps two's-complement, so the loop uses plain ops.
    * The flag is captured per-expression at analysis time ([[IDot]]),
    * mirroring how Spark's own arithmetic resolves its eval mode.
    * Boxed return so generated code can test it. */
  def idot(a: ArrayData, b: ArrayData, ansi: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    if (ansi) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc = Math.addExact(acc, Math.multiplyExact(a.getLong(i), b.getLong(i)))
        i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        acc += a.getLong(i) * b.getLong(i)
        i += 1
      }
    }
    java.lang.Long.valueOf(acc)
  }
  /** Exact int64 squared L2 distance, fold-identical to
    * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` —
    * same null semantics and ANSI-dependent overflow behavior as
    * [[idot]]. */
  def isqdist(a: ArrayData, b: ArrayData, ansi: Boolean): java.lang.Long = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var acc = 0L
    var i = 0
    if (ansi) {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = Math.subtractExact(a.getLong(i), b.getLong(i))
        acc = Math.addExact(acc, Math.multiplyExact(d, d))
        i += 1
      }
    } else {
      while (i < n) {
        if (a.isNullAt(i) || b.isNullAt(i)) return null
        val d = a.getLong(i) - b.getLong(i)
        acc += d * d
        i += 1
      }
    }
    java.lang.Long.valueOf(acc)
  }
}

/** Native Catalyst expression for the exact-int64 dot product at the
  * heart of every similarity operator ([[graft.ops.Vectors]] — ANN
  * rerank, IVF assignment, k-means Lloyd rounds, PQ digests, embedding
  * near-dup verify). The declarative form it replaces
  * (`aggregate(zip_with(a, b, _*_), ...)`) is codegen'd but
  * materializes an intermediate product array PER PAIR — at ANN scale
  * that is one allocation per (query, candidate) pair before any
  * arithmetic happens. This kernel is a single fused loop over the two
  * `ArrayData` buffers: no intermediate array, no lambda dispatch,
  * stays inside whole-stage codegen. Parity with the declarative fold
  * (including its null semantics) is swept in KernelRandomParitySpec.
  * `ansiEnabled` is captured from the session conf when the expression
  * is built (Spark's own arithmetic does the same), so the overflow
  * behavior matches the fold in BOTH ANSI modes. */
case class IDot(left: Expression, right: Expression,
    ansiEnabled: Boolean = SQLConf.get.ansiEnabled) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType
  // Null even for non-null inputs (length mismatch / null element).
  override def nullable: Boolean = true
  override def prettyName: String = "graft_idot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.idot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      ansiEnabled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.VectorOps.idot($a, $b, $ansiEnabled);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IDot =
    copy(left = newLeft, right = newRight)
}

/** Native Catalyst expression for the exact-int64 squared L2 distance —
  * the PQ encode/ADC and k-means assignment hot loop, with the same
  * fused-loop rationale (and null/ANSI-overflow semantics) as [[IDot]].
  * Parity-swept in KernelRandomParitySpec. */
case class ISqDist(left: Expression, right: Expression,
    ansiEnabled: Boolean = SQLConf.get.ansiEnabled) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
        s"(${l.catalogString}, ${r.catalogString})")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_isqdist"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorOps.isqdist(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      ansiEnabled)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Long ${ev.value}_r = graft.functions.VectorOps.isqdist($a, $b, $ansiEnabled);
         |if (${ev.value}_r == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = ${ev.value}_r.longValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ISqDist =
    copy(left = newLeft, right = newRight)
}
