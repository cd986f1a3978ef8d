package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Static probe helper shared by the interpreted and generated paths
  * of [[BloomMightContain]] — one static call per row in generated
  * Java, mirroring the other graft kernels. */
object BloomOps {
  def contains(bc: Broadcast[BloomFilter], v: Long): Boolean =
    bc.value.mightContainLong(v)
}

/** Native codegen `might_contain` over a driver-built, broadcast Bloom
  * filter — the guide §3.2 manual pre-filter without a Scala-closure
  * UDF in the hot path (a UDF would deoptimize the exact map-side
  * stage the filter exists to keep cheap). Used by q63's wedge close:
  * the filter is built over `xxhash64(src, dst)` of the oriented edge
  * list and applied to `xxhash64(v, w)` of each wedge BEFORE the wedge
  * exchange, so only edge-closing wedges (plus the fpp share of false
  * positives) are shuffled; the exact semi-join downstream removes
  * false positives, so results are bit-identical by construction (a
  * Bloom filter has no false negatives, and hash collisions only ADD
  * false positives).
  *
  * The broadcast rides the expression (captured at plan build, like
  * Spark's own runtime-filter literal); it is not registrable through
  * the function registry's `Seq[Expression]` builders, so call sites
  * construct it via [[org.apache.spark.sql.GraftColumnBridge]]. */
case class BloomMightContain(child: Expression,
    bloom: Broadcast[BloomFilter]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects BIGINT (a 64-bit key hash), got " +
          t.catalogString)
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    BloomOps.contains(bloom, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
      classOf[Broadcast[BloomFilter]].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BloomOps.contains($bcRef, $c);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BloomMightContain = copy(child = newChild)
}
