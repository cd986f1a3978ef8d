package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Static kernel shared by the interpreted and generated paths of
  * [[SortedIntersectCount]]. Top-level object → static forwarders, so
  * generated Java calls `graft.functions.SortedIntersectOps.count(...)`
  * directly. */
object SortedIntersectOps {

  /** |A ∩ B| of two SORTED, duplicate-free long arrays via one merge
    * walk — the verify step of every SSJoin-style dedup operator
    * (d28/d29's exact intersection sizes). Semantically equal to
    * `size(array_intersect(a, b))` on such inputs, but with no hash
    * set build and no intersection-array allocation per pair — O(na+nb)
    * compares over the two `ArrayData` buffers, inside whole-stage
    * codegen.
    *
    * Preconditions (the producers guarantee both — parity is swept in
    * KernelRandomParitySpec): each array ascending-sorted
    * (`sort_array` default) and duplicate-free (one row per distinct
    * token per doc). Null ELEMENTS cannot occur (collect_list drops
    * nulls; the token-id columns are non-null by construction); if one
    * ever appeared, `sort_array` places nulls first ascending and the
    * leading run is skipped on both sides — nulls never match. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    while (i < na && a.isNullAt(i)) i += 1
    while (j < nb && b.isNullAt(j)) j += 1
    var c = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }
}

/** Native Catalyst expression for the merge-walk intersection count of
  * two sorted duplicate-free ARRAY<BIGINT> columns — the candidate-
  * verify hot loop of the set-similarity joins (d28 Jaccard, d29
  * containment, d32/d36 fidelity audits). The declarative
  * `size(array_intersect(ta, tb))` it replaces builds a hash set of
  * one side and materializes the intersection array per candidate
  * pair just to take its length; this kernel is one fused compare loop
  * with zero allocation, and it lets the verify join ship each doc's
  * token set ONCE as a sorted adjacency array instead of re-shuffling
  * the exploded occurrence table per pair (guide §2.3: shuffle fewer
  * bytes; §1.2: fewer passes). Registered as `graft_icount`. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (ARRAY<BIGINT>, ARRAY<BIGINT>), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_icount"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectOps.count(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SortedIntersectOps.count($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
