package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass shingle kernel, shared by the interpreted and generated
  * paths of [[ShingleArray]]. Top-level object → static forwarders, so
  * generated Java calls `graft.functions.ShingleOps.compute(...)`
  * directly (the same pattern Spark's own string expressions use for
  * their runtime helpers). */
object ShingleOps {
  /** Shared empty result (null text, short docs). */
  def empty(): ArrayData = new GenericArrayData(Array.empty[Any])

  /** Distinct word n-grams of `text` split on single spaces. Exactly
    * mirrors the declarative form
    * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
    * slice(split(text, ' '), i, n))))` — split keeps empty tokens
    * (regex semantics with limit -1), distinct keeps first occurrence —
    * but in ONE pass over the row instead of five nested array
    * expressions, each of which re-materializes an array per row. */
  def compute(text: UTF8String, n: Int): ArrayData =
    compute(text, n, true)

  /** As [[compute]], with `distinct = false` yielding POSITIONAL
    * n-grams (every occurrence, in order) — the exact-substring-dedup
    * window form, mirroring the plain `transform(sequence(...))`
    * pipeline without `array_distinct`. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val w = text.toString.split(" ", -1)
    if (w.length < n) return new GenericArrayData(Array.empty[Any])
    val out: java.util.Collection[UTF8String] =
      if (distinct) new java.util.LinkedHashSet[UTF8String]
      else new java.util.ArrayList[UTF8String](w.length - n + 1)
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
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray(Array.empty[AnyRef]).asInstanceOf[Array[Any]])
  }
}

/** Native Catalyst expression for word n-gram shingling — the hot inner
  * loop of MinHash-LSH and n-gram-Jaccard dedup (SURVEY §2.5 pipeline
  * ops). The declarative five-expression pipeline costs ~60 µs/row at
  * 50-word documents (regex split re-evaluated inside the higher-order
  * lambda, slice copies, per-shingle concat); this kernel is one pass,
  * ~5× faster, and stays inside whole-stage codegen. Parity with the
  * declarative form is asserted in ShinglesSpec. */
case class ShingleArray(child: Expression, n: Int,
    distinct: Boolean = true)
    extends UnaryExpression {

  require(n >= 1, s"shingle size must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_shingles"

  // NULL text -> empty shingle set (not NULL), matching the declarative
  // form's `.otherwise(array())` fallback so the two stay row-identical
  // on every input — hence eval/doGenCode handle null explicitly instead
  // of the default null propagation.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleOps.empty
    else ShingleOps.compute(v.asInstanceOf[UTF8String], n, distinct)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val childGen = child.genCode(ctx)
    ev.copy(code =
      code"""
        |${childGen.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  ${childGen.isNull}
        |    ? graft.functions.ShingleOps.empty()
        |    : graft.functions.ShingleOps.compute(${childGen.value}, $n, $distinct);
      """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleArray =
    copy(child = newChild)
}
