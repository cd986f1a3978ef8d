package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit polynomial rolling hash over the
  * UTF-8 bytes of a string — `h_{i+1} = h_i * B + byte_i` with natural
  * mod-2^64 overflow.
  *
  * This is the document-fingerprinting scale path (SURVEY §2.5 /
  * pipeline ops): a tight generated loop inside whole-stage codegen — no
  * UDF serialization boundary, no md5 allocation per row. The md5-based
  * [[Hashes.contentFingerprint]] stays the oracle-checkable variant;
  * this one is for 100 TB throughput.
  *
  * Interpreted `nullSafeEval` and generated code are exercised for
  * parity in RollingHashSpec.
  */
case class RollingHash(child: Expression, base: Long)
    extends UnaryExpression {

  def this(child: Expression) = this(child, RollingHash.DefaultBase)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * base + (bytes(i) & 0xFF); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val i = ctx.freshName("i")
      val h = ctx.freshName("h")
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * ${base}L + ($bytes[$i] & 0xFF);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingHash =
    copy(child = newChild)
}

object RollingHash {
  /** Same multiplier CPython uses for its legacy string hash — odd,
    * well-mixed for text. */
  val DefaultBase: Long = 1000003L
}
