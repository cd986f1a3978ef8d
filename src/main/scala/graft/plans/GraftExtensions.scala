package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{IDot, ISqDist, KmvSketchAgg, MinHashSig, PHash48, RollingHash, ShingleArray, SimHash60, SortedIntersectCount}

/** Engine SQL surface: registers graft's native expressions so plain
  * `spark.sql("SELECT graft_rolling_hash(text) ...")` works.
  *
  * Use either as a session extension
  * (`--conf spark.sql.extensions=graft.plans.GraftExtensions`) or
  * imperatively via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.rollingHashDescriptor)
    ext.injectFunction(GraftExtensions.shinglesDescriptor)
    ext.injectFunction(GraftExtensions.simhashDescriptor)
    ext.injectFunction(GraftExtensions.minhashDescriptor)
    ext.injectFunction(GraftExtensions.idotDescriptor)
    ext.injectFunction(GraftExtensions.isqdistDescriptor)
    ext.injectFunction(GraftExtensions.phashDescriptor)
    ext.injectFunction(GraftExtensions.kmvDescriptor)
    ext.injectFunction(GraftExtensions.icountDescriptor)
    ext.injectOptimizerRule(PlanGuardRule)
  }
}

object GraftExtensions {
  private val rollingHashDescriptor = (
    FunctionIdentifier("graft_rolling_hash"),
    new ExpressionInfo(classOf[RollingHash].getName, "graft_rolling_hash"),
    (exprs: Seq[Expression]) =>
      if (exprs.length == 2)
        RollingHash(exprs.head,
          exprs(1).eval().asInstanceOf[Number].longValue())
      else new RollingHash(exprs.head))

  private val shinglesDescriptor = (
    FunctionIdentifier("graft_shingles"),
    new ExpressionInfo(classOf[ShingleArray].getName, "graft_shingles"),
    (exprs: Seq[Expression]) =>
      ShingleArray(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        if (exprs.length >= 3) exprs(2).eval().asInstanceOf[Boolean]
        else true))

  private val simhashDescriptor = (
    FunctionIdentifier("graft_simhash"),
    new ExpressionInfo(classOf[SimHash60].getName, "graft_simhash"),
    (exprs: Seq[Expression]) => SimHash60(exprs.head))

  private val minhashDescriptor = (
    FunctionIdentifier("graft_minhash"),
    new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash"),
    (exprs: Seq[Expression]) =>
      MinHashSig(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue(),
        exprs(2).eval().asInstanceOf[Number].intValue()))

  private val idotDescriptor = (
    FunctionIdentifier("graft_idot"),
    new ExpressionInfo(classOf[IDot].getName, "graft_idot"),
    (exprs: Seq[Expression]) => IDot(exprs.head, exprs(1)))

  private val isqdistDescriptor = (
    FunctionIdentifier("graft_isqdist"),
    new ExpressionInfo(classOf[ISqDist].getName, "graft_isqdist"),
    (exprs: Seq[Expression]) => ISqDist(exprs.head, exprs(1)))

  private val phashDescriptor = (
    FunctionIdentifier("graft_phash"),
    new ExpressionInfo(classOf[PHash48].getName, "graft_phash"),
    (exprs: Seq[Expression]) => PHash48(exprs.head))

  private val kmvDescriptor = (
    FunctionIdentifier("graft_kmv"),
    new ExpressionInfo(classOf[KmvSketchAgg].getName, "graft_kmv"),
    (exprs: Seq[Expression]) =>
      KmvSketchAgg(exprs.head,
        exprs(1).eval().asInstanceOf[Number].intValue()))

  private val icountDescriptor = (
    FunctionIdentifier("graft_icount"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName,
      "graft_icount"),
    (exprs: Seq[Expression]) =>
      SortedIntersectCount(exprs.head, exprs(1)))

  /** Imperative registration on an existing session. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", rollingHashDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles", shinglesDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_simhash", simhashDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash", minhashDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_idot", idotDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_isqdist", isqdistDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_phash", phashDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_kmv", kmvDescriptor._3, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_icount", icountDescriptor._3, "built-in")
  }
}
