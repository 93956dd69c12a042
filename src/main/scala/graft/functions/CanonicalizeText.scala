package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the canonical text pass (Canon, the
  * thinning-fixpoint analogue) — a scalar `STRING → STRING` with
  * `doGenCode`, so the canonicalization participates in whole-stage codegen
  * instead of paying ScalaUDF encode/decode per row (SURVEY.md §7 "custom
  * Expression ... keeps the hot path off udf serialization").
  */
case class CanonicalizeText(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_canon"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.text.Canon(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.Canon$$.MODULE$$.apply($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): CanonicalizeText =
    copy(child = newChild)
}

/** Guo-Hall-profile skeleton as a native expression. */
case class SkeletonText(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_skeleton"

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(graft.text.Canon.skeleton(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"UTF8String.fromString(graft.text.Canon$$.MODULE$$.skeleton($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): SkeletonText =
    copy(child = newChild)
}

object GraftFunctions {
  /** Register `graft_canon` / `graft_skeleton` for SQL / selectExpr use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_canon", exprs => CanonicalizeText(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_skeleton", exprs => SkeletonText(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_quality_counts", exprs => TextQualityCounts(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lang_id", exprs => LangIdExpr(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_dot", exprs => ArrayDotProduct(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_lsh_dot", exprs => LshPlaneDot(exprs.head, exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash4", exprs => MinHash4(exprs.head), "scala_udf")
  }
}
