package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two `array<float>` columns, accumulated in
  * double with a sequential left fold (index order 0..n-1 — bit-identical to
  * `aggregate(zip_with(...))` and to the DuckDB `list_dot_product` twin on
  * `::DOUBLE[]` lists).
  *
  * Why a custom Catalyst Expression (SURVEY.md §4.2 preference order): the
  * higher-order-function composition is interpreted per row — on an
  * all-pairs similarity join that's millions of boxed lambda evaluations.
  * This expression participates in whole-stage codegen: the generated code
  * is a tight primitive loop over the unsafe array data, no allocation.
  * Null elements are treated as 0 (embeddings are dense, non-null).
  */
case class DotF32(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _                       => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects (array<float>, array<float>), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotF32 =
    copy(left = newLeft, right = newRight)
}

/** Column bridge for custom expressions.
  *
  * Spark 4 moved `Column(expr)` construction behind the classic shim
  * (`org.apache.spark.sql.classic.ExpressionUtils.column`); `private[sql]`
  * is public in bytecode, so a one-time reflective handle gives us the
  * supported classic-session path without forking a Spark build. Falls back
  * to the semantically-identical higher-order-function composition if the
  * shim moves.
  */
object GraftFunctions {
  import org.apache.spark.sql.functions._

  private lazy val columnBridge: Option[Expression => Column] =
    try {
      val cls = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
      val m   = cls.getMethod("column", classOf[Expression])
      Some((e: Expression) => m.invoke(null, e).asInstanceOf[Column])
    } catch { case _: Throwable => None }

  private def exprOf(c: Column): Option[Expression] =
    try {
      val m = Class.forName("org.apache.spark.sql.classic.ExpressionUtils")
        .getMethod("expression", classOf[Column])
      Some(m.invoke(null, c).asInstanceOf[Expression])
    } catch { case _: Throwable => None }

  /** Lift a unary custom Expression over a Column via the classic-session
    * bridge; None when the bridge is unavailable (caller supplies the HOF
    * fallback).
    */
  private[functions] def liftUnary(c: Column, f: Expression => Expression): Option[Column] =
    (columnBridge, exprOf(c)) match {
      case (Some(toCol), Some(e)) => Some(toCol(f(e)))
      case _                      => None
    }

  /** Codegen'd dot product; HOF fallback keeps identical fold semantics. */
  def dotF32(a: Column, b: Column): Column =
    (columnBridge, exprOf(a), exprOf(b)) match {
      case (Some(toCol), Some(ae), Some(be)) => toCol(DotF32(ae, be))
      case _ =>
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v)
    }

  /** Codegen'd integer dot product (x69's quantized scoring hot loop);
    * HOF fallback keeps identical fold semantics.
    */
  def dotI64(a: Column, b: Column): Column =
    (columnBridge, exprOf(a), exprOf(b)) match {
      case (Some(toCol), Some(ae), Some(be)) => toCol(DotI64(ae, be))
      case _ =>
        aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)
    }

  /** Per-subspace nearest-codebook-entry positions (1-based, first-min ties
    * — see [[SubspaceArgmin]]); `hofFallback` supplies the original
    * higher-order-function composition when the classic bridge is absent.
    */
  def subspaceArgmin(v: Column, cb: Array[Array[Array[Long]]], subDim: Int)(
      hofFallback: => Column): Column =
    (columnBridge, exprOf(v)) match {
      case (Some(toCol), Some(ve)) => toCol(SubspaceArgmin(ve, cb, subDim))
      case _                       => hofFallback
    }
}
