package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for float-vector dot products.
  *
  * Why below the public API (the one deliberate exception to "compose
  * built-ins"): Spark's higher-order functions (`zip_with` + `aggregate`)
  * evaluate the lambda INTERPRETED, one function-call per element — 64
  * boxed lambda invocations per row per dot product. This expression
  * participates in whole-stage codegen as a tight primitive loop, which is
  * what a 100 TB similarity scan needs. Same left-to-right summation order
  * as the HOF version, so results are bit-identical (VectorExprSpec).
  *
  * Usage: [[VectorFunctions.registerOn]] then `expr("float_dot(a, b)")`.
  */
case class FloatDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
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
         |  $s += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatDot =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Register `float_dot` on a session's function registry; idempotent. */
  def registerOn(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "float_dot", exprs => FloatDot(exprs(0), exprs(1)), "built-in")
  }
}

/** The deployment-grade registration path: inject the engine's extensions at
  * session build time —
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.functions.GraftExtensions`.
  * Sessions built this way have `float_dot` available in SQL from the start
  * (no per-session registerOn call). */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("float_dot"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[FloatDot].getName, "float_dot"),
      (exprs: Seq[Expression]) => FloatDot(exprs(0), exprs(1))))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("topk_pairs"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[TopKPairs].getName, "topk_pairs"),
      (exprs: Seq[Expression]) => TopKPairs(exprs(0), exprs(1), exprs(2))))
    // optimizer rule: unbounded levenshtein-threshold predicates rewrite to
    // the banded O(len·k) form (graft.plans.BoundedLevenshteinRule)
    e.injectOptimizerRule(_ => graft.plans.BoundedLevenshteinRule)
  }
}
