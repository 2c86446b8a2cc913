package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.VecDot

/** SQL surface for the engine's native expressions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the SparkSessionExtensions route — survives `spark.sql(...)` from
  *    any caller);
  *  - `GraftExtensions.register(spark)` on a live session (temp-function
  *    route, handy in tests/notebooks).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(GraftExtensions.vecDotDescriptor)
  }
}

object GraftExtensions {
  private def build(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 2, "vec_dot(a, b) takes exactly two arguments")
    VecDot(exprs.head, exprs(1))
  }

  private[graft] val vecDotDescriptor
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("vec_dot"),
    new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
    build _)

  /** Register on an existing session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", build, "scala_udf")
}
