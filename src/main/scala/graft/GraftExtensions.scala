package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{DotExpr, SqDistExpr}

/** SQL-surface registration: exposes the engine's codegen distance
  * kernels to `spark.sql(...)` users as `graft_sqdist`, `graft_dot`,
  * `graft_cosine_distance`. Wire with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[SqDistExpr].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_sqdist"),
      info("graft_sqdist", "graft_sqdist(a, b) - squared L2 distance between float/double arrays"),
      (args: Seq[Expression]) => SqDistExpr(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of float/double arrays"),
      (args: Seq[Expression]) => DotExpr(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("graft_cosine_distance"),
      info("graft_cosine_distance", "graft_cosine_distance(a, b) - 1 - dot(a,b) for pre-normalized arrays"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.Subtract(
          org.apache.spark.sql.catalyst.expressions.Literal(1.0d),
          DotExpr(args(0), args(1)))))
  }
}
