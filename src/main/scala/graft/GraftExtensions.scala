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

  private def info(clazz: Class[_], name: String, usage: String) =
    new ExpressionInfo(clazz.getName, null, name, usage, "")

  private def binary(name: String)(mk: (Expression, Expression) => Expression)
  : Seq[Expression] => Expression = { args =>
    require(args.length == 2,
      s"$name requires exactly 2 arguments, got ${args.length}")
    mk(args(0), args(1))
  }

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("graft_sqdist"),
      info(classOf[SqDistExpr], "graft_sqdist",
        "graft_sqdist(a, b) - squared L2 distance between float/double arrays"),
      binary("graft_sqdist")(SqDistExpr(_, _))))
    e.injectFunction((FunctionIdentifier("graft_dot"),
      info(classOf[DotExpr], "graft_dot",
        "graft_dot(a, b) - dot product of float/double arrays"),
      binary("graft_dot")(DotExpr(_, _))))
    e.injectFunction((FunctionIdentifier("graft_cosine_distance"),
      info(classOf[DotExpr], "graft_cosine_distance",
        "graft_cosine_distance(a, b) - 1 - dot(a,b) for pre-normalized arrays"),
      binary("graft_cosine_distance")((a, b) =>
        org.apache.spark.sql.catalyst.expressions.Subtract(
          org.apache.spark.sql.catalyst.expressions.Literal(1.0d),
          DotExpr(a, b)))))
  }
}
