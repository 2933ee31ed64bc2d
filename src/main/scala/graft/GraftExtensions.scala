package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.Uuid5Expr

/** Engine extensions, injected via spark.sql.extensions (GraftSession).
  *
  * Registers the custom Catalyst expressions so they are usable from both
  * the DataFrame API (`call_function("uuid5_dns", …)`) and SQL.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("uuid5_dns"),
      new ExpressionInfo("graft.functions.Uuid5Expr", null, "uuid5_dns",
        "uuid5_dns(name) - RFC 4122 v5 UUID of `name` in the DNS namespace.",
        ""),
      (children: Seq[Expression]) => {
        require(children.size == 1, "uuid5_dns expects exactly one argument")
        Uuid5Expr(children.head)
      }): (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder))
  }
}
