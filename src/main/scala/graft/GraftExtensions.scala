package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.expressions.DotProduct

/** Session extensions registering the engine's native expressions —
  * activated with `.config("spark.sql.extensions", "graft.GraftExtensions")`
  * (all of this repo's entry points do) or `.withExtensions`. SQL and
  * `call_function` both resolve the names through the function registry,
  * so the custom expressions compose with everything built-in.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes exactly two arguments")
        DotProduct(children.head, children(1))
      }))
  }
}
