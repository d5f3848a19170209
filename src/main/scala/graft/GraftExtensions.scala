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

    // Spark ships codegen'd bloom-filter build/probe expressions for its
    // runtime-filter rewrite (BloomFilterAggregate / BloomFilterMightContain)
    // but leaves them out of the public registry. Registering them gives the
    // engine user-level mergeable bloom membership — the broadcast-a-bitset
    // primitive that replaces a broadcast hash SET when the member list is
    // huge (set-membership decontam at billions of eval shingles): the
    // filter is bits (capped by numBits), not entries.
    ext.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => children match {
        case Seq(child) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child)
        case Seq(child, items) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items)
        case Seq(child, items, bits) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(child, items, bits)
        case _ => throw new IllegalArgumentException(
          "graft_bloom_agg(xxhash64_value[, est_items[, num_bits]])")
      }))
    ext.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_might_contain(bloom, xxhash64_value) takes exactly two arguments")
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))
      }))
  }
}
