package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator query (SURVEY §2): a named DataFrame pipeline over
  * a scale-factor directory plus (when SQL-expressible) an equivalent ANSI
  * SQL oracle the driver runs in DuckDB on the same parquet tables.
  *
  * Determinism contract (SURVEY §2 preamble): the result ends in a total
  * order with a unique tiebreak key; float aggregates are rounded to 2 dp;
  * column names and types match the oracle exactly (the hash compare sorts
  * columns by name and checks schema).
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
