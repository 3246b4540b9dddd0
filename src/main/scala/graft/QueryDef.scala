package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable operator demo: a Spark query over the testdata
  * tables plus (when SQL-expressible) an equivalent DuckDB oracle.
  *
  * Column names MUST match between `fn`'s output and `oracle` — the
  * driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
