package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a DataFrame program over an sf directory,
  * plus (when SQL-expressible) the equivalent DuckDB oracle SQL. Column
  * names MUST match between `fn`'s output and the oracle (the driver sorts
  * columns by name before hashing).
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, Some(sql))
  def noOracle(name: String)(fn: (SparkSession, String) => DataFrame): Q =
    Q(name, fn, None)
}
