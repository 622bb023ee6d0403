package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality check aggregates (SURVEY §2.4 A3-A6, A11; reference
  * checks.py:14-159 and neo4j_helpers.py:271-290). Each check is one
  * aggregation plan over the checked table — the Spark analog of the
  * reference's Dagster `@asset_check`s.
  */
object Checks {

  /** A3: per-column null counts (checks.py:27-30). `count(*) - count(col)`
    * stays inside a single hash-aggregate with map-side partials. */
  def nullCounts(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      count(lit(1)).as("n_rows"),
      cols.map(c => (count(lit(1)) - count(col(c))).as(s"nulls_$c")): _*)

  /** A4: full-row duplicate detection (checks.py:33-41): group by all
    * columns, keep groups with count > 1, total duplicated rows. */
  def duplicateStats(df: DataFrame): DataFrame =
    df.groupBy(df.columns.toIndexedSeq.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
      .agg(coalesce(sum(col("cnt")), lit(0L)).as("dup_rows"),
           count(lit(1)).as("dup_groups"))

  /** A5: completeness ratio (checks.py:68-86): share of rows satisfying a
    * predicate, computed from exact integer counts (see Relational.ratio
    * for why doubles are avoided until the final division). */
  def completenessRatio(df: DataFrame, cond: Column): DataFrame =
    df.agg(
      sum(when(cond, 1L).otherwise(0L)).as("n_complete"),
      count(lit(1)).as("n_rows"))
      .withColumn("ratio", Relational.ratio(col("n_complete"), col("n_rows")))

  /** A11: group-size histogram stats (neo4j_helpers.py:271-290): sizes per
    * key, then count/max/min/mean over the sizes. */
  def groupSizeStats(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("sz"))
      .agg(
        count(lit(1)).as("n_groups"),
        max(col("sz")).as("largest"),
        min(col("sz")).as("smallest"),
        round(avg(col("sz")), 6).as("mean_size"))
}
