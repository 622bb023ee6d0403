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

  /** Key-skew diagnostics — the pre-flight report that decides whether a
    * join/aggregation on `key` needs salting or AQE skew handling at
    * scale: per-key count distribution (EXACT p50/p90/p99 via
    * count-of-counts — the percentile runs over the tiny distinct-size
    * domain, never a single-partition sort of the key space), the
    * max/mean skew factor, and the top-N heaviest keys as an ordered
    * readable string.
    *
    * Scale shape: one groupBy(key) shuffle (map-side combined), one
    * groupBy(count) over key-cardinality rows, a window over the BOUNDED
    * distinct-size domain, and a TakeOrdered for the top-N — no
    * key-cardinality sort, no driver collect. Returns one row. */
  def skewReport(df: DataFrame, key: String, topN: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(key).cast("string").as("k"))
      .agg(count(lit(1)).as("cnt"))
      .persist()
    // count-of-counts: (cnt, #keys with that cnt), cumulated in cnt order
    val hist = counts.groupBy("cnt").agg(count(lit(1)).as("nk"))
    // unpartitioned window is BOUNDED: domain is the count-of-counts
    // histogram (#distinct group sizes, ≪ #keys), never row-scale data
    val cum = hist.withColumn("cum",
      sum(col("nk")).over(Window.orderBy(col("cnt"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = counts.agg(
      count(lit(1)).as("n_keys"),
      sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"))
    // exact percentile = smallest cnt whose cumulative key count reaches
    // ceil(q·K); integer position arithmetic both engines replay
    def pct(q: Int): Column =
      min(when(col("cum") * 100 >= col("n_keys") * q, col("cnt")))
    val stats = cum.crossJoin(broadcast(tot))
      .agg(
        first(col("n_keys")).as("n_keys"),
        first(col("n_rows")).as("n_rows"),
        first(col("max_cnt")).as("max_cnt"),
        pct(50).as("p50_cnt"), pct(90).as("p90_cnt"), pct(99).as("p99_cnt"))
      .withColumn("mean_cnt",
        round(col("n_rows").cast("double") / col("n_keys"), 6))
      .withColumn("skew_factor",
        round(col("max_cnt").cast("double") * col("n_keys") / col("n_rows"), 6))
    val top = counts
      .orderBy(col("cnt").desc, col("k").asc)
      .limit(topN)
      .agg(array_join(
        transform(
          array_sort(collect_list(struct((-col("cnt")).as("nc"), col("k")))),
          x => concat(x.getField("k"), lit(":"),
            (-x.getField("nc")).cast("string"))),
        ", ").as("top_keys"))
    val out = stats.crossJoin(top).persist()
    out.count()
    counts.unpersist(blocking = false)
    out
  }

  /** Per-group ECDF probes — the length/size-distribution QA report:
    * for each group, P(value ≤ x) at caller-chosen probe points, plus
    * the group count. One hash agg, one scan; exact integer count
    * ratios with a single rounded division per cell, so the whole
    * report replays in SQL (unlike interpolated percentile forms whose
    * float formulas drift across engines — the probe-point ECDF is the
    * deterministic dual of a quantile table). */
  def ecdfAt(df: DataFrame, groupCol: String, valueCol: String,
      points: Seq[Long]): DataFrame = {
    require(points.nonEmpty, "ecdfAt needs at least one probe point")
    val aggs = points.map { x =>
      round(
        sum(when(col(valueCol) <= x, 1L).otherwise(0L)).cast("double") /
          count(lit(1)).cast("double"), 6).as(s"p_le_$x")
    }
    df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), aggs: _*)
  }

  /** Column profile in ONE table scan — the first thing run on a new
    * 100 TB drop: per column (col_name, n_rows, n_nulls, n_distinct,
    * min_value, max_value as strings). All columns' aggregates ride a
    * single `agg` (Catalyst plans the multi-distinct via one Expand —
    * rows × |cols| pre-aggregation, still one pass over storage; swap
    * `countDistinct` for `approx_count_distinct` when exact per-column
    * cardinality isn't worth the expand at full corpus scale), then an
    * explode pivots the 1-row result to one row per column. Callers
    * pick columns whose string casts are engine-stable (ints, strings,
    * dates — not doubles) when the result must replay in SQL. */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__nn_$c"),
        countDistinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    df.agg(count(lit(1)).as("__n"), aggs: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("col_name"), col("__n").as("n_rows"),
        col(s"__nn_$c").as("n_nulls"), col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"), col(s"__mx_$c").as("max_value"))): _*))
        .as("p"))
      .select("p.*")
  }
}
