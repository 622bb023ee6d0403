package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the complete operator surface (one entry per implemented
  * SURVEY §2 operator / pipeline capability); `oracleSql` carries the DuckDB
  * ANSI-SQL equivalent for every SQL-expressible entry. Column names are
  * aligned between both sides (the driver sorts columns by name before
  * hashing values).
  */
object SparkEntry {

  /** All registered queries, grouped by domain module. */
  def registry: Seq[Q] =
    graft.queries.RelationalQueries.all ++
      graft.queries.TextQueries.all ++
      graft.queries.DedupQueries.all ++
      graft.queries.VectorQueries.all ++
      graft.queries.GraphQueries.all ++
      graft.queries.PipelineQueries.all ++
      graft.queries.RagQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The release-tracklist plan (SURVEY §3.2): window rank → ordered
    * group-concat → left join. */
  def entry(spark: SparkSession): DataFrame = {
    val fn = registry.find(_.name == "q03_order_tracklist").get.fn
    fn(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
