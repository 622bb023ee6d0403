package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{expr, timestamp_micros}
import org.apache.spark.sql.types.LongType

/** Loaders for the synthetic test tables (TESTDATA.md).
  *
  * Mirrors the reference's parquet-scan source surface (SURVEY §2.1 S1:
  * reference io_managers.py:122-140 `pl.scan_parquet`): every table is a
  * lazy columnar scan; Catalyst pushes projections and predicates into the
  * parquet reader, so callers never pre-prune manually.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) — Spark has no nanos type, so
      // read nanos-as-long and truncate to micros with exact integer `div`
      // (DuckDB's read path truncates ns→us identically; verified).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Multi-path scan — the all-partitions merge case (reference
    * io_managers.py:132-137 builds one multi-file scan_parquet). */
  def multi(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}
