package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

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
    if (name == "events") readEventsFile(spark, s"$dir/$name.parquet")
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Events read + ts normalization, callable on any single file (specs use
    * this against the per-encoding fixtures). */
  private[graft] def readEventsFile(spark: SparkSession, path: String): DataFrame =
    normalizeEventTs(readMaybeNanos(spark, path))

  /** Read a parquet file whose timestamp columns may be TIMESTAMP(NANOS).
    * Spark has no nanos type and refuses such files unless
    * `spark.sql.legacy.parquet.nanosAsLong` is set, so flip it around the
    * read and restore the caller's value (no lasting session mutation).
    */
  private def readMaybeNanos(spark: SparkSession, path: String): DataFrame = {
    val key   = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try spark.read.parquet(path)
    finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  /** Normalize `ts` to session-TZ TimestampType across the three encodings
    * the testdata has shipped with over time:
    *   - TIMESTAMP(NANOS)  → read as long (nanosAsLong), integer-truncate
    *     ns→us exactly as DuckDB's reader does, then timestamp_micros;
    *   - TIMESTAMP_MICROS with isAdjustedToUTC=0 → Spark reads
    *     TIMESTAMP_NTZ; every entry point pins the session TZ to UTC, so
    *     casting NTZ→TZ is value-preserving and the DuckDB `epoch_us`
    *     oracles hash-match;
    *   - TIMESTAMP_MICROS adjusted-to-UTC → already TimestampType, no-op.
    * Callers can then use `unix_micros(col("ts"))` unconditionally.
    */
  private[graft] def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }

  /** Multi-path scan — the all-partitions merge case (reference
    * io_managers.py:132-137 builds one multi-file scan_parquet). */
  def multi(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}
