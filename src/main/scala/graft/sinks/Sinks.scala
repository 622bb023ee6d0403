package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Sink layer (SURVEY §2.12): sparse JSONL (K2), partitioned parquet with
  * overwrite idempotency (K1/K6), and read-back count validation (K7/K8).
  *
  * Spark's FileOutputCommitter already gives the reference's tmp+atomic-
  * rename discipline (io_managers.py:84-120 via /root/reference); overwrite
  * mode replaces its destructive-reload loops (neo4j_helpers.py:103-189).
  */
object Sinks {

  /** K2: null-stripped NDJSON (the reference's omit_defaults JSONL,
    * io_managers.py:151-212). One file per partition — a distributed
    * streaming write, no driver collect. */
  def writeSparseJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("ignoreNullFields", "true").json(path)

  /** S2: JSONL scan with explicit schema (inference drift is the failure
    * mode SURVEY §2.1 warns about). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** K1: partitioned parquet write (layout = partition column directories,
    * the scalable analog of per-partition asset files). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** K1 at scale — the small-files control: `partitionBy` alone writes
    * one file per (task × partition value); repartitioning on the
    * partition column first co-locates each value into one task, so each
    * directory gets ONE file (plus `maxRecordsPerFile` as the size cap).
    * At 100 TB the difference is thousands vs millions of output files. */
  def writePartitionedCompact(
      df: DataFrame, path: String, partitionCol: String,
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.repartition(col(partitionCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCol)
      .parquet(path)

  /** Z-ORDERED parquet layout: range-partition on the Morton code of
    * two clustering keys and sort within partitions, so each output
    * file covers a compact z-range — and therefore a compact range in
    * BOTH key dimensions. Parquet min/max stats on the keys then let
    * range predicates on EITHER column prune most files (the Delta
    * `OPTIMIZE ZORDER BY` idea as a plain writer). The `_z` helper
    * column is dropped before writing; `buckets` sizes the file count
    * (≈ one file per range bucket). */
  def writeZOrdered(
      df: DataFrame, xCol: String, yCol: String, path: String,
      buckets: Int): Unit =
    df.withColumn("_z",
        graft.functions.ZOrder.zValue(col(xCol), col(yCol)))
      .repartitionByRange(buckets, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(path)

  /** K2 sibling: CSV sink with header — the interchange format the
    * reference's Parquet/JSONL pair doesn't cover but any engine a user
    * "switches to" must speak. Distributed write (one file per
    * partition), default quoting/escaping, so embedded delimiters
    * round-trip. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)

  /** S2 sibling: CSV scan with EXPLICIT schema (same inference-drift
    * rule as readJsonl — never infer in the engine path; doubles parse
    * back bit-exactly from Spark's shortest-repr output). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)

  /** K7: post-write count validation — write, read back, compare. Returns
    * (written, readBack, ok); throws nothing (callers decide, mirroring
    * the reference's warn-on-mismatch, ingest_graph_db.py:336-363). */
  def writeParquetValidated(df: DataFrame, path: String): (Long, Long, Boolean) = {
    val expected = df.count()
    df.write.mode("overwrite").parquet(path)
    val actual = df.sparkSession.read.parquet(path).count()
    (expected, actual, expected == actual)
  }
}
