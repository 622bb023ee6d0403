package graft.tools_dev

import graft.Tables
import graft.vector.{IvfPqConfig, IvfPqIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (round-14 verdict item 5): time the persisted PQ-index
  * LIFECYCLE — fit+write → append ×3 → compact → serve — at scale, with
  * data-file counts per stage, so the compaction claim ("wall ~linear
  * in index size; serving exchange-free before and after") carries sf1/
  * sf10 numbers instead of sf0.1 extrapolation. Min-of-2 per protocol
  * is unnecessary here: every stage is a WRITE (its own fresh work);
  * run the whole lifecycle twice instead and keep both JSON lines.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/sf10 SPARK_GRAFT_CPUS=32
  * java [add-opens] -Xmx48g -cp "target/scala-2.13/classes:[spark jars]"
  * graft.tools_dev.IndexLifecycleTiming
  */
object IndexLifecycleTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .appName("graft-index-lifecycle").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.local.dir", "/tmp/graft_spill")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = Tables(spark, sfDir, "embeddings").persist()
    val nAll = emb.count()
    // 70% base build; three 10% append batches — the daily-ingest shape
    val base = emb.filter(pmod(col("vec_id"), lit(10)) <= 6)
    val batches = (7 to 9).map(i => emb.filter(pmod(col("vec_id"), lit(10)) === i))
    val table = "pq_index_lifecycle_sf"
    val buckets = 8

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def files(): Long =
      graft.sinks.ManagedTables.dataFileCount(spark, s"${table}_codes")

    graft.sinks.ManagedTables.dropTableAndLocation(spark, s"${table}_codes")

    val cfg = IvfPqConfig("vec_id", "embedding",
      nCells = 64, m = 4, subDims = 16, k = 16, iters = 2)
    val (_, tFit) = timed {
      val idx = IvfPqIndex.fit(base, cfg)
      idx.write(table, buckets = buckets)
      idx.release()
    }
    val fAfterBuild = files()
    val tAppends = batches.map { b =>
      timed(IvfPqIndex.append(spark, table, b, "embedding"))._2
    }
    val fAfterAppends = files()
    val (_, tCompact) = timed(IvfPqIndex.compact(spark, table))
    val fAfterCompact = files()
    // serve: top-10 for 8 probe vectors, before/after counts equal is
    // pinned by the q179 oracle; here we time the scan shape
    val q = emb.orderBy("vec_id").limit(8)
    val (nServe, tServe) = timed(
      IvfPqIndex.read(spark, table, "embedding").search(q, topK = 10).count())
    def ms(v: Double) = f"$v%.2f"
    println(s"""{"sf":"$sfDir","vectors":$nAll,"fit_write_sec":${ms(tFit)},"append_sec":[${tAppends.map(ms).mkString(",")}],"compact_sec":${ms(tCompact)},"serve_sec":${ms(tServe)},"serve_rows":$nServe,"codes_files":{"build":$fAfterBuild,"after_appends":$fAfterAppends,"after_compact":$fAfterCompact},"buckets":$buckets}""")
    spark.stop()
  }
}
