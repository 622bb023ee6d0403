package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev-only: time fuzzyDedup's three ccPath variants on the documents
  * table (the round-12 verdict item-6 measurement: forced GraphX must
  * recover the Auto probe's cost on a clean corpus). Usage:
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 CCPATH_N=2. */
object CcPathTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val n = sys.env.getOrElse("CCPATH_N", "2").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.dedup.Dedup
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    val paths: Seq[(String, Dedup.CcPath)] = Seq(
      "auto" -> Dedup.CcPath.Auto,
      "graphx" -> Dedup.CcPath.GraphX,
      "catalyst" -> Dedup.CcPath.Catalyst)
    // warmup on the small SF when present, else the measured dir (a
    // silently-skipped warmup would load JIT/codegen cost onto the
    // first timed variant — exactly the comparison this tool makes)
    val warmDir =
      if (new java.io.File("/root/testdata/sf0.001").isDirectory)
        "/root/testdata/sf0.001"
      else sfDir
    for ((_, p) <- paths) {
      try Dedup.fuzzyDedup(spark,
        spark.read.parquet(s"$warmDir/documents.parquet"),
        "doc_id", "text", ccPath = p).count()
      catch { case e: Throwable =>
        System.err.println(s"CCPATH warmup failed ($warmDir): $e") }
      clear()
    }
    for ((name, p) <- paths; i <- 1 to n) {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      val t0 = System.nanoTime()
      val rows = Dedup.fuzzyDedup(spark, docs, "doc_id", "text", ccPath = p).count()
      println(f"$name%-8s run$i ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      clear()
    }
    spark.stop()
  }
}
