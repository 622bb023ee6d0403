package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev-only: run one registered query repeatedly in a warm session,
  * clearing caches between runs, to separate plan cost from JIT/load
  * noise. Usage: QTIMING_Q=q42_lpa_communities QTIMING_N=3. */
object QTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val qname = sys.env.getOrElse("QTIMING_Q", "q42_lpa_communities")
    val n = sys.env.getOrElse("QTIMING_N", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(qname)
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // warmup on sf0.001
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    clear()
    for (i <- 1 to n) {
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      println(f"RUN$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      clear()
    }
    spark.stop()
  }
}
