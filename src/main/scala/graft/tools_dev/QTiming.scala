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
    // cumulative shuffle-write across all stages — per-run delta printed
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleWrite.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    val fn = graft.SparkEntry.queries(qname)
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    // warmup on sf0.001
    try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
    clear()
    for (i <- 1 to n) {
      val sw0 = shuffleWrite.get()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val secs = (System.nanoTime() - t0) / 1e9
      // listener events are async — give the bus a beat before reading
      Thread.sleep(500)
      val swMb = (shuffleWrite.get() - sw0) / 1048576.0
      println(f"RUN$i $secs%.2f s  shuffleWrite=$swMb%.1f MiB")
      clear()
    }
    spark.stop()
  }
}
