package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev-only: sweep every registered query's physical plan for
  * scale-hostile operators. */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.registry.foreach { q =>
      try {
        val p = q.fn(spark, sfDir).queryExecution.executedPlan.toString
        val flags = Seq(
          "CartesianProduct" -> p.contains("CartesianProduct"),
          "BroadcastNestedLoopJoin" -> p.contains("BroadcastNestedLoopJoin"))
          .collect { case (n, true) => n }
        if (flags.nonEmpty) println(s"FLAG ${q.name}: ${flags.mkString(",")}")
      } catch { case e: Throwable => println(s"ERR ${q.name}: ${e.getClass.getSimpleName}") }
      // iterative queries return persisted frames — drop them so the
      // sweep doesn't accumulate resident caches (see Bench.clearCaches)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
    println("sweep done")
  }
}
