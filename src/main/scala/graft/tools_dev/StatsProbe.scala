package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: what do optimizer statistics claim for the edge frames the
  * graph loops receive? Decides whether a job-free stats bound can drive
  * the auto broadcast-vs-shuffle state-join choice. */
object StatsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def probe(label: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val s = df.queryExecution.optimizedPlan.stats
      println(s"STATS $label rowCount=${s.rowCount} sizeInBytes=${s.sizeInBytes} actual=${df.count()}")
    }

    for (sf <- Seq("sf0.001", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val li = graft.Tables(spark, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey")).distinct()
        .select((col("l_partkey") * 2).cast("long").as("src"),
                (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      probe(s"$sf bipartite", li)
      probe(s"$sf bipartite persisted", { val p = li.persist(); p.count(); p })
      val cust = graft.Tables(spark, dir, "customer")
        .select((col("c_custkey") * 2).cast("long").as("src"),
                (col("c_nationkey") * 2 + 1).cast("long").as("dst"))
      probe(s"$sf customer-nation", cust)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
