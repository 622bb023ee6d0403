package graft.tools_dev

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only LPA superstep timing harness (not part of the driver contract).
  * Times each phase of lpaEdges and A/B variants at sf0.1 scale.
  */
object LpaTiming {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"  $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    val edges = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select((col("l_partkey") * 2).cast("long").as("src"),
              (col("l_suppkey") * 2 + 1).cast("long").as("dst"))

    for (round <- 1 to 4) {
      val prePartition = round >= 3
      println(s"== round $round (prePartition=$prePartition) ==")
      val und = t("build und (union + persist + count)") {
        val base = edges.select(col("src"), col("dst"))
          .union(edges.select(col("dst").as("src"), col("src").as("dst")))
        val u = (if (prePartition) base.repartition(col("src")) else base).persist()
        u.count()
        u
      }
      var labels = t("init labels (distinct ids)") {
        val l = und.select(col("src").as("id")).distinct()
          .withColumn("label", col("id")).persist()
        l.count()
        l
      }
      for (i <- 1 to 3) {
        val prev = labels
        labels = t(s"superstep $i (join+count+argmax)") {
          val msgs = und.join(labels.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
            .groupBy(col("src").as("id"), col("label"))
            .agg(count(lit(1)).as("cnt"))
          val l = msgs.groupBy("id")
            .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
            .select(col("id"), (-col("best.nl")).as("label"))
            .persist()
          l.count()
          l
        }
        prev.unpersist(blocking = false)
      }
      labels.unpersist(blocking = false)
      und.unpersist(blocking = false)
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
