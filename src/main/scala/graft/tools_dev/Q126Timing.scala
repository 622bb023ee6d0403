package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Dev-only: phase timing for q126 (LPA + louvainRefine). */
object Q126Timing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val li = graft.Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select((col("l_partkey") * 2).cast("long").as("src"),
              (col("l_suppkey") * 2 + 1).cast("long").as("dst"))

    for (run <- 1 to 2) {
      println(s"== run $run ==")
      val e = li.persist()
      t("edges persist")(e.count())
      val lpa = t("lpa 3 iters") {
        val r = GraphOps.lpaEdges(e, "src", "dst", maxIter = 3); r.count(); r
      }
      t("louvainRefine rounds=2") {
        GraphOps.louvainRefine(e, "src", "dst", lpa, "id", "label", rounds = 2).count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
