package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Dev-only: phase-by-phase wall times of q60's communityLevels ladder
  * (L0 LPA, contraction, L1 LPA, L2 CC, assembly) to localize where the
  * composite spends its time before changing anything. */
object Q60Timing {
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
      val l0 = t("L0 lpa (2 iters)") {
        val r = GraphOps.lpaEdges(e, "src", "dst", 2).localCheckpoint(); r.count(); r
      }
      val asg0 = l0.select(col("id"), col("label").as("c0"))
      val ce = t("contraction") {
        val r = e
          .join(asg0.select(col("id").as("src"), col("c0").as("sc")), "src")
          .join(asg0.select(col("id").as("dst"), col("c0").as("dc")), "dst")
          .filter(col("sc") =!= col("dc"))
          .select(col("sc").as("src"), col("dc").as("dst"))
          .distinct()
          .localCheckpoint()
        r.count(); r
      }
      println(s"  contracted edges: ${ce.count()}")
      val withSelf = ce.union(
        ce.select(col("src").as("v")).union(ce.select(col("dst").as("v")))
          .distinct().select(col("v").as("src"), col("v").as("dst")))
      val l1 = t("L1 lpa (2 iters)") {
        val r = GraphOps.lpaEdges(withSelf, "src", "dst", 2); r.count(); r
      }
      val l2 = t("L2 graphx cc") {
        val r = GraphOps.connectedComponentsDF(spark,
          GraphOps.fromEdges(spark, ce, "src", "dst")); r.count(); r
      }
      t("full communityLevels end-to-end") {
        GraphOps.communityLevels(spark, li, "src", "dst", iterPerLevel = 2).count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
