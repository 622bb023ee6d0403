package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Dev-only: candidate overhead cuts for the contracted-graph stages of
  * communityLevels (L1 LPA / L2 CC run on ~5k edges — job/persist
  * overhead dominates there, not data).
  */
object Q60Variants {
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

    // Build the contracted graph once (as communityLevels does)
    val e = li.persist(); e.count()
    val l0 = GraphOps.lpaEdges(e, "src", "dst", 2).localCheckpoint()
    val asg0 = l0.select(col("id"), col("label").as("c0"))
    val ce = e
      .join(asg0.select(col("id").as("src"), col("c0").as("sc")), "src")
      .join(asg0.select(col("id").as("dst"), col("c0").as("dc")), "dst")
      .filter(col("sc") =!= col("dc"))
      .select(col("sc").as("src"), col("dc").as("dst"))
      .distinct()
      .localCheckpoint()
    println(s"contracted edges: ${ce.count()}")

    val withSelf = ce.union(
      ce.select(col("src").as("v")).union(ce.select(col("dst").as("v")))
        .distinct().select(col("v").as("src"), col("v").as("dst")))

    for (run <- 1 to 2) {
      println(s"== run $run ==")
      // A: current library path
      t("A lpaEdges (persist+repartition)") {
        GraphOps.lpaEdges(withSelf, "src", "dst", 2).count()
      }
      spark.sharedState.cacheManager.clearCache()

      // B: fully lazy chain — no persist, no repartition, one job
      t("B lazy chain, no persist") {
        val pre = withSelf.select(col("src"), col("dst"))
        val und = pre.union(pre.select(col("dst").as("src"), col("src").as("dst")))
        var labels = und.select(col("src").as("id")).distinct()
          .withColumn("label", col("id"))
        for (_ <- 1 to 2) {
          val msgs = und
            .join(broadcast(labels.withColumnRenamed("id", "nbr")),
              col("dst") === col("nbr"))
            .groupBy(col("src").as("id"), col("label"))
            .agg(count(lit(1)).as("cnt"))
          labels = msgs.groupBy("id")
            .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
            .select(col("id"), (-col("best.nl")).as("label"))
        }
        labels.count()
      }

      // C: lazy chain with coalesce(4) — fewer tiny tasks
      t("C lazy chain, repartition 4") {
        val pre = withSelf.select(col("src"), col("dst")).repartition(4, col("src"))
        val und = pre.union(pre.select(col("dst").as("src"), col("src").as("dst")))
        var labels = und.select(col("src").as("id")).distinct()
          .withColumn("label", col("id"))
        for (_ <- 1 to 2) {
          val msgs = und
            .join(broadcast(labels.withColumnRenamed("id", "nbr")),
              col("dst") === col("nbr"))
            .groupBy(col("src").as("id"), col("label"))
            .agg(count(lit(1)).as("cnt"))
          labels = msgs.groupBy("id")
            .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
            .select(col("id"), (-col("best.nl")).as("label"))
        }
        labels.count()
      }

      // D: GraphX CC (current l2)
      t("D graphx cc") {
        GraphOps.connectedComponentsDF(spark,
          GraphOps.fromEdges(spark, ce, "src", "dst")).count()
      }

      // E: Catalyst ccEdges on tiny graph
      t("E ccEdges") {
        GraphOps.ccEdges(ce, "src", "dst").count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .filter(_.id > 10).foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
