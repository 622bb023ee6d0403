package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.graph.GraphOps

/** Dev-only: phase timing for q138 (base CC vs incremental fold). */
object Q138Timing {
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
    for (run <- 1 to 2) {
      println(s"== run $run ==")
      val ok = graft.Tables(spark, sfDir, "orders").select(col("o_orderkey").as("o")).distinct()
      val e = ok.as("a").join(ok.as("b"), col("b.o") === col("a.o") + 1)
        .filter(col("a.o") % 3 =!= 0)
        .select(col("a.o").as("src"), col("b.o").as("dst"))
        .persist()
      t("edge build")(println(s"  edges=${e.count()}"))
      val old = e.filter(col("src") % 5 =!= 0)
      val batch = e.filter(col("src") % 5 === 0)
      val base = t("base ccEdges")(
        { val b = GraphOps.ccEdges(old, "src", "dst", maxIter = 40); b.count(); b })
      t("incrementalCC")(
        GraphOps.incrementalCC(base, batch, "src", "dst").count())
      // inline phase replication
      val l = base.select(col("id"), col("component"))
      val eb = batch.select(col("src"), col("dst"))
      val mapped = t("  mapped build+checkpoint") {
        eb
          .join(l.select(col("id").as("src"), col("component").as("cs")), Seq("src"), "left")
          .join(l.select(col("id").as("dst"), col("component").as("cd")), Seq("dst"), "left")
          .select(coalesce(col("cs"), col("src")).as("src"),
            coalesce(col("cd"), col("dst")).as("dst"))
          .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
      }
      val n = t("  mapped count")(mapped.count())
      println(s"  mapped rows=$n")
      val merged = t("  graphx cc") {
        val m = GraphOps.connectedComponentsDF(spark,
          GraphOps.fromEdges(spark, mapped.coalesce(1), "src", "dst"))
          .select(col("id").as("component"), col("component").as("newc"))
        m.count(); m
      }
      t("  relabel") {
        val newVerts = eb.select(col("src").as("id"))
          .union(eb.select(col("dst").as("id"))).distinct()
          .join(l.select("id"), Seq("id"), "left_anti")
          .select(col("id"), col("id").as("component"))
        l.unionByName(newVerts)
          .join(merged, Seq("component"), "left")
          .select(col("id"), coalesce(col("newc"), col("component")).as("component"))
          .count()
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
