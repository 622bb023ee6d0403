package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev-only: the r17 partition-floor experiment (r16 verdict item 2).
  * The clean 8-core driver run beat the 32-core run (200 vs 239 s) with
  * the iterative graph family at 44 vs 73 s — evidence that the
  * superstep loops' per-round constant scales with the PARTITION count
  * (`spark.sql.shuffle.partitions` = cpus in the bench contract), not
  * the data. This probe separates the two variables: master stays
  * local[PP_CPUS] while shuffle.partitions is PP_SHUF, so
  * (32,32) vs (32,8) isolates the partition floor from core count.
  *
  * Usage: PP_QS=q42,q60 PP_CPUS=32 PP_SHUF=8 PP_N=2 runMain ...PartsProbe
  * PP_STATS=1 additionally prints the optimizer statistics of the
  * standard graph edge inputs (how reliable job-free sizing would be).
  */
object PartsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("PP_CPUS", "32")
    val shuf = sys.env.getOrElse("PP_SHUF", cpus)
    val names = sys.env.getOrElse("PP_QS", "q42").split(",").toSeq
    val n = sys.env.getOrElse("PP_N", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuf)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    if (sys.env.get("PP_STATS").contains("1")) {
      import org.apache.spark.sql.functions._
      val li = graft.Tables(spark, sfDir, "lineitem")
      val bip = li.select(col("l_partkey"), col("l_suppkey")).distinct()
        .select((col("l_partkey") * 2).cast("long").as("src"),
                (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
      val liSel = li.filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val cop = liSel.as("a").join(liSel.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").cast("long").as("src"), col("b.p").cast("long").as("dst"))
        .distinct()
      val copCp = cop.localCheckpoint(eager = false)
      def st(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val s = df.queryExecution.optimizedPlan.stats
        println(s"STATS $tag sizeInBytes=${s.sizeInBytes} rowCount=${s.rowCount}")
      }
      st("bipartite", bip)
      st("coPurchase", cop)
      st("coPurchase.localCheckpoint(lazy)", copCp)
      println(s"TRUTH bipartite rows=${bip.count()} coPurchase rows=${cop.count()}")
      clear()
    }
    names.foreach { prefix =>
      val (qname, fn) = graft.SparkEntry.queries.find(_._1.startsWith(prefix))
        .getOrElse(sys.error(s"no query matching $prefix"))
      try fn(spark, "/root/testdata/sf0.001").count() catch { case _: Throwable => () }
      clear()
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val s = (System.nanoTime() - t0) / 1e9
        clear()
        s
      }
      println(f"PARTS cpus=$cpus shuf=$shuf $qname min=${ts.min}%.2f raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
