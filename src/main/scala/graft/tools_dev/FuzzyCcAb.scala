package graft.tools_dev

import org.apache.spark.sql.SparkSession
import graft.dedup.Dedup
import graft.dedup.Dedup.CcPath

/** Dev-only (r16 ADVICE low #2): A/B fuzzyDedup's CC engine at
  * SPARK_GRAFT_SF_DIR by forcing each path — the SemCcAb harness
  * generalized. fuzzyDedup kept graphxMaxEdges = 2M (its round-12 sf10
  * measurement) while semDedup/wellConnectedSplit moved to 50k on the
  * r16 sf1 measurement; fuzzyDedup's verified dup graphs are also
  * near-cliques (ScaleGen's exact copies form 10-cliques at sf1), so
  * Auto may pick the slower engine across [50k, 2M]. This measures the
  * actual crossover regime at sf1 (~225k-edge clique graph). */
object FuzzyCcAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf1")
    val n = args.headOption.map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    val variants = Seq("graphx" -> CcPath.GraphX, "catalyst" -> CcPath.Catalyst)
    for ((_, p) <- variants) { // warmup both engines on the small SF
      try Dedup.fuzzyDedup(spark,
        graft.Tables(spark, "/root/testdata/sf0.01", "documents"),
        "doc_id", "text", ccPath = p).count()
      catch { case e: Throwable => System.err.println(s"warmup: $e") }
      clear()
    }
    for (i <- 1 to n; (name, p) <- variants) {
      val docs = graft.Tables(spark, sfDir, "documents")
      val t0 = System.nanoTime()
      val rows = Dedup.fuzzyDedup(spark, docs, "doc_id", "text",
        ccPath = p).count()
      println(f"FUZZYCC pass$i $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$rows")
      clear()
    }
    spark.stop()
  }
}
