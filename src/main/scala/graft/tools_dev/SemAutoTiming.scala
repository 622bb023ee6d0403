package graft.tools_dev

import org.apache.spark.sql.SparkSession

/** Dev-only: time SemDeDup under fixed k vs the corpus-scaled
  * semDedupAuto sizing at SPARK_GRAFT_SF_DIR (the round-10 PLANS
  * measurement — the q143 sf10 adjudication's remedy as a helper). */
object SemAutoTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sf10")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    def clear(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    def time(tag: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val dups = body
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1f s  dups=$dups")
      clear()
    }
    val targets = sys.env.getOrElse("SEMAUTO_TARGETS", "256")
      .split(",").map(_.trim.toLong)
    println(s"n=$n targets=${targets.mkString(",")} " +
      s"ks=${targets.map(graft.vector.Similarity.semDedupAutoK(n, _)).mkString(",")}")
    for (run <- 1 to sys.env.getOrElse("SEMAUTO_RUNS", "2").toInt) {
      if (sys.env.get("SEMAUTO_SKIP_FIXED").isEmpty)
        time(s"run$run fixed k=8")(
          graft.vector.Similarity.semDedup(emb, "vec_id", "embedding",
            k = 8, iters = 2, tau = 0.35)
            .filter(org.apache.spark.sql.functions.col("is_dup")).count())
      targets.foreach { t =>
        time(s"run$run auto target=$t")(
          graft.vector.Similarity.semDedupAuto(emb, "vec_id", "embedding",
            iters = 2, tau = 0.35, targetClusterSize = t)
            .filter(org.apache.spark.sql.functions.col("is_dup")).count())
      }
    }
    spark.stop()
  }
}
