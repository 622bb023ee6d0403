package graft.tools_dev

import graft.Tables
import graft.vector.{IvfPqConfig, IvfPqIndex}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (r17 verdict item 6): stage-level wall breakdown of
  * q176_pq_index_append / q179_pq_index_compact — fit, write, append,
  * compact, read+search — to find which side pays the ~4 s. */
object Q176Timing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 2) {
      println(s"== round $round")
      val emb = Tables(spark, sfDir, "embeddings")
      val old = emb.filter(col("vec_id") % 10 =!= 0)
      val fresh = emb.filter(col("vec_id") % 10 === 0)
      val idx = t("fit") {
        IvfPqIndex.fit(old, IvfPqConfig("vec_id", "embedding",
          nCells = 16, m = 4, subDims = 16, k = 4, iters = 2))
      }
      val table = "pq_index_q176timing"
      t("write")(idx.write(table))
      idx.release()
      t("append")(IvfPqIndex.append(spark, table, fresh, "embedding"))
      t("compact")(IvfPqIndex.compact(spark, table))
      val q = fresh.orderBy("vec_id").limit(1)
      t("read+search")(
        IvfPqIndex.read(spark, table, "embedding").search(q, topK = 10).count())
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
