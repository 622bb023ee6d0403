package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.vector.{Clustering, Similarity}

/** Dev-only: phase timing for q143 semDedup at SPARK_GRAFT_SF_DIR. */
object Q143Timing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val k = args.headOption.map(_.toInt).getOrElse(8) // SemDeDup: scale k with corpus
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PHASE $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val emb = graft.Tables(spark, sfDir, "embeddings")
    val km = t("kmeans alone") {
      val r = Clustering.kmeans(emb, "vec_id", "embedding", k, 2)
      println("  rows=" + r.count()); r
    }
    val v = t("v persist+count") {
      val r = emb.select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("nrm", sqrt(aggregate(zip_with(col("v"), col("v"), (a, b) => a * b),
          lit(0.0), (a, b) => a + b)))
        .join(km, "vec_id")
        .persist()
      println("  rows=" + r.count()); r
    }
    val pairs = t("pairs") {
      val a = v.select(col("vec_id").as("ia"), col("cluster"),
        col("v").as("va"), col("nrm").as("na"))
      val b = v.select(col("vec_id").as("ib"), col("cluster"),
        col("v").as("vb"), col("nrm").as("nb"))
      val p = a.join(b, Seq("cluster"))
        .filter(col("ia") < col("ib"))
        .filter(aggregate(zip_with(col("va"), col("vb"), (x, y) => x * y),
          lit(0.0), (x, y) => x + y) / (col("na") * col("nb")) >= 0.35)
        .select(col("ia").as("src"), col("ib").as("dst"))
      println("  pairs=" + p.count()); p
    }
    t("ccEdges") {
      val c = graft.graph.GraphOps.ccEdges(pairs, "src", "dst")
      println("  comp rows=" + c.count())
    }
    t("full semDedup") {
      println("  out=" + Similarity.semDedup(emb, "vec_id", "embedding", k, 2, 0.35).count())
    }
    spark.stop()
  }
}
