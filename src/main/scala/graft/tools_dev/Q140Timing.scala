package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, graph => _}
import graft.graph.GraphOps

/** Dev-only: phase timing for q140 (co-purchase build / LPA+refine /
  * well-connectedness split) at SPARK_GRAFT_SF_DIR. */
object Q140Timing {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val li = Tables(spark, sfDir, "lineitem").filter(col("l_orderkey") % 5 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").cast("long").as("src"), col("b.p").cast("long").as("dst"))
      .distinct()
      .localCheckpoint(eager = false)
    t("edges")(println("  |e| = " + e.count()))
    val lpa = t("lpa alone (2 iters)") {
      val r = GraphOps.lpaEdges(e, "src", "dst", maxIter = 2)
      println("  lpa communities = " + r.select("label").distinct().count())
      r
    }
    t("refine alone (1 round)") {
      val r = GraphOps.louvainRefine(e, "src", "dst", lpa, "id", "label", rounds = 1)
      println("  refined communities = " + r.select("label").distinct().count())
    }
    val refined = t("lpa+refine fused") {
      val r = GraphOps.lpaLouvainRefineMulti(e, "src", "dst",
        lpaIters = 2, rounds = 1, gammaPcts = Seq(100L))
        .select(col("id"), col("label"))
      println("  refined communities = " + r.select("label").distinct().count())
      r
    }
    t("split") {
      val s = GraphOps.wellConnectedSplit(e, "src", "dst", refined, "id", "label")
      println("  split communities = " + s.select("label").distinct().count())
    }
    spark.stop()
  }
}
