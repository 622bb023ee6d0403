package graft.tools_dev
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only plan inspector (run manually; not part of the driver contract). */
object ExplainDev {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select((col("l_partkey") * 2).cast("long").as("src"),
              (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val out = graft.graph.GraphOps.lpaEdges(edges, "src", "dst", 1)
    out.explain("formatted")
    spark.stop()
  }
}
