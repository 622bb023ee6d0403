package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: materialize an sf1-shaped dataset by replicating sf0.1 with
  * key-space offsets — every scaling table becomes `factor` disjoint key
  * ranges whose FK relationships hold within each copy (custkey in
  * orders tracks customer, partkey/suppkey in lineitem track part/
  * supplier, etc.). Dimension tables (region, nation) keep TPC-H's
  * fixed cardinality, as at every real SF. Event timestamps shift by
  * one day per copy so sessionization/windows see a longer, denser
  * timeline rather than 10 identical stacked days. Used for the sf1
  * full-suite smoke (VERDICT r6 item 9) — NOT part of the driver
  * contract. */
object ScaleGen {
  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  private val Offset = 100000000L

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("/tmp/sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (t <- graft.Tables.names) {
      val df = spark.read.parquet(s"$src/$t.parquet")
      val out = keyCols.get(t) match {
        case None => df // fixed-cardinality dimensions
        case Some(keys) =>
          (0 until factor).map { i =>
            val remapped = keys.foldLeft(df) { (d, c) =>
              val dt = df.schema(c).dataType
              d.withColumn(c, (col(c) + lit(i * Offset)).cast(dt))
            }
            if (t == "events")
              remapped.withColumn("ts",
                col("ts") + expr(s"INTERVAL $i DAYS"))
            else remapped
          }.reduce(_ unionByName _)
      }
      out.write.mode("overwrite").parquet(s"$dst/$t.parquet")
      println(s"WROTE $t rows=${spark.read.parquet(s"$dst/$t.parquet").count()}")
    }
    spark.stop()
  }
}
