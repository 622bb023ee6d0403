package graft.tools_dev

import graft.Tables
import graft.graph.GraphOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (r17): stage-level wall breakdown of q150_graphrag_capstone —
  * edge build, ladder (LPA+refine), per-γ splits, metadata aggregations —
  * to find where the residual wall goes after the partition-floor and
  * per-γ-concurrency changes. Replays the query's stages with explicit
  * materialization barriers (the real query is one lazy program; the
  * barriers here ATTRIBUTE cost, they don't measure the query's total). */
object Q150Timing {
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
      val li = Tables(spark, sfDir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val e = li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").cast("long").as("src"), col("b.p").cast("long").as("dst"))
        .distinct()
        .localCheckpoint(eager = false)
      val cnt = t("edges count (checkpoint fill)")(e.count())
      val parts = Some(GraphOps.sizedLoopParts(spark, BigInt(cnt) * 2))
      t("lpa+refine alone (core)") {
        GraphOps.lpaLouvainRefineMulti(e, "src", "dst",
            lpaIters = 2, rounds = 1, gammaPcts = Seq(200L, 50L, 10L),
            numPartitions = parts)
          .write.format("noop").mode("overwrite").save()
      }
      val ladder = t("ladder (lpa+refine+splits)") {
        val r = GraphOps.lpaLeidenRefineMulti(e, "src", "dst",
          lpaIters = 2, rounds = 1, gammaPcts = Seq(200L, 50L, 10L),
          numPartitions = parts)
        r.write.format("noop").mode("overwrite").save()
        r
      }
      t("metadata stage (rest of q150)") {
        val und = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
        val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
        val part = Tables(spark, sfDir, "part").select(
          col("p_partkey").cast("long").as("id"), col("p_brand"), col("p_type"))
        val base = ladder.join(part, "id").join(deg, Seq("id"), "left")
          .select(col("gamma_pct"), col("label"), col("id"),
            col("p_brand"), col("p_type"),
            coalesce(col("deg"), lit(0L)).as("deg"))
          .persist()
        val grp = Seq("gamma_pct", "label")
        val stats = base.groupBy(grp.map(col): _*)
          .agg(count(lit(1)).as("member_count"),
            countDistinct("p_brand").as("n_brands"))
        val brandAgg = graft.operators.Relational.topNFrequent(
            base.select("gamma_pct", "label", "p_brand"), grp, "p_brand", n = 2)
          .groupBy(grp.map(col): _*)
          .agg(transform(array_sort(collect_list(struct(col("rn"), col("p_brand")))),
            x => x.getField("p_brand")).as("brands"))
          .select(col("gamma_pct"), col("label"),
            array_join(col("brands"), ", ").as("top_brands"),
            element_at(col("brands"), 1).as("brand1"))
        val cont1 = graft.operators.Relational.topNFrequent(
            base.select("gamma_pct", "label", "p_type"), grp, "p_type", n = 1)
          .select(col("gamma_pct"), col("label"), col("p_type").as("cont1"))
        val reps = graft.operators.Relational.topKPerGroup(
            base.select("gamma_pct", "label", "id", "deg"),
            grp, Seq(col("deg").desc, col("id").asc), k = 3)
          .groupBy(grp.map(col): _*)
          .agg(array_join(
            transform(array_sort(collect_list(struct((-col("deg")).as("nd"), col("id")))),
              x => x.getField("id").cast("string")),
            ", ").as("rep_members"))
        val meta = stats
          .join(brandAgg, grp).join(cont1, grp).join(reps, grp)
          .withColumn("level",
            when(col("gamma_pct") === 200, 0).when(col("gamma_pct") === 50, 1)
              .otherwise(2))
        meta.write.format("noop").mode("overwrite").save()
        base.unpersist(blocking = false)
      }
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    }
    spark.stop()
  }
}
