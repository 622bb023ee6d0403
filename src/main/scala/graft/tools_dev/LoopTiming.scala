package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: per-phase wall times for the iterative graph loops at a
  * given SF dir, to localize per-superstep overhead (not part of the
  * driver contract). */
object LoopTiming {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"TIME $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val edges = graft.Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct()
      .select((col("l_partkey") * 2).cast("long").as("src"),
              (col("l_suppkey") * 2 + 1).cast("long").as("dst"))

    t("edge prep + count")(edges.count())

    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist()
    t("und materialize")(und.count())

    // BFS unrolled with timing
    val anchor = edges.agg(min(col("src")).as("id"))
    var visited = anchor.select(col("id")).distinct()
      .withColumn("level", lit(0)).persist()
    t("bfs hop0")(visited.count())
    var frontier = visited.select("id")
    for (h <- 1 to 3) {
      val next = und
        .join(frontier.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visited.select("id"), Seq("id"), "left_anti")
        .withColumn("level", lit(h))
      visited = visited.unionByName(next).persist()
      t(s"bfs hop$h")(visited.count())
      frontier = visited.filter(col("level") === h).select("id")
    }

    // PageRank iterations with timing
    val deg = und.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg")).persist()
    val n = t("pr deg count")(deg.count())
    val scale = 1000000000000L
    val unit = scale / n
    val base = (15L * unit) / 100L
    var pr = deg.select(col("id"), lit(unit).as("pr")).persist()
    t("pr init")(pr.count())
    for (i <- 1 to 3) {
      val share = pr.join(deg, "id")
        .select(col("id").as("src"), expr("pr div deg").as("share"))
      val incoming = und.join(share, "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("s"))
      pr = deg.select(col("id"))
        .join(incoming, Seq("id"), "left")
        .select(col("id"), (lit(base) + expr(s"(85 * coalesce(s, 0L)) div 100")).as("pr"))
        .persist()
      t(s"pr iter$i")(pr.count())
    }
    // Variant A: fused state (id, deg, pr) — one join fewer per iteration
    var st = deg.select(col("id"), col("deg"), lit(unit).as("pr")).persist()
    t("prA init")(st.count())
    for (i <- 1 to 3) {
      val incoming = und
        .join(st.select(col("id").as("src"), expr("pr div deg").as("share")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("s"))
      st = st.select(col("id"), col("deg"))
        .join(incoming, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"(85 * coalesce(s, 0L)) div 100")).as("pr"))
        .persist()
      t(s"prA iter$i")(st.count())
    }

    // Variant B: lazy chain, no per-iteration barrier (exchange reuse
    // dedupes the doubled state subtree), one count at the end
    var stB = deg.select(col("id"), col("deg"), lit(unit).as("pr"))
    for (_ <- 1 to 3) {
      val incoming = und
        .join(stB.select(col("id").as("src"), expr("pr div deg").as("share")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("s"))
      stB = stB.select(col("id"), col("deg"))
        .join(incoming, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"(85 * coalesce(s, 0L)) div 100")).as("pr"))
    }
    t("prB lazy 3 iters")(stB.count())

    // Variant C: lazy-chained BFS, single job
    var visC = anchor.select(col("id")).distinct().withColumn("level", lit(0))
    var frontC = visC.select("id")
    for (h <- 1 to 3) {
      val next = und
        .join(frontC.withColumnRenamed("id", "src"), "src")
        .select(col("dst").as("id")).distinct()
        .join(visC.select("id"), Seq("id"), "left_anti")
        .withColumn("level", lit(h))
      visC = visC.unionByName(next)
      frontC = next.select("id")
    }
    t("bfsC lazy 3 hops")(visC.count())

    // Variant D: linear-lazy PageRank (deg static table → state referenced
    // once per iter, no subtree doubling), 10 iterations in ONE job
    var stD = deg.select(col("id"), col("deg"), lit(unit).as("pr"))
    for (_ <- 1 to 10) {
      val incoming = und
        .join(stD.select(col("id").as("src"), expr("pr div deg").as("share")), "src")
        .groupBy(col("dst").as("id"))
        .agg(sum(col("share")).as("s"))
      stD = deg.select(col("id"), col("deg"))
        .join(incoming, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (lit(base) + expr(s"(85 * coalesce(s, 0L)) div 100")).as("pr"))
    }
    t("prD linear-lazy 10 iters")(stD.count())

    // LPA barriered (current lpaEdges shape), 3 supersteps
    var lab = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id")).persist()
    t("lpa init")(lab.count())
    for (i <- 1 to 3) {
      val msgs = und.join(lab.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
        .groupBy(col("src").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      lab = msgs.groupBy("id")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
        .select(col("id"), (-col("best.nl")).as("label"))
        .persist()
      t(s"lpa iter$i")(lab.count())
    }

    // LPA lazy chain (labels referenced once per superstep → linear plan)
    var labL = und.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    for (_ <- 1 to 3) {
      val msgs = und.join(labL.withColumnRenamed("id", "nbr"), col("dst") === col("nbr"))
        .groupBy(col("src").as("id"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      labL = msgs.groupBy("id")
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("best"))
        .select(col("id"), (-col("best.nl")).as("label"))
    }
    t("lpaL lazy 3 supersteps")(labL.count())

    // BFS variant E: persist per-hop frontier only; seen = lazy union of
    // cached frontiers (broadcast anti-join build)
    var fr = anchor.select(col("id")).distinct().withColumn("level", lit(0)).persist()
    t("bfsE hop0")(fr.count())
    var layers = List(fr)
    for (h <- 1 to 3) {
      val seen = layers.map(_.select("id")).reduce(_ unionByName _)
      fr = und.join(fr.select(col("id").as("src")), "src")
        .select(col("dst").as("id")).distinct()
        .join(seen, Seq("id"), "left_anti")
        .withColumn("level", lit(h))
        .persist()
      t(s"bfsE hop$h")(fr.count())
      layers = layers :+ fr
    }
    t("bfsE final union")(layers.reduce(_ unionByName _).count())
    spark.stop()
  }
}
