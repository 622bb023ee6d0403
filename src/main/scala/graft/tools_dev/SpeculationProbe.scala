package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (round-16, r15 verdict item 6): validate README's per-family
  * speculation prescription EMPIRICALLY on the superstep family. The
  * table was written from one jstack incident; this probe proves the two
  * claims it makes for superstep blocks:
  *
  *   1. duplicate attempts are IDEMPOTENT — the ladder's output hash is
  *      bit-identical with and without speculation (and with/without the
  *      injected straggler);
  *   2. under an injected straggler (one task of the edge-materialization
  *      stage sleeps on ATTEMPT 0 only — a speculative copy is attempt 1
  *      and skips the sleep), speculation recovers most of the injected
  *      wall.
  *
  * spark.speculation is a SCHEDULER conf (read at context start), so the
  * A/B needs two JVMs: run once with SPARK_GRAFT_SPECULATION=1 and once
  * without, same SPARK_GRAFT_SLOW_TASK_SEC.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_SPECULATION=0|1
  * SPARK_GRAFT_SLOW_TASK_SEC=20
  * java [add-opens] -Xmx48g -cp "target/scala-2.13/classes:[spark jars]"
  * graft.tools_dev.SpeculationProbe
  */
object SpeculationProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spec = sys.env.get("SPARK_GRAFT_SPECULATION").contains("1")
    val slowSec = sys.env.getOrElse("SPARK_GRAFT_SLOW_TASK_SEC", "20").toInt
    val spark = SparkSession.builder()
      .appName("graft-speculation-probe").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.maxPlanStringLength", "1048576")
      // README's loop-family prescription under test
      .config("spark.speculation", spec.toString)
      .config("spark.speculation.multiplier", "3")
      .config("spark.speculation.quantile", "0.9")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // q147's co-purchase edge shape (DriverGates.phases147's coP)
    val li = graft.Tables(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 10 === 0)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e0 = li.as("a").join(li.as("b"),
        col("a.o") === col("b.o") && col("a.p") < col("b.p"))
      .select(col("a.p").cast("long").as("src"), col("b.p").cast("long").as("dst"))
      .distinct()
    // the straggler: ONE partition of the edge stage sleeps on its FIRST
    // attempt only — exactly the episodic single-task stall from the
    // jstack incident. A speculative re-run (attemptNumber 1) is fast,
    // so "speculation helps" shows up as recovered wall.
    val slowed = e0.as[(Long, Long)].mapPartitions { it =>
      val tc = org.apache.spark.TaskContext.get()
      if (tc != null && slowSec > 0 && tc.partitionId() == 3 &&
          tc.attemptNumber() == 0)
        Thread.sleep(slowSec * 1000L)
      it
    }.toDF("src", "dst").localCheckpoint(eager = false)

    val t0 = System.nanoTime()
    val out = graft.graph.GraphOps.lpaLeidenRefineMulti(
      slowed, "src", "dst", lpaIters = 2, rounds = 1,
      gammaPcts = Seq(200L, 50L, 10L))
    // deterministic content hash: per-row xxhash64 summed exactly
    val row = out.agg(
      count(lit(1)).as("n"),
      sum(xxhash64(col("gamma_pct"), col("id"), col("label"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0))).as("h"))
      .head()
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"speculation":$spec,"slow_task_sec":$slowSec,"wall_sec":$wall%.2f,"rows":${row.getLong(0)},"hash":"${row.getDecimal(1)}"}""")
    spark.stop()
  }
}
