package graft.tools_dev

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only (round-14 verdict item 3): count DRIVER-BLOCKING work per
  * query — Spark jobs (each submitted job is a driver gate: the calling
  * thread blocks on it before issuing the next) and stages — for the
  * superstep-loop queries the stall investigation fingered as
  * amplifiers. A loop that issues N driver gates multiplies any
  * episodic per-stage latency by N; fewer gates = flatter exposure and
  * less driver round-trip latency at 1000 executors.
  *
  * Usage: SPARK_GRAFT_SF_DIR=[dir] SPARK_GRAFT_ONLY=q147_,q150_
  * java [add-opens] -Xmx48g -cp "target/scala-2.13/classes:[spark jars]"
  * graft.tools_dev.DriverGates
  */
object DriverGates {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q147_,q150_")
      .split(",").toSet
    val spark = SparkSession.builder()
      .appName("graft-driver-gates").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // round-16 AQE-off diagnosis knob (the AqeAb crash bisect)
    if (sys.env.contains("SPARK_AQE_OFF"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val actions = new AtomicLong(0) // root SQL executions = library actions
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, AtomicLong]()
    // BLOCKING gates = SQL executions that actually ran >=1 job, plus
    // RDD-level jobs outside any execution (eager checkpoints). Lazy
    // localCheckpoint registrations create 0-job executions — they are
    // not driver-blocking and are excluded here.
    val execsWithJobs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val rddJobs = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        val eid = Option(j.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
        eid match {
          case Some(id) => execsWithJobs.add(id)
          case None     => rddJobs.incrementAndGet()
        }
      }
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart
              // AQE re-optimizations reuse the root executionId; nested
              // subqueries get their own — count ROOTS only
              if s.rootExecutionId.isEmpty || s.rootExecutionId.contains(s.executionId) =>
            actions.incrementAndGet()
            if (sys.env.contains("SPARK_GRAFT_GATES_VERBOSE"))
              System.err.println(s"ACTION ${s.executionId}: ${s.description}")
          case _ => ()
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        // callsite histogram: which loop/operator owns the gates
        val site = Option(s.stageInfo.details).getOrElse("")
          .linesIterator.find(l => l.contains("graft.") && !l.contains("tools_dev"))
          .getOrElse(s.stageInfo.name.takeWhile(_ != ' '))
        bySite.computeIfAbsent(site.trim, _ => new AtomicLong(0)).incrementAndGet()
      }
    })
    def drain(): Unit = try {
      val busM = spark.sparkContext.getClass.getMethods
        .find(_.getName == "listenerBus").get
      val bus = busM.invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .get.invoke(bus)
    } catch { case _: Throwable => Thread.sleep(300) }
    def clearCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    // phase decomposition for q147 (SPARK_GRAFT_ONLY=phases147): the
    // same ladder sub-operations in isolation — deltas give per-phase
    // gate counts where callsite attribution can't (AQE materializes
    // stages on its own threads, losing the caller's stack)
    import org.apache.spark.sql.functions._
    def coP(s: SparkSession, dir: String) = {
      val li = graft.Tables(s, dir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").cast("long").as("src"), col("b.p").cast("long").as("dst"))
        .distinct()
    }
    val phases147: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = Seq(
      "p1_copurchase" -> ((s, d) => coP(s, d)),
      "p2_lpa_refine" -> ((s, d) => graft.graph.GraphOps.lpaLouvainRefineMulti(
        coP(s, d).localCheckpoint(false), "src", "dst", 2, 1, Seq(200L, 50L, 10L))),
      "p3_full_ladder" -> ((s, d) => graft.graph.GraphOps.lpaLeidenRefineMulti(
        coP(s, d).localCheckpoint(false), "src", "dst", 2, 1, Seq(200L, 50L, 10L))))
    val queries =
      if (only.contains("phases147")) phases147
      else graft.SparkEntry.queries.filter { case (n, _) =>
        only.exists(n.startsWith)
      }.toSeq
    // one warmup of each (JIT/codegen), then the counted pass
    queries.foreach { case (_, fn) =>
      fn(spark, sfDir).count(); clearCaches()
    }
    queries.foreach { case (name, fn) =>
      clearCaches(); System.gc(); drain()
      jobs.set(0); stages.set(0); actions.set(0); bySite.clear()
      execsWithJobs.clear(); rddJobs.set(0)
      val t0 = System.nanoTime()
      val rows = fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      val gates = execsWithJobs.size() + rddJobs.get()
      println(f"""{"query":"$name","gates":$gates,"actions":${actions.get()},"jobs":${jobs.get()},"stages":${stages.get()},"wall_sec":$wall%.2f,"rows":$rows}""")
      import scala.jdk.CollectionConverters._
      bySite.asScala.toSeq.sortBy(-_._2.get()).take(18).foreach { case (s, c) =>
        println(s"  ${c.get()}  $s")
      }
    }
    spark.stop()
  }
}
