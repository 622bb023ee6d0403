package graft.tools_dev

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageSubmitted, SparkListenerUnpersistRDD}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (round-16): root-cause the AQE-off CHECKPOINT_RDD_BLOCK_ID_
  * NOT_FOUND crash in the ladder (AqeAb finding). Records every RDD id →
  * (name, callsite) from stage submissions and every unpersist event;
  * on crash, prints what the missing block's RDD was and who unpersisted
  * it relative to the failure.
  */
object AqeOffRepro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .appName("graft-aqeoff-repro").master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rddInfo = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    val unpersists = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val stageRdds = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(s: SparkListenerStageSubmitted): Unit = {
        stageRdds.put(s.stageInfo.stageId, s.stageInfo.rddInfos
          .map(r => s"rdd_${r.id}:${r.name}").mkString(" "))
        s.stageInfo.rddInfos.foreach { r =>
          rddInfo.putIfAbsent(r.id,
            s"${r.name} scope=${r.scope.map(_.name).getOrElse("-")} site=${r.callSite}")
        }
      }
      override def onUnpersistRDD(u: SparkListenerUnpersistRDD): Unit =
        unpersists.add(s"unpersist rdd_${u.rddId} @${System.nanoTime()} " +
          s"(${rddInfo.getOrDefault(u.rddId, "?")})")
    })
    val e = {
      val li = graft.Tables(spark, sfDir, "lineitem")
        .filter(col("l_orderkey") % 10 === 0)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      li.as("a").join(li.as("b"),
          col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").cast("long").as("src"), col("b.p").cast("long").as("dst"))
        .distinct()
    }.localCheckpoint(eager = false)
    // step-by-step replication of lpaLeidenRefineMulti's body with cache
    // introspection, to find where `refined`'s cache stops serving
    def cacheState(tag: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val cd = spark.sharedState.cacheManager.lookupCachedData(
        df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]])
      val blocks = cd.map { c =>
        val rdd = c.cachedRepresentation.cacheBuilder.cachedColumnBuffers
        val info = spark.sparkContext.getRDDStorageInfo
          .find(_.id == rdd.id)
        s"bufRdd=${rdd.id} parts=${rdd.getNumPartitions} " +
          s"cachedParts=${info.map(_.numCachedPartitions).getOrElse(-1)}"
      }.getOrElse("")
      println(s"[$tag] cached=${cd.nonEmpty} " +
        cd.map(c => s"storage=${c.cachedRepresentation.cacheBuilder.storageLevel} " +
          s"materialized=${c.cachedRepresentation.cacheBuilder.isCachedColumnBuffersLoaded} ")
          .getOrElse("") + blocks)
    }
    try {
      if (sys.env.contains("SPARK_GRAFT_REPRO_STEPWISE")) {
        import graft.graph.GraphOps
        val gammaPcts = Seq(200L, 50L, 10L)
        val refined = GraphOps.lpaLouvainRefineMulti(
          e, "src", "dst", 2, 1, gammaPcts)
        cacheState("after ladder", refined)
        val n = gammaPcts.size.toLong
        val idxOf = gammaPcts.zipWithIndex.foldLeft(lit(-1L)) {
          case (acc, (g, i)) =>
            when(col("gamma_pct") === g, lit(i.toLong)).otherwise(acc)
        }
        val asgN = refined.select((col("id") * n + idxOf).as("id"), col("label"))
        cacheState("asgN built", refined)
        val gi = broadcast(spark.range(n).toDF("gi"))
        val eN = e.select(col("src").as("s0"), col("dst").as("d0"))
          .crossJoin(gi)
          .select((col("s0") * n + col("gi")).as("src"),
            (col("d0") * n + col("gi")).as("dst"))
        println("asgN optimized plan head: " +
          asgN.queryExecution.optimizedPlan.toString.linesIterator.take(6).mkString(" | "))
        try {
          val split = GraphOps.wellConnectedSplit(eN, "src", "dst", asgN,
            "id", "label")
          println(s"OK split rows=${split.count()}")
        } catch {
          case ex2: Throwable =>
            cacheState("AT CRASH", refined)
            println("intra-planning check: does a fresh asgN-consumer " +
              "still plan through the cache?")
            val probe = asgN.groupBy("label").count()
            println(probe.queryExecution.executedPlan.toString
              .linesIterator.filter(l => l.contains("InMemory") ||
                l.contains("LogicalRDD") || l.contains("Scan ExistingRDD"))
              .take(8).mkString("\n"))
            throw ex2
        }
      } else {
        val out = graft.graph.GraphOps.lpaLeidenRefineMulti(
          e, "src", "dst", lpaIters = 2, rounds = 1, gammaPcts = Seq(200L, 50L, 10L))
        println(s"OK rows=${out.count()}")
      }
    } catch {
      case ex: Throwable =>
        val m = String.valueOf(ex.getMessage)
        println(s"CRASH: ${m.linesIterator.next()}")
        ex.getStackTrace.filter(_.getClassName.startsWith("graft"))
          .foreach(f => println(s"  at $f"))
        val failId = "rdd_(\\d+)".r.findFirstMatchIn(m).map(_.group(1).toInt)
        failId.foreach { id =>
          println(s"failing RDD $id: ${rddInfo.getOrDefault(id, "?")}")
        }
        Thread.sleep(500) // let listener events drain
        import scala.jdk.CollectionConverters._
        val hist = unpersists.asScala.toSeq
        failId.foreach { id =>
          val pos = hist.indexWhere(_.startsWith(s"unpersist rdd_$id "))
          println(s"failing RDD unpersisted at history index $pos of ${hist.length}")
        }
        println("--- unpersist history (ids only) ---")
        println(hist.map(_.split(" ")(1)).mkString(" "))
        // the failing stage's full RDD set — does it contain the cached
        // buffer RDD (cache served) or not (cache bypassed)?
        val failStage = "stage (\\d+)".r.findFirstMatchIn(
          ex.toString + Option(ex.getCause).map(_.toString).getOrElse(""))
          .map(_.group(1).toInt)
        println(s"failing stage: $failStage")
        import scala.jdk.CollectionConverters.ConcurrentMapHasAsScala
        stageRdds.asScala.toSeq.sortBy(_._1).takeRight(4).foreach {
          case (sid, rdds) => println(s"stage $sid: $rdds")
        }
    }
    spark.stop()
  }
}
