package graft.tools_dev

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only (round-16, r15 verdict item 3): A/B the cost of AQE inside
  * the superstep-loop queries. The round-15 fusion postmortem found the
  * driver's sequential AQE re-optimization loop is the latency bound for
  * gate-heavy loops, and lazy localCheckpoint registrations execute
  * stages under AQE — so how much is AQE actually buying inside
  * fixed-shape aggregation rounds?
  *
  * Protocol: alternating A/B/A/B per query (the box's episodic-latency
  * memory: never trust a non-interleaved comparison), min-of-2 per
  * variant, caches cleared between runs, one uncounted warmup per query.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_ONLY=q147_,q126_,q150_
  * java [add-opens] -Xmx48g -cp "target/scala-2.13/classes:[spark jars]"
  * graft.tools_dev.AqeAb
  */
object AqeAb {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val only = sys.env.getOrElse("SPARK_GRAFT_ONLY", "q147_,q126_,q150_")
      .split(",").toSet
    val spark = SparkSession.builder()
      .appName("graft-aqe-ab").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong(0)
    val stages = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    def clearCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val queries = graft.SparkEntry.queries.filter { case (n, _) =>
      only.exists(n.startsWith)
    }.toSeq.sortBy(_._1)
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        aqe: Boolean): (Double, Long, Long, Long) = {
      clearCaches(); System.gc()
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      jobs.set(0); stages.set(0)
      val t0 = System.nanoTime()
      val rows = try fn(spark, sfDir).count()
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
      val wall = (System.nanoTime() - t0) / 1e9
      (wall, jobs.get(), stages.get(), rows)
    }
    queries.foreach { case (name, fn) =>
      fn(spark, sfDir).count(); clearCaches() // warmup (JIT/codegen)
      // alternating pattern: ON OFF ON OFF; a variant that ERRORS is a
      // result too (q147 under AQE-off: the ladder's unpersist points
      // assume AQE's eager materialization of lazy localCheckpoints)
      val rs = Seq(true, false, true, false).map { a =>
        a -> (try Right(run(fn, a)) catch {
          case e: Throwable => Left(e.getClass.getSimpleName + ": " +
            String.valueOf(e.getMessage).take(120).replace('"', '\''))
        })
      }
      val on = rs.filter(_._1).map(_._2).collect { case Right(v) => v }
      val off = rs.filterNot(_._1).map(_._2).collect { case Right(v) => v }
      val errs = rs.collect { case (a, Left(m)) =>
        s"""{"aqe":$a,"err":"$m"}""" }
      def mn(xs: Seq[(Double, Long, Long, Long)]) = xs.minBy(_._1)
      if (on.nonEmpty && off.nonEmpty) {
        val (wOn, jOn, sOn, rOn) = mn(on)
        val (wOff, jOff, sOff, rOff) = mn(off)
        require(rOn == rOff, s"$name: row drift on=$rOn off=$rOff")
        println(f"""{"query":"$name","aqe_on_sec":$wOn%.2f,"aqe_off_sec":$wOff%.2f,"ratio_off_over_on":${wOff / wOn}%.3f,"jobs_on":$jOn,"jobs_off":$jOff,"stages_on":$sOn,"stages_off":$sOff,"rows":$rOn,"raw_on":[${on.map(t => f"${t._1}%.2f").mkString(",")}],"raw_off":[${off.map(t => f"${t._1}%.2f").mkString(",")}],"errors":[${errs.mkString(",")}]}""")
      } else
        println(s"""{"query":"$name","errors":[${errs.mkString(",")}],"on_ok":${on.length},"off_ok":${off.length}}""")
    }
    spark.stop()
  }
}
