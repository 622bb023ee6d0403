package graft.tools_dev

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-14 stall: concurrent driver threads running
  * actions over ONE shared persisted DataFrame, under AQE. Reproduces
  * the lost-wakeup where AdaptiveSparkPlanExec's event-queue take()
  * waits with every pool idle (jstack evidence, PLANS round-14).
  * Args: mode = cache | checkpoint | noaqe | nocache, rounds (default 60).
  * Prints per-round wall; a stall shows as a multi-second round on an
  * otherwise ~100ms loop.
  */
object ConcurrencyProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("cache")
    val rounds = args.drop(1).headOption.map(_.toInt).getOrElse(60)
    val chains = args.drop(2).headOption.map(_.toInt).getOrElse(3)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", mode != "noaqe")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val base = spark.range(0, 200000).select(
      col("id"), (col("id") % 97).as("k"), (col("id") % 13).as("v"))
    val shared = mode match {
      case "checkpoint" => base.localCheckpoint()
      case "nocache"    => base
      case _            => { val d = base.persist(); d.count(); d }
    }
    val t0 = System.nanoTime()
    var worst = 0.0
    for (r <- 1 to rounds) {
      val s = System.nanoTime()
      graft.operators.Concurrent.mapInParallel(0 until chains) { i =>
        // full refineCore round shape per chain: private persisted frames
        // over the shared input, a lazy localCheckpoint materialized by a
        // scalar probe, then release — iterated like the gated loop
        var asg = shared.select(col("id"), (col("id") % 11).as("c"))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 3) {
          val dC = asg.join(shared, "id").groupBy("c").agg(sum("v").as("dc"))
            .persist()
          val k = shared.join(broadcast(dC.select(col("c"), col("dc"))),
              shared("k") % 11 === dC("c"))
            .groupBy("id").agg(max("dc").as("best")).persist()
          val moved = asg.join(k, "id")
            .select(col("id"), (col("c") + col("best") % 2).as("c"))
            .localCheckpoint(eager = false)
          moved.agg(count(lit(1))).head() // the wd2-style materializer
          dC.unpersist(blocking = false)
          k.unpersist(blocking = false)
          asg = moved
        }
        i
      }
      val dt = (System.nanoTime() - s) / 1e9
      worst = math.max(worst, dt)
      if (dt > 3.0) println(f"ROUND $r%3d STALL ${dt}%8.2f s")
    }
    val total = (System.nanoTime() - t0) / 1e9
    println(f"mode=$mode rounds=$rounds total=$total%.1f s worst-round=$worst%.2f s")
    spark.stop()
  }
}
