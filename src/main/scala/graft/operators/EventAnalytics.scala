package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch event-analytics operators over an event log (user, type, ts) —
  * the product-analytics companions to the streaming layer's
  * sessionization (reference analog: the events micro-batch plane,
  * settings.py:119-121 via /root/reference; funnels/retention are the
  * standard downstream questions a 100 TB event store answers).
  *
  * Determinism: all time arithmetic is exact integer MICROSECONDS
  * (`unix_micros`, the SCD2 convention) or whole DAYS — no float time
  * math — so every aggregate is independent of partial-agg order and
  * DuckDB oracles replay the same integer recurrences.
  */
object EventAnalytics {

  /** Ordered-funnel report: for the step sequence `steps`, count users
    * whose EARLIEST completion reaches each step — step i+1 must occur
    * strictly after the user's step-i completion time and within
    * `windowSec` of the funnel's first step (the classic
    * earliest-completion funnel semantics; greedy-earliest is optimal
    * here, so no per-user backtracking is needed).
    *
    * Returns one row per step: (step, event_type, n_users) — n_users is
    * monotonically non-increasing down the funnel.
    *
    * Scale shape: per step one filtered scan of the event log, one
    * equi-join against the (user-sized) previous-step frame, one
    * hash agg — k steps = k linear passes, never a per-user event-list
    * collect; the report is a union of k scalar aggregates. */
  def funnelReport(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], windowSec: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val wMicros = windowSec * 1000000L
    val ev = events.select(
      col(userCol).as("u"), col(typeCol).as("et"),
      unix_micros(col(tsCol).cast("timestamp")).as("tm"))
    // chain of per-user completion frames: (u, t1, tPrev)
    val first = ev.filter(col("et") === steps.head)
      .groupBy("u").agg(min("tm").as("t1"))
      .withColumn("tp", col("t1"))
    val chain = steps.tail.scanLeft(first) { (prev, step) =>
      ev.filter(col("et") === step)
        .join(prev.select(col("u"), col("t1"), col("tp")), "u")
        .filter(col("tm") > col("tp") && col("tm") <= col("t1") + wMicros)
        .groupBy("u").agg(min("t1").as("t1"), min("tm").as("tp"))
    }
    // Every chain frame but the last is consumed TWICE (step i+1's join
    // and its own count row); uncached, step k's plan re-executed steps
    // 1..k-1's event-log scans — O(k²) passes over the raw log (round-5
    // verdict). Persist the (user-sized, shrinking) frames, materialize
    // the k-row report, then release them — k linear passes total. The
    // report stays persisted (the materializeAndRelease convention): its
    // lineage is gone once the chain caches drop.
    chain.foreach(_.persist())
    val report = chain.zipWithIndex.map { case (f, i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("n_users"))
    }.reduce(_ unionByName _).persist()
    report.count()
    chain.foreach(_.unpersist(blocking = false))
    report
  }

  /** Cohort retention matrix: users are cohorted by FIRST-ACTIVE day;
    * each (cohort_day, week_offset) cell counts distinct users of that
    * cohort active in that week (offset = floor(days-since-cohort / 7);
    * week 0 always contains the full cohort). Day boundaries are UTC
    * calendar dates; offsets are exact integer day arithmetic.
    *
    * Scale shape: one distinct over (user, day) — the only shuffle that
    * sees the raw log — then a user-keyed cohort join and one hash agg
    * over the (user, day)-distinct frame. */
  def cohortRetention(
      events: DataFrame, userCol: String, tsCol: String): DataFrame = {
    val active = events.select(
        col(userCol).as("u"), col(tsCol).cast("timestamp").cast("date").as("d"))
      .distinct()
    val cohort = active.groupBy("u").agg(min("d").as("cohort_day"))
    active.join(cohort, "u")
      .groupBy(col("cohort_day"),
        expr("CAST(datediff(d, cohort_day) div 7 AS BIGINT)").as("week_offset"))
      .agg(countDistinct(col("u")).as("n_active"))
  }

  /** Per-type daily event counts with a trailing 7-day moving sum — the
    * time-series rollup dashboards read (RANGE frame over day numbers,
    * so gaps in the calendar are handled without a calendar scaffold
    * table). */
  def dailyTypeCounts(
      events: DataFrame, typeCol: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = events.select(col(typeCol).as("et"),
        col(tsCol).cast("timestamp").cast("date").as("d"))
      .groupBy("et", "d").agg(count(lit(1)).as("n"))
      .withColumn("dnum", datediff(col("d"), lit("1970-01-01").cast("date")))
    val w = Window.partitionBy("et").orderBy(col("dnum"))
      .rangeBetween(-6, 0)
    daily.select(col("et"), col("d"), col("n"),
      sum(col("n")).over(w).as("n_7d"))
  }
}
