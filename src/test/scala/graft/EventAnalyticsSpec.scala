package graft

import graft.operators.EventAnalytics
import java.sql.Timestamp

class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("funnelReport: ordered steps, window bound, greedy-earliest semantics") {
    val ev = Seq(
      // user 1 completes A→B→C in order within the window
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 10:05:00")),
      (1L, "C", ts("2024-01-01 10:10:00")),
      // user 2: B BEFORE A — order violated, stops at A
      (2L, "B", ts("2024-01-01 09:00:00")),
      (2L, "A", ts("2024-01-01 10:00:00")),
      // user 3: A then B, but B lands outside the 1h window
      (3L, "A", ts("2024-01-01 10:00:00")),
      (3L, "B", ts("2024-01-01 11:30:00")),
      // user 4 never does A — not in the funnel at all
      (4L, "B", ts("2024-01-01 10:00:00")),
      (4L, "C", ts("2024-01-01 10:05:00")))
      .toDF("user_id", "event_type", "ts")
    val rep = EventAnalytics.funnelReport(ev, "user_id", "event_type", "ts",
        steps = Seq("A", "B", "C"), windowSec = 3600L)
      .orderBy("step").as[(Int, String, Long)].collect()
    assert(rep.toSeq == Seq((1, "A", 3L), (2, "B", 1L), (3, "C", 1L)))
  }

  test("funnelReport: step must be STRICTLY after the previous step") {
    val ev = Seq(
      (1L, "A", ts("2024-01-01 10:00:00")),
      (1L, "B", ts("2024-01-01 10:00:00"))) // simultaneous — does not count
      .toDF("user_id", "event_type", "ts")
    val rep = EventAnalytics.funnelReport(ev, "user_id", "event_type", "ts",
        steps = Seq("A", "B"), windowSec = 3600L)
      .orderBy("step").as[(Int, String, Long)].collect()
    assert(rep.toSeq == Seq((1, "A", 1L), (2, "B", 0L)))
  }

  test("cohortRetention: first-active day cohorts with weekly offsets") {
    val ev = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort Jan 1
      (1L, ts("2024-01-03 10:00:00")), // same week → offset 0 (dedup w/ above)
      (1L, ts("2024-01-09 10:00:00")), // offset 1
      (2L, ts("2024-01-01 23:00:00")), // cohort Jan 1
      (2L, ts("2024-01-20 10:00:00")), // offset 2
      (3L, ts("2024-01-02 00:00:00"))) // cohort Jan 2, week 0 only
      .toDF("user_id", "ts")
    val m = EventAnalytics.cohortRetention(ev, "user_id", "ts")
      .as[(java.sql.Date, Long, Long)].collect()
      .map { case (c, w, n) => (c.toString, w) -> n }.toMap
    assert(m(("2024-01-01", 0L)) == 2L) // users 1 and 2
    assert(m(("2024-01-01", 1L)) == 1L) // user 1
    assert(m(("2024-01-01", 2L)) == 1L) // user 2
    assert(m(("2024-01-02", 0L)) == 1L) // user 3
    assert(m.size == 4)
  }

  test("dailyTypeCounts: trailing 7-day RANGE sum handles calendar gaps") {
    val ev = Seq(
      ("x", ts("2024-01-01 10:00:00")),
      ("x", ts("2024-01-01 11:00:00")),
      ("x", ts("2024-01-05 10:00:00")), // within 7d of Jan 1
      ("x", ts("2024-01-20 10:00:00"))) // far gap — window restarts
      .toDF("event_type", "ts")
    val rows = EventAnalytics.dailyTypeCounts(ev, "event_type", "ts")
      .as[(String, java.sql.Date, Long, Long)].collect()
      .map { case (_, d, n, n7) => d.toString -> ((n, n7)) }.toMap
    assert(rows("2024-01-01") == ((2L, 2L)))
    assert(rows("2024-01-05") == ((1L, 3L))) // Jan 1 counts are in range
    assert(rows("2024-01-20") == ((1L, 1L))) // gap: nothing in the window
  }
}
