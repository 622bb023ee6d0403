package graft

import graft.operators.{Checks, Relational => R}
import org.apache.spark.sql.functions._

/** Operator-level tests on tiny frames mirroring the reference's LazyFrame
  * fixtures (SURVEY §5.1; e.g. test_ingest_graph_db.py:55-59's
  * 1-release/2-track shape). */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("orderedGroupConcat ranks within group and joins in order (W1+A1)") {
    // album 10: tracks in line order 2,1 — output must re-rank to 1,2
    val tracks = Seq((10L, 2, "B"), (10L, 1, "A"), (20L, 1, "C"))
      .toDF("album_id", "line", "title")
    val out = R.orderedGroupConcat(
      tracks, "album_id", Seq("line"),
      pos => concat(pos, lit(". "), col("title")), "; ")
      .orderBy("album_id").collect()
    assert(out.map(_.getString(1)).toSeq == Seq("1. A; 2. B", "1. C"))
  }

  test("dedupByPriority keeps first per key under the priority order (W2)") {
    // reference: sort by start_date then unique-first per artist_uri, then name
    val df = Seq(
      ("u1", "alice", "2001"), ("u1", "alice", "1999"),
      ("u2", "alice", "2005"), ("u3", "bob", "2000"))
      .toDF("uri", "name", "start")
    val out = R.dedupByPriority(df, Seq("uri", "name"), Seq(col("start").asc, col("uri").asc))
      .orderBy("name").collect()
    // per-uri first: (u1,1999),(u2,2005),(u3,2000); then per-name first:
    // alice → u1/1999, bob → u3/2000
    assert(out.map(r => (r.getString(0), r.getString(2))).toSeq ==
      Seq(("u1", "1999"), ("u3", "2000")))
  }

  test("topKPerGroup selects k best under total order (O4 best-release)") {
    val df = Seq(
      ("rg1", "Official", "2000-01-01"), ("rg1", "Bootleg", "1990-01-01"),
      ("rg1", "Official", "1995-05-05"))
      .toDF("rg", "status", "date")
    val out = R.topKPerGroup(df, Seq("rg"),
      Seq(when(col("status") === "Official", 0).otherwise(1).asc, col("date").asc), 1)
      .collect()
    assert(out.length == 1 && out(0).getString(2) == "1995-05-05")
  }

  test("topNFrequent returns most-frequent values with deterministic ties (A7)") {
    val df = Seq((1, "rock"), (1, "rock"), (1, "pop"), (1, "jazz"), (1, "pop"))
      .toDF("cid", "tag")
    val out = R.topNFrequent(df, Seq("cid"), "tag", 2)
      .orderBy("rn").select("tag").as[String].collect()
    assert(out.toSeq == Seq("pop", "rock")) // both cnt=2; tie-break alphabetical
  }

  test("unionRelaxed reconciles column supersets with nulls (U1)") {
    val a = Seq((1, "x")).toDF("id", "extra")
    val b = Seq(2).toDF("id")
    val out = R.unionRelaxed(a, b).orderBy("id").collect()
    assert(out.length == 2 && out(1).isNullAt(1))
  }

  test("equiUnionJoin matches either key without a cross product (J5)") {
    val l = Seq((1, "k1", "z9"), (2, "k2", "z8")).toDF("lid", "a", "b")
    val r = Seq((10, "k1", "zz"), (20, "kX", "z8")).toDF("rid", "ra", "rb")
    val out = R.equiUnionJoin(l, r, Seq(("a", "ra"), ("b", "rb")))
      .select("lid", "rid").as[(Int, Int)].collect().toSet
    assert(out == Set((1, 10), (2, 20)))
  }

  test("paginate is deterministic offset/limit under total order (O2)") {
    val df = (1 to 10).toDF("n")
    val out = R.paginate(df, Seq(col("n").asc), 3, 4).as[Int].collect()
    assert(out.toSeq == Seq(4, 5, 6, 7))
  }

  test("argmaxPerGroup equals topKPerGroup k=1 under the same total order") {
    val df = Seq(
      (1, 10.0, 100L), (1, 10.0, 50L), (1, 7.0, 10L),
      (2, 3.0, 7L))
      .toDF("g", "score", "id")
    val viaWindow = R.topKPerGroup(df, Seq("g"),
      Seq(col("score").desc, col("id").asc), 1)
      .select("g", "id", "score").orderBy("g")
    val viaArgmax = R.argmaxPerGroup(df, Seq("g"),
      sortKey = Seq(col("score"), -col("id")), payload = Seq("id", "score"))
      .select("g", "id", "score").orderBy("g")
    assert(viaWindow.collect().toSeq == viaArgmax.collect().toSeq)
    // tie on score resolved to smaller id
    assert(viaArgmax.filter(col("g") === 1).select("id").as[Long].collect()(0) == 50L)
  }

  test("asofJoin matches latest at-or-before right row per key") {
    val trades = Seq((1L, 100L, "t1"), (1L, 205L, "t2"), (2L, 50L, "t3"))
      .toDF("k", "t", "trade")
    val quotes = Seq((1L, 100L, 9.0), (1L, 200L, 10.0), (1L, 300L, 11.0), (2L, 60L, 5.0))
      .toDF("k", "t", "px")
    val out = R.asofJoin(trades, quotes, Seq("k"), "t", Seq("px", "t"))
      .select(col("trade"), col("asof_match.px"), col("asof_match.t"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getDouble(1), r.getLong(2))))).toMap
    assert(out("t1").contains((9.0, 100L)))  // equal timestamp matches (at-or-before)
    assert(out("t2").contains((10.0, 200L))) // latest prior, not the later 300
    assert(out("t3").isEmpty)                // no quote at-or-before 50
  }

  test("bucketRangeJoin: point-in-interval across bucket boundaries") {
    val pts = Seq((1L, 10L, "p1"), (1L, 150L, "p2"), (1L, 999L, "p3"), (2L, 10L, "p4"))
      .toDF("k", "t", "pt")
    val ivs = Seq((1L, 0L, 120L, "iv_a"), (1L, 140L, 400L, "iv_b"), (2L, 500L, 600L, "iv_c"))
      .toDF("k", "lo", "hi", "iv")
    val out = R.bucketRangeJoin(pts, ivs, Seq("k"), "t", "lo", "hi", bucketWidth = 100L)
      .select("pt", "iv").as[(String, String)].collect().toMap
    assert(out == Map("p1" -> "iv_a", "p2" -> "iv_b")) // p3/p4 in no interval
    // negative time domain: floor-bucketing (not truncation) keeps matches
    val negPts = Seq((1L, -150L, "n1")).toDF("k", "t", "pt")
    val negIvs = Seq((1L, -200L, -100L, "niv")).toDF("k", "lo", "hi", "iv")
    val negOut = R.bucketRangeJoin(negPts, negIvs, Seq("k"), "t", "lo", "hi", 100L)
      .select("pt", "iv").as[(String, String)].collect().toMap
    assert(negOut == Map("n1" -> "niv"))
  }

  test("dedupByPriority is idempotent (SURVEY §5.2 property)") {
    val df = Seq(
      ("u1", "alice", "2001"), ("u1", "alice", "1999"),
      ("u2", "alice", "2005"), ("u3", "bob", "2000"))
      .toDF("uri", "name", "start")
    val prio = Seq(col("start").asc, col("uri").asc)
    val once = R.dedupByPriority(df, Seq("uri", "name"), prio)
    val twice = R.dedupByPriority(once, Seq("uri", "name"), prio)
    assert(once.orderBy("uri").collect().toSeq == twice.orderBy("uri").collect().toSeq)
  }

  test("unionRelaxed reconciles schemas symmetrically (SURVEY §5.2 property)") {
    val a = Seq((1, "x")).toDF("id", "only_a")
    val b = Seq((2, 9.5)).toDF("id", "only_b")
    val ab = R.unionRelaxed(a, b)
    val ba = R.unionRelaxed(b, a)
    assert(ab.columns.toSet == Set("id", "only_a", "only_b"))
    assert(ab.columns.toSet == ba.columns.toSet)
    assert(ab.count() == 2 && ba.count() == 2)
    // missing-side columns are null, never dropped
    assert(ab.filter(col("id") === 2).select("only_a").collect()(0).isNullAt(0))
  }

  test("aggState merge over ANY split equals the full recompute, exactly") {
    val rnd = new scala.util.Random(17)
    val rows = Seq.fill(300)(
      (s"k${rnd.nextInt(5)}", BigDecimal(rnd.nextInt(20000) - 10000, 2).toDouble))
    val df = rows.toDF("k", "v")
    val direct = R.finishAggState(R.aggState(df, "k", "v"), "k")
      .as[(String, Long, Double, Double, Double)].collect().toSet
    // three different splits, including an empty side
    for (splitAt <- Seq(0, 77, 300)) {
      val (a, b) = rows.splitAt(splitAt)
      val merged = R.finishAggState(
        R.mergeAggStates(
          R.aggState(a.toDF("k", "v"), "k", "v"),
          R.aggState(b.toDF("k", "v"), "k", "v"), "k"), "k")
        .as[(String, Long, Double, Double, Double)].collect().toSet
      assert(merged == direct, s"state merge drifted for split at $splitAt")
    }
  }

  test("saltedSumCount equals direct groupBy and aggregates in two phases") {
    val df = Seq(("a", 1.5), ("a", 2.5), ("b", 10.0), ("a", 0.25))
      .toDF("k", "v")
    val salted = R.saltedSumCount(df, Seq("k"), "v", buckets = 4)
    val direct = df.groupBy("k")
      .agg(sum(col("v").cast("decimal(18,2)")).cast("double").as("sum_value"),
           count(lit(1)).as("n_rows"))
    assert(salted.orderBy("k").collect().toSeq == direct.orderBy("k").collect().toSeq)
    // physical shape: two aggregate pairs (salted partial + final)
    val aggs = "HashAggregate".r.findAllIn(salted.queryExecution.executedPlan.toString).size
    assert(aggs >= 4)
  }

  test("checks: nullCounts / duplicateStats / completeness (A3-A5)") {
    val df = Seq(("a", Some(1)), ("a", Some(1)), ("b", None))
      .toDF("k", "v")
    val nulls = Checks.nullCounts(df, Seq("v")).collect()(0)
    assert(nulls.getLong(1) == 1)
    val dups = Checks.duplicateStats(df).collect()(0)
    assert(dups.getLong(0) == 2 && dups.getLong(1) == 1)
  }

  test("skewReport: exact count-of-counts percentiles, skew factor, ordered top keys") {
    // key counts: a→6, b→2, c→1, d→1 → K=4 keys, 10 rows
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", "d"))
      .zipWithIndex.map { case (k, i) => (k, i) }.toDF("k", "v")
    val r = Checks.skewReport(df, "k", topN = 3).collect()(0)
    assert(r.getLong(0) == 4L && r.getLong(1) == 10L && r.getLong(2) == 6L)
    // sorted counts [1,1,2,6]: p50 = count at cum≥2 → 1; p90 = cum≥3.6→4 → 6;
    // p99 likewise 6
    assert(r.getLong(3) == 1L && r.getLong(4) == 6L && r.getLong(5) == 6L)
    assert(r.getDouble(6) == 2.5)       // mean = 10/4
    assert(r.getDouble(7) == 2.4)       // skew = 6/2.5
    assert(r.getString(8) == "a:6, b:2, c:1")  // count desc, key asc
  }

  test("saltedJoin ≡ plain join, multiplicities preserved") {
    // hot key 1 on the left (5 rows), dup right rows to check multiplicity
    val left = Seq((1L, "a"), (1L, "b"), (1L, "c"), (1L, "d"), (1L, "e"),
      (2L, "f"), (3L, "g")).toDF("k", "lv")
    val right = Seq((1L, "X"), (1L, "Y"), (2L, "Z")).toDF("k", "rv")
    val salted = R.saltedJoin(left, right, "k", salts = 4)
      .select("k", "lv", "rv").as[(Long, String, String)].collect().sorted
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").as[(Long, String, String)].collect().sorted
    assert(salted.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("adaptiveSalts sizes to the measured skew; saltedJoinAuto ≡ plain " +
      "join at every regime (uniform → 1 salt, hot key → spread, clamp)") {
    // 100-row hot key + singletons: target 10 rows/salt → 10 salts;
    // clamp wins when maxSalts < need; uniform data degenerates to 1
    val hot = (1 to 100).map(i => (7L, s"h$i")) ++
      Seq((2L, "x"), (3L, "y"))
    val left = hot.toDF("k", "lv")
    assert(R.adaptiveSalts(left, "k", targetRowsPerSalt = 10) == 10)
    assert(R.adaptiveSalts(left, "k", targetRowsPerSalt = 10, maxSalts = 4) == 4)
    assert(R.adaptiveSalts(left, "k", targetRowsPerSalt = 1000) == 1)
    val uniform = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "lv")
    assert(R.adaptiveSalts(uniform, "k") == 1)
    assert(R.adaptiveSalts(uniform.limit(0), "k") == 1) // empty probe side
    val right = Seq((7L, "X"), (7L, "Y"), (2L, "Z")).toDF("k", "rv")
    val auto = R.saltedJoinAuto(left, right, "k", targetRowsPerSalt = 10)
      .select("k", "lv", "rv").as[(Long, String, String)].collect().sorted
    val plain = left.join(right, "k")
      .select("k", "lv", "rv").as[(Long, String, String)].collect().sorted
    assert(auto.toSeq == plain.toSeq && plain.nonEmpty)
  }

  test("saltedJoinAuto ≡ plain join across three MELT regimes (q181's " +
      "key shape: uniform, moderate, melted)") {
    // the q181 pattern: key % mod == 0 collapses to key 0 — mod controls
    // what fraction of the left side lands on one reducer key
    val rows = (1L to 400L).map(i => (i, i * 3 % 7))
    def melted(mod: Long) = rows.map { case (k, v) =>
      (if (mod > 0 && k % mod == 0) 0L else k, v)
    }.toDF("k", "v")
    val dim = (0L to 400L).map(k => (k, s"d$k")).toDF("k", "dv")
    for (mod <- Seq(0L /* uniform */, 20L /* 5% hot */, 2L /* 50% hot */)) {
      val left = melted(mod)
      val auto = R.saltedJoinAuto(left, dim, "k", targetRowsPerSalt = 25)
        .select("k", "v", "dv").as[(Long, Long, String)].collect().sorted
      val plain = left.join(dim, "k")
        .select("k", "v", "dv").as[(Long, Long, String)].collect().sorted
      assert(auto.toSeq == plain.toSeq && plain.nonEmpty, s"mod=$mod")
    }
    // and the sizing really differs across the regimes
    assert(R.adaptiveSalts(melted(0), "k", targetRowsPerSalt = 25) == 1)
    assert(R.adaptiveSalts(melted(20), "k", targetRowsPerSalt = 25) == 1)
    assert(R.adaptiveSalts(melted(2), "k", targetRowsPerSalt = 25) == 8)
  }

  test("zscore: hand-computed values, constant group nulls out") {
    val df = Seq(("g", 1.0), ("g", 2.0), ("g", 3.0), ("c", 7.0), ("c", 7.0))
      .toDF("grp", "x")
    val out = R.zscore(df, Seq("grp"), "x", "z")
      .select("grp", "x", "z").as[(String, Double, Option[Double])].collect()
    val g = out.filter(_._1 == "g").map(r => r._2 -> r._3.get).toMap
    val std = math.sqrt((1.0 + 4 + 9) / 3 - 4.0) // = sqrt(2/3)
    assert(math.abs(g(3.0) - 1.0 / std) < 1e-12)
    assert(math.abs(g(2.0)) < 1e-12)
    assert(out.filter(_._1 == "c").forall(_._3.isEmpty)) // σ=0 → null
  }

  test("zscore: null values don't bias the group stats (round-10 null audit)") {
    // pre-fix, count(lit(1)) counted the null row while sum skipped it,
    // shrinking μ and σ; a null value must contribute nothing and get z=null
    val df = Seq(("g", Some(1.0)), ("g", Some(2.0)), ("g", Some(3.0)),
      ("g", Option.empty[Double]))
      .toDF("grp", "x")
    val out = R.zscore(df, Seq("grp"), "x", "z")
      .select("x", "z").as[(Option[Double], Option[Double])].collect()
    val std = math.sqrt((1.0 + 4 + 9) / 3 - 4.0) // stats over the 3 values only
    val m = out.collect { case (Some(x), z) => x -> z }.toMap
    assert(math.abs(m(3.0).get - 1.0 / std) < 1e-12)
    assert(math.abs(m(2.0).get) < 1e-12)
    assert(out.collect { case (None, z) => z }.forall(_.isEmpty))
  }

  test("scd2: runs merge, versions chain, open tail, per-key independence") {
    val log = Seq(
      ("A", "x", 1L, 1L), ("A", "x", 2L, 2L), ("A", "y", 3L, 3L),
      ("A", "x", 5L, 4L), ("B", "z", 1L, 5L))
      .toDF("k", "attr", "t", "eid")
      .withColumn("ts", timestamp_seconds(col("t")))
    val out = R.scd2(log, "k", "attr", "ts", "eid")
      .as[(String, Int, String, Long, Option[Long], Long)]
      .collect().sortBy(r => (r._1, r._2))
    val M = 1000000L // micros per second
    assert(out.toSeq == Seq(
      ("A", 1, "x", 1 * M, Some(3 * M), 2L), // two equal rows merged
      ("A", 2, "y", 3 * M, Some(5 * M), 1L),
      ("A", 3, "x", 5 * M, None, 1L),        // re-appearing attr = new version
      ("B", 1, "z", 1 * M, None, 1L)))       // open-ended current version
  }

  test("profileColumns: nulls, distinct (null-excluded), min/max, single row per column") {
    import graft.operators.Checks
    val df = Seq(
      (1L, Some("b")), (2L, Some("a")), (3L, None), (4L, Some("a")))
      .toDF("k", "v")
    val out = Checks.profileColumns(df, Seq("k", "v"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(out.keySet == Set("k", "v"))
    assert(out("k") == ("k", 4L, 0L, 4L, "1", "4"))
    // countDistinct excludes the null; min/max ignore it
    assert(out("v") == ("v", 4L, 1L, 2L, "a", "b"))
  }

  test("ecdfAt: probe-point ratios, monotone, boundary inclusive") {
    import graft.operators.Checks
    val df = Seq(("a", 100L), ("a", 200L), ("a", 300L), ("a", 400L), ("b", 200L))
      .toDF("g", "v")
    val out = Checks.ecdfAt(df, "g", "v", points = Seq(200L, 350L))
      .as[(String, Long, Double, Double)].collect().map(r => r._1 -> r).toMap
    assert(out("a") == ("a", 4L, 0.5, 0.75)) // <= 200 inclusive: 2 of 4
    assert(out("b") == ("b", 1L, 1.0, 1.0))
  }

  test("datasetDiff: added/removed/changed/unchanged; null-safe and alias-proof fingerprints") {
    import graft.operators.{Relational => R}
    def t(rows: Seq[(Long, Option[String], String)]) =
      rows.toDF("k", "a", "b")
    val old_ = t(Seq(
      (1L, Some("x"), "p"),   // unchanged
      (2L, Some("x"), "p"),   // changed: value edit
      (3L, None, "p"),        // changed: NULL -> '' must NOT look equal
      (4L, Some("ab"), "c"),  // changed: boundary shift "ab","c" -> "a","bc"
      (5L, Some("x"), "p"))) // removed
    val new_ = t(Seq(
      (1L, Some("x"), "p"),
      (2L, Some("y"), "p"),
      (3L, Some(""), "p"),
      (4L, Some("a"), "bc"),
      (6L, Some("x"), "p"))) // added
    val out = R.datasetDiff(old_, new_, keyCols = Seq("k"), compareCols = Seq("a", "b"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("unchanged" -> 1L, "changed" -> 3L,
      "removed" -> 1L, "added" -> 1L))
  }

  test("datasetDiff: null keys match null-safely, not added+removed") {
    // round-9 ADVICE: plain key equality never matches null, so an
    // identical null-keyed row double-counted as added + removed
    import graft.operators.{Relational => R}
    def t(rows: Seq[(Option[Long], String)]) = rows.toDF("k", "a")
    val old_ = t(Seq((Some(1L), "x"), (None, "p")))
    val new_ = t(Seq((Some(1L), "x"), (None, "q"))) // null-keyed row edited
    val out = R.datasetDiff(old_, new_, keyCols = Seq("k"), compareCols = Seq("a"))
      .as[(String, Long)].collect().toMap
    assert(out == Map("unchanged" -> 1L, "changed" -> 1L))
  }
}
