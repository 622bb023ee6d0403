package graft

import org.apache.spark.sql.functions._

class RagSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct lands within its 2% rsd of exact") {
    val df = (1 to 20000).map(i => i % 3777).toDF("k")
    val row = df.agg(
      countDistinct(col("k")).as("exact"),
      approx_count_distinct(col("k"), rsd = 0.02).as("approx")).collect()(0)
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("upsert via anti-join is idempotent: applying twice adds nothing") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val incoming = Seq((2L, "b2"), (3L, "c")).toDF("id", "v")
    def upsert(ex: org.apache.spark.sql.DataFrame, in: org.apache.spark.sql.DataFrame) =
      ex.unionByName(in.join(ex.select("id"), Seq("id"), "left_anti"))
    val once = upsert(existing, incoming)
    val twice = upsert(once, incoming)
    assert(once.count() == 3)
    assert(twice.count() == 3) // second application is a no-op
    assert(once.filter(col("id") === 2).select("v").as[String].collect()(0) == "b")
  }

  test("rag pipeline query end-to-end on a tiny corpus") {
    val q = SparkEntry.queries("q57_rag_pipeline")
    val out = q(spark, "/root/testdata/sf0.001")
    val rows = out.collect()
    assert(rows.nonEmpty)
    // chunk ids unique, vec ids 32-hex, headers carry the template prefix
    assert(rows.map(_.getString(2)).distinct.length == rows.length)
    assert(rows.forall(_.getString(4).matches("[0-9a-f]{32}")))
    assert(rows.forall(_.getString(3).startsWith("search_document: Topic: ")))
  }

  test("KMV sketch: exact under k, ~6% over k, partition-invariant, duplicate-proof") {
    import graft.functions.KmvSketch
    // 10,000 distinct values, each duplicated 3x — duplicates must not move the estimate
    val vals = (1L to 10000L).flatMap(v => Seq(v, v, v))
    val df = vals.toDF("v").withColumn("g", lit("a"))
    def estimate(parts: Int): Double =
      df.repartition(parts).groupBy("g")
        .agg(KmvSketch.kmvDistinct(col("v"), k = 256).as("e"))
        .as[(String, Double)].collect().head._2
    val e1 = estimate(1)
    // mergeability/determinism: partitioning must not change the result AT ALL
    assert(estimate(13) == e1 && estimate(32) == e1)
    // accuracy: 1/sqrt(k-2) ~ 6.3%; allow 3 sigma
    assert(math.abs(e1 - 10000.0) / 10000.0 < 0.19, s"estimate $e1 off >3sigma")
    // below k the sketch IS the exact distinct count
    val small = (1L to 100L).toDF("v").withColumn("g", lit("a"))
      .groupBy("g").agg(KmvSketch.kmvDistinct(col("v"), k = 256).as("e"))
      .as[(String, Double)].collect().head._2
    assert(small == 100.0)
  }

  test("KMV set algebra: union/Jaccard estimates track planted overlap") {
    import graft.functions.KmvSketch
    val k = 256
    // A = 1..8000, B = 4001..12000 → |A∪B| = 12000, J = 4000/12000 = 1/3
    val df = ((1L to 8000L).map(v => ("A", v)) ++
      (4001L to 12000L).map(v => ("B", v))).toDF("g", "v")
    val g = df.groupBy("g").agg(KmvSketch.kmvArray(col("v"), k).as("hs"))
    val row = g.filter(col("g") === "A").select(col("hs").as("ha"))
      .crossJoin(g.filter(col("g") === "B").select(col("hs").as("hb")))
      .withColumn("m", slice(array_sort(array_union(col("ha"), col("hb"))), 1, k))
      .select(
        KmvSketch.estimateFromArray(col("m"), k).as("eu"),
        (size(array_intersect(array_intersect(col("m"), col("ha")), col("hb")))
          .cast("double") / size(col("m")).cast("double")).as("ej"))
      .as[(Double, Double)].collect().head
    // ~3σ bands: union σ≈1/√254, Jaccard σ≈√(J(1−J)/k)
    assert(math.abs(row._1 - 12000.0) / 12000.0 < 0.19, s"union est ${row._1}")
    assert(math.abs(row._2 - 1.0 / 3.0) < 0.09, s"jaccard est ${row._2}")
  }

  test("KMV excludes nulls like countDistinct (round-9 ADVICE)") {
    import graft.functions.KmvSketch
    // null inputs used to decode as hash 0.0 — the smallest possible
    // value — biasing (k−1)/v_k; they must be skipped entirely
    val vals: Seq[Option[Long]] =
      (1L to 50L).map(Some(_)) ++ Seq.fill(500)(Option.empty[Long])
    val df = vals.toDF("v").withColumn("g", lit("a"))
    val withNulls = df.groupBy("g")
      .agg(KmvSketch.kmvDistinct(col("v"), k = 256).as("e"))
      .as[(String, Double)].collect().head._2
    assert(withNulls == 50.0, s"nulls leaked into the sketch: $withNulls")
    // the array form drops them too (no 0.0 entry, same bottom-k)
    val arr = df.groupBy("g")
      .agg(KmvSketch.kmvArray(col("v"), k = 256).as("hs"))
      .select(col("hs")).as[Seq[Double]].collect().head
    assert(arr.length == 50 && arr.forall(_ > 0.0))
  }
}
