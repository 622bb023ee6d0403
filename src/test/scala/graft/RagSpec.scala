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
}
