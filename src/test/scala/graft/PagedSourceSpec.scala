package graft

import org.apache.spark.sql.functions._

class PagedSourceSpec extends SparkSpec {
  import spark.implicits._

  private def paged(rows: Long, pageSize: Int) =
    spark.read.format("graft.sources.PagedSource")
      .option("rows", rows.toString).option("pageSize", pageSize.toString)
      .load()

  test("one input partition per page; full coverage, no dupes") {
    val df = paged(1000, 100)
    assert(df.rdd.getNumPartitions == 10)
    assert(df.count() == 1000)
    assert(df.select("id").distinct().count() == 1000)
    // page boundaries: id div pageSize == page
    assert(df.filter(col("id").divide(100).cast("int") =!= col("page")).count() == 0)
  }

  test("ragged last page") {
    val df = paged(250, 100)
    assert(df.rdd.getNumPartitions == 3)
    assert(df.count() == 250)
    assert(df.groupBy("page").count().orderBy("page")
      .as[(Int, Long)].collect().toSeq == Seq((0, 100L), (1, 100L), (2, 50L)))
  }

  test("composes with the relational layer like any table") {
    val agg = paged(500, 50)
      .groupBy("page").agg(min("id").as("lo"), max("id").as("hi"))
      .orderBy("page").as[(Int, Long, Long)].collect()
    assert(agg.length == 10 && agg.head == ((0, 0L, 49L)))
  }
}
