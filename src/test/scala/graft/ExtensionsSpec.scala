package graft

import graft.functions.{GraftFunctions, TextKernels}
import org.apache.spark.sql.functions.col
import org.apache.spark.unsafe.types.UTF8String

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("custom expressions register as SQL functions") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT nfkc_normalize('ﬁne ①') AS s").as[String].collect()(0)
    assert(out == "fine 1")
    val h = spark.sql("SELECT rolling_hash('abc') AS h").as[Long].collect()(0)
    assert(h == TextKernels.rollingHash(UTF8String.fromString("abc")))
  }

  test("regex prefilter rule adds a contains guard, preserves results") {
    import graft.plans.RegexPrefilterRule
    val docs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val unopt = docs.filter(col("text").rlike("\\bspark\\b")).count()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RegexPrefilterRule
    try {
      val df = docs.filter(col("text").rlike("\\bspark\\b"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.contains("Contains(text"))
      assert(optimized.contains("RLIKE")) // regex kept — contains is only a prefilter
      assert(df.count() == unopt) // semantics preserved
      // non-word patterns are left alone
      val other = docs.filter(col("text").rlike("spa.k")).queryExecution.optimizedPlan
      assert(!other.toString.contains("Contains(text"))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RegexPrefilterRule)
  }

  test("custom expressions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    Tables(spark, "/root/testdata/sf0.001", "documents").createOrReplaceTempView("docs_ext")
    val df = spark.sql("SELECT rolling_hash(nfkc_normalize(text)) AS h FROM docs_ext")
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan form
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [rolling_hash(nfkc_normalize("))
    assert(df.count() > 0)
  }
}
