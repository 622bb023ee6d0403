package graft

import graft.functions.{GraftFunctions, TextKernels}
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

  test("custom expressions stay inside whole-stage codegen") {
    GraftFunctions.register(spark)
    Tables(spark, "/root/testdata/sf0.001", "documents").createOrReplaceTempView("docs_ext")
    val df = spark.sql("SELECT rolling_hash(nfkc_normalize(text)) AS h FROM docs_ext")
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan form
    assert(df.queryExecution.executedPlan.toString.contains("*(1) Project [rolling_hash(nfkc_normalize("))
    assert(df.count() > 0)
  }
}
