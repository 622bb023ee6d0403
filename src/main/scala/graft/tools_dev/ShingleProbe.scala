package graft.tools_dev

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (r17 verdict item 5): split the MinHash band pass's per-doc
  * cost into tokenize vs shingle-string-build vs md5 — the r16 remainder
  * said a codegen'd shingle expression is only worth building if the
  * interpreted transform/slice/array_join HOFs dominate md5 (which is
  * oracle-semantic and not replaceable). Each variant is timed over the
  * same corpus with a noop-style aggregate sink; deltas attribute cost. */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = 3
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables(spark, sfDir, "documents")
    val toks = Dedup.wordTokens(col("text"))
    def time(name: String)(dfB: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        dfB.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SHPROBE $name min=${ts.min}%.2f raw=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // a) tokenizer alone
    time("tokenize")(docs.select(size(toks).as("x")))
    // b) + shingle strings (the transform/slice/array_join HOF chain)
    time("tokenize+shingles")(
      docs.select(col("doc_id"), toks.as("toks"))
        .select(size(Dedup.wordShingles(col("toks"), 3)).as("x")))
    // c) + explode + md5 h1 (the signature pass shape minus the min agg)
    time("tokenize+shingles+md5")(
      docs.select(col("doc_id"), toks.as("toks"))
        .select(col("doc_id"),
          explode(Dedup.wordShingles(col("toks"), 3)).as("s"))
        .select(Dedup.h1(col("s")).as("x")))
    // d) full minhash signature (adds h2odd + 16-perm transform + min agg)
    time("minhashSignature")(
      Dedup.minhashSignature(docs, "doc_id", "text", shingleN = 3, numHashes = 16))
    spark.stop()
  }
}
