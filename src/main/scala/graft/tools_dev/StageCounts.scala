package graft.tools_dev

import graft.Tables
import graft.dedup.Dedup
import graft.vector.Clustering
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only (round-12 verdict item 3): per-stage ROW COUNTS for the
  * sf10 >25x movers' input-vs-output-bound adjudication — numbers, not
  * prose. Runs the q91/q163/q130 fuzzy-dedup chain and the q143
  * semdedup chain stage by stage on SPARK_GRAFT_SF_DIR and prints one
  * JSON line of counts. The decomposition claim it settles: under
  * ScaleGen replication the INPUT stages (docs, shingle rows, band
  * rows) grow ~linearly with data while the PAIR stages (candidates,
  * verified near-dup edges, intra-cluster cosine evaluations) grow
  * ~quadratically in the replication factor — so a >25x wall ratio per
  * 100x input is the pair OUTPUT growing, not the engine's input-side
  * work regressing.
  *
  * Usage (heap must be set at JVM launch — spark.driver.memory via the
  * builder is a no-op in an already-running JVM): run with
  * `java <add-opens> -Xmx96g -cp "target/scala-2.13/classes:<spark jars>"
  * graft.tools_dev.StageCounts`, SPARK_GRAFT_SF_DIR pointing at the SF.
  */
object StageCounts {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .appName("graft-stage-counts").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.local.dir", "/tmp/graft_spill")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables(spark, sfDir, "documents")
    val toks = Dedup.wordTokens(col("text"))

    // q91/q163/q130 shared chain (shingleN=3, 16 hashes, 4 bands, J>=1/2)
    val nDocs = docs.count()
    val nShingleRows = docs.filter(size(toks) >= 3)
      .select(explode(Dedup.wordShingles(toks, 3)).as("s")).count()
    val bandsDf = Dedup.minhashBands(docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4).persist()
    val nBandRows = bandsDf.count()
    // candidate pairs out of the band equi-join (the first PAIR stage)
    val cand = Dedup.lshCandidates(bandsDf, "doc_id").persist()
    val nCand = cand.count()
    // verified near-dup edges (exact-Jaccard integer cross-multiply)
    val sets = docs.filter(size(toks) >= 3)
      .select(col("doc_id").as("sid"), Dedup.wordShingles(toks, 3).as("sh"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b")))
    val uni = size(col("sh_a")) + size(col("sh_b")) - inter
    val verified = cand
      .join(sets.select(col("sid").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sets.select(col("sid").as("id_b"), col("sh").as("sh_b")), "id_b")
      .filter(inter * 2 >= uni * 1)
      .select("id_a", "id_b").persist()
    val nVerified = verified.count()
    val nDupNodes = verified.select(explode(array(col("id_a"), col("id_b")))
      .as("id")).distinct().count()
    cand.unpersist(blocking = false); bandsDf.unpersist(blocking = false)
    // cluster count + the window work q163 adds on top (rows per cluster)
    val asg = Dedup.fuzzyDedup(spark, docs, "doc_id", "text",
      shingleN = 3, numHashes = 16, bands = 4, jaccNum = 1, jaccDen = 2)
      .persist()
    val nClusters = asg.select("cluster").distinct().count()
    asg.unpersist(blocking = false)

    // q143 semdedup chain (k=8, iters=2, tau=0.35): the pair stage is
    // intra-cluster cosine evaluations = sum_c C(n_c, 2)
    val emb = Tables(spark, sfDir, "embeddings")
    val nEmb = emb.count()
    val km = Clustering.kmeans(emb, "vec_id", "embedding", k = 8, iters = 2)
    val pairEvals = km.groupBy("cluster").agg(count(lit(1)).as("n"))
      .agg(sum((col("n") * (col("n") - 1) / 2).cast("decimal(38,0)")).as("pairs"))
      .head().getAs[java.math.BigDecimal]("pairs").toBigInteger

    // q126/q134's graph: distinct part-supplier bipartite edges. The
    // iterative row-work is (lpaIters + rounds x |gammas|) supersteps x
    // 2|E| — supersteps are FIXED parameters, so row-work is exactly
    // linear in this count.
    val nEdges = Tables(spark, sfDir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey")).distinct().count()

    println(s"""{"sf":"$sfDir","docs":$nDocs,"shingle_rows":$nShingleRows,""" +
      s""""band_rows":$nBandRows,"lsh_candidate_pairs":$nCand,""" +
      s""""verified_neardup_edges":$nVerified,"dup_graph_nodes":$nDupNodes,""" +
      s""""clusters":$nClusters,"embeddings":$nEmb,""" +
      s""""semdedup_intra_cluster_pair_evals":$pairEvals,""" +
      s""""bipartite_edges":$nEdges}""")
    spark.stop()
  }
}
