package graft.tools_dev

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic planted-blob embedding fixture (round-10 verdict item 3).
  * DEV/TEST fixture — not an engine operator.
  *
  * The q168/q169 capabilities — trained IVF cells, residual PQ coding —
  * exist for CLUSTERED real-world corpora, but the synthetic testdata
  * embeddings are structure-free, so their suite specs could only gate
  * no-collapse (the honest round-10 finding: no measured gain there).
  * This fixture plants the structure those paths are built for: `nBlobs`
  * centers in [-1,1]^dims, each vector = its blob's center + `spread` ·
  * bell-shaped noise.
  *
  * Determinism discipline = Dedup.hashSplit3's: every coordinate is a
  * pure function of a string key through md5 (48 bits → exact double in
  * [-1,1)) — no RNG state, identical across runs, partitionings, JVMs,
  * and engines. Blob membership hashes the id (NOT `id % nBlobs`: the k
  * lowest ids would then cover every blob exactly once and hand the
  * UNtrained lowest-id quantizer a perfect codebook by accident,
  * deciding the trained-vs-untrained comparison in the fixture instead
  * of in the algorithm).
  */
object BlobFixture {

  /** md5-derived uniform in [-1, 1): first 12 hex chars = 48 bits, exact
    * in double; one IEEE divide + shift. */
  private def u(key: Column): Column =
    conv(substring(md5(key), 1, 12), 16, 10).cast("double") /
      140737488355328.0 - 1.0 // 2^47

  /** `n` vectors, `dims` dims, `nBlobs` planted clusters. Returns
    * (vec_id long, blob int, embedding array<float>). Noise is the mean
    * of two independent uniforms (triangular ≈ bell), scaled by
    * `spread`; blob centers are uniform in [-1,1]^dims, so inter-center
    * distance ~ sqrt(2·dims/3) dwarfs intra-blob spread when
    * `spread` ≪ 1. */
  def embeddings(spark: SparkSession, n: Long, dims: Int, nBlobs: Int,
                 spread: Double): DataFrame = {
    val blob = pmod(xxhash64(col("id")), lit(nBlobs)).cast("int")
    spark.range(n)
      .withColumn("blob", blob)
      .select(
        col("id").as("vec_id"), col("blob"),
        transform(sequence(lit(0), lit(dims - 1)), d => {
          val c = u(concat_ws("_", lit("c"), col("blob"), d))
          val n1 = u(concat_ws("_", lit("n1"), col("id"), d))
          val n2 = u(concat_ws("_", lit("n2"), col("id"), d))
          c + lit(spread) * (n1 + n2) / 2.0
        }).cast("array<float>").as("embedding"))
  }
}
