package graft.vector

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed k-means (Lloyd's algorithm) — the clustering
  * step a curation pipeline runs over document embeddings (semantic
  * dedup buckets, IVF coarse quantizers, topic balance).
  *
  * Distributed float k-means is normally NON-deterministic: centroid
  * means are float sums whose partial-aggregation order changes run to
  * run. This build removes every order dependence, making the algorithm a
  * pure function of its input — reproducible across runs, partitionings,
  * AND engines (it has an exact unrolled SQL oracle):
  *
  *  - coordinates are quantized once to an integer grid (×1e6, round
  *    half-away-from-zero — both engines' round) → all accumulation is
  *    exact integer arithmetic;
  *  - centroid coordinates are the IEEE double quotient of an exact
  *    integer sum by an exact count — one deterministic division each;
  *  - squared distances fold left-to-right over the dimension list
  *    (`aggregate(zip_with(...))` ≡ DuckDB `list_reduce`), bit-identical
  *    in any IEEE engine;
  *  - argmin ties break on centroid id (min of a (dist, cid) struct);
  *  - init = the k lowest-id vectors (training-free, like
  *    [[Similarity.annIvf]]'s quantizer; swap in k-means|| seeds and
  *    nothing else changes).
  *
  * Scale shape: per iteration ONE broadcast of the k centroids, one
  * embarrassingly-parallel assignment scan (k·dim fold per row, no
  * shuffle), and one map-side-combined (cluster, dim) hash agg whose
  * post-shuffle cardinality is k·dim — independent of corpus size. No
  * driver collect; empty clusters drop (the deterministic convention).
  */
object Clustering {

  /** Integer-grid quantization: round(x·scale) as long, exact in any
    * engine (float→double is exact; the product is one IEEE rounding;
    * half-integers are always representable so round can't straddle). */
  def quantize(vec: Column, scale: Double = 1e6): Column =
    transform(vec.cast("array<double>"), x => round(x * scale).cast("long"))

  /** Left-to-right squared-distance fold — order-deterministic. */
  def sqDist(dv: Column, cv: Column): Column =
    aggregate(zip_with(dv, cv, (x, m) => (x - m) * (x - m)), lit(0.0), _ + _)

  /** One assignment pass against an EXPLICIT centroid frame (cid, cv in
    * grid-unit doubles) — the exact rule [[kmeans]]'s passes apply
    * (quantize → sqDist → argmin with low-cid ties), exposed as the
    * shared body for add-time encoding (PQ/IVF index growth): train-time
    * and add-time assignment can then never diverge (round-11 review).
    * `vec` is a Column so subvector slices assign too. Returns
    * (idCol, cluster). */
  def assignTo(emb: DataFrame, idCol: String, vec: Column,
      cent: DataFrame): DataFrame =
    emb.select(col(idCol), quantize(vec).cast("array<double>").as("dv"))
      .crossJoin(broadcast(cent.select(col("cid"), col("cv"))))
      .select(col(idCol), col("cid"), sqDist(col("dv"), col("cv")).as("d2"))
      .groupBy(col(idCol))
      .agg(min(struct(col("d2"), col("cid"))).as("best"))
      .select(col(idCol), col("best.cid").as("cluster"))

  /** `iters` Lloyd iterations (iters−1 centroid updates + a final
    * assignment); returns (idCol, cluster) with cluster = the seed
    * vector's id.
    *
    * `distinctSeeds`: seed from the k lowest-min-id DISTINCT quantized
    * vectors instead of the k lowest-id rows. The default seeding
    * degenerates when the lowest-id rows repeat a vector — the q169
    * residual case is the extreme: IVF cell seeds have all-zero
    * residuals, so every seed coincided and Lloyd collapsed to one
    * effective codeword. Distinct seeding is equally deterministic
    * (min-id per distinct vector, ordered) and oracle-replayable
    * (GROUP BY the quantized list); kept opt-in so the q97/q143/q145
    * oracle chains stay bit-stable. */
  def kmeans(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, distinctSeeds: Boolean = false): DataFrame =
    kmeansWithCentroids(emb, idCol, vecCol, k, iters, distinctSeeds)._1

  /** [[kmeans]] plus the FINAL centroid frame (cid, cv — grid-unit
    * doubles, the exact vectors the last assignment argmin'd against).
    * The centroids are what a serving path needs to PROBE trained cells
    * (rank cells by the same metric the assignment used —
    * [[graft.vector.Similarity.ivfProbeCellsTrained]]); [[kmeans]] alone
    * discards them. Same determinism story: exact-integer means, one
    * IEEE division per coordinate. */
  def kmeansWithCentroids(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, distinctSeeds: Boolean = false): (DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one assignment pass")
    val e = emb
      .select(col(idCol), quantize(col(vecCol)).as("qv"))
      .withColumn("dv", col("qv").cast("array<double>"))
      .persist()
    def assign(cent: DataFrame): DataFrame =
      e.crossJoin(broadcast(cent))
        .select(col(idCol), col("cid"), sqDist(col("dv"), col("cv")).as("d2"))
        .groupBy(col(idCol))
        .agg(min(struct(col("d2"), col("cid"))).as("best"))
        .select(col(idCol), col("best.cid").as("cluster"))
    var cent =
      if (distinctSeeds)
        e.groupBy(col("qv")).agg(min(col(idCol)).as("cid"))
          .orderBy(col("cid")).limit(k)
          .select(col("cid"), col("qv").cast("array<double>").as("cv"))
      else e.orderBy(col(idCol)).limit(k)
        .select(col(idCol).as("cid"), col("dv").as("cv"))
    for (_ <- 1 until iters) {
      cent = assign(cent)
        .join(e, idCol)
        .select(col("cluster").as("cid"), posexplode(col("qv")).as(Seq("d", "q")))
        .groupBy("cid", "d")
        .agg(sum("q").as("s"), count(lit(1)).as("n"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("d").as("d"),
            (col("s").cast("double") / col("n")).as("m")))),
          x => x.getField("m")).as("cv"))
    }
    val out = assign(cent)
    e.unpersist(blocking = false)
    (out, cent.select(col("cid"), col("cv")))
  }
}
