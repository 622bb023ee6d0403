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

  /** Left-to-right squared-distance fold — order-deterministic. Native
    * Catalyst expression since r16 (graft.functions.VecSqDist): the same
    * IEEE sequence as the previous `aggregate(zip_with(...))` HOF form
    * (bit-identical, so every k-means oracle still matches) but
    * allocation-free and codegen-capable — the assignment argmin runs k
    * of these per row, and the HOF form built a zipped intermediate
    * array per (row, centroid). */
  def sqDist(dv: Column, cv: Column): Column =
    graft.functions.VectorExpressions.vecSqDist(
      dv.cast("array<double>"), cv.cast("array<double>"))

  /** The k centroids collapsed to ONE (cid, cv)-struct array row, so an
    * assignment pass can argmin PER ROW instead of exploding k rows per
    * vector and shuffling them back through a groupBy (r16 optimization
    * round, guide §2.4: the old crossJoin→groupBy(id) shape paid one
    * corpus-sized exchange per assignment — at 100 TB that is the whole
    * corpus through the network per Lloyd iteration, for an argmin whose
    * k candidates are already local). collect_list order is irrelevant:
    * the fold below totals on (d2, cid), a total order. */
  private def centArray(cent: DataFrame): DataFrame =
    cent.agg(collect_list(struct(col("cid"), col("cv"))).as("cents"))

  /** Per-row argmin over the collected centroid array — bit-identical to
    * the old `groupBy(id).agg(min(struct(d2, cid)))`: same sqDist folds,
    * same (distance, cid) struct ordering, ties still break low-cid. */
  private def argminCid(dv: Column, cents: Column): Column =
    array_min(transform(cents,
      c => struct(sqDist(dv, c.getField("cv")).as("d2"),
        c.getField("cid").as("cid")))).getField("cid")

  /** One assignment pass against an EXPLICIT centroid frame (cid, cv in
    * grid-unit doubles) — the exact rule [[kmeans]]'s passes apply
    * (quantize → sqDist → argmin with low-cid ties), exposed as the
    * shared body for add-time encoding (PQ/IVF index growth): train-time
    * and add-time assignment can then never diverge (round-11 review).
    * `vec` is a Column so subvector slices assign too. Returns
    * (idCol, cluster). Shuffle-free since r16: the centroids ride in as
    * one broadcast array row and the argmin folds per row. */
  def assignTo(emb: DataFrame, idCol: String, vec: Column,
      cent: DataFrame): DataFrame =
    emb.select(col(idCol), quantize(vec).cast("array<double>").as("dv"))
      .crossJoin(broadcast(centArray(cent.select(col("cid"), col("cv")))))
      .select(col(idCol), argminCid(col("dv"), col("cents")).as("cluster"))

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

  /** [[kmeansWithCentroids]] where the returned assignment ALSO carries
    * the quantized vector (`qv`, grid-unit longs) — the final assignment
    * is a single no-shuffle projection since r16, so carrying the row's
    * own vector through it is free, and a consumer that needs
    * (assignment ⋈ vectors) — pqFit's final-codebook update is the one —
    * skips a corpus-sized join. Returns ((idCol, cluster, qv), cent). */
  def kmeansFull(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, distinctSeeds: Boolean = false)
      : (DataFrame, DataFrame) =
    kmeansCore(emb, idCol, vecCol, k, iters, distinctSeeds)

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
    val (asgq, cent) = kmeansCore(emb, idCol, vecCol, k, iters, distinctSeeds)
    (asgq.select(col(idCol), col("cluster")), cent)
  }

  /** The Lloyd loop body. Per-iteration shape since r16 (guide §2.4):
    * ONE embarrassingly-parallel assignment scan (per-row argmin fold
    * over the broadcast centroid array — zero shuffle) feeding the
    * map-side-combined (cluster, dim) hash agg whose post-shuffle
    * cardinality is k·dim. The old shape paid the scaladoc'd ideal plus
    * TWO hidden corpus-sized exchanges per iteration: the assignment's
    * crossJoin→groupBy(id) (k rows per vector shuffled back to 1) and
    * the update's `assign ⋈ e` id-join to re-attach the vectors the
    * assignment had just projected away. Both are gone: the assignment
    * never leaves the row, so `qv` rides along for free.
    *
    * Bit-identical to the old loop: same quantization, same left-to-right
    * sqDist folds, the same (d2, cid) argmin total order (array_min ≡
    * min(struct) — element order in the collected array is irrelevant),
    * and the update sums the same exact longs per (cid, d). Every
    * k-means oracle (q97/q143/q145/q151/q153/q167–q176) pins this. */
  private def kmeansCore(
      emb: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, distinctSeeds: Boolean): (DataFrame, DataFrame) = {
    require(iters >= 1, "need at least one assignment pass")
    val e = emb
      .select(col(idCol), quantize(col(vecCol)).as("qv"))
      .withColumn("dv", col("qv").cast("array<double>"))
    // (id, qv, cluster) in one no-shuffle projection
    def assign(cent: DataFrame): DataFrame =
      e.crossJoin(broadcast(centArray(cent)))
        .select(col(idCol), col("qv"),
          argminCid(col("dv"), col("cents")).as("cluster"))
    var cent =
      if (distinctSeeds)
        e.groupBy(col("qv")).agg(min(col(idCol)).as("cid"))
          .orderBy(col("cid")).limit(k)
          .select(col("cid"), col("qv").cast("array<double>").as("cv"))
      else e.orderBy(col(idCol)).limit(k)
        .select(col(idCol).as("cid"), col("dv").as("cv"))
    for (_ <- 1 until iters) {
      cent = assign(cent)
        .select(col("cluster").as("cid"), posexplode(col("qv")).as(Seq("d", "q")))
        .groupBy("cid", "d")
        .agg(sum("q").as("s"), count(lit(1)).as("n"))
        .groupBy("cid")
        .agg(transform(
          array_sort(collect_list(struct(col("d").as("d"),
            (col("s").cast("double") / col("n")).as("m")))),
          x => x.getField("m")).as("cv"))
    }
    (assign(cent), cent.select(col("cid"), col("cv")))
  }
}
