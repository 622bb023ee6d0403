package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** K-minimum-values distinct sketch (Bar-Yossef, Jayram, Kumar,
  * Sivakumar & Trevisan 2002, "Counting distinct elements in a data
  * stream"; the mergeable bottom-k form) as a typed Spark Aggregator:
  * keep the k smallest DISTINCT normalized hash values of a column;
  * estimate the distinct count as (k−1)/v_k with v_k the k-th smallest
  * kept hash, or exactly |kept| when fewer than k distinct hashes were
  * seen.
  *
  * Why this exists next to `approx_count_distinct`: the HLL++ buffer
  * Spark exposes is opaque — it can't be re-derived, merged, or
  * checked outside the engine. KMV state is just "the k smallest
  * hashes": DETERMINISTIC (md5-derived, no RNG — the
  * hashSplit3/weightedSample discipline), so the whole sketch has an
  * exact SQL oracle; MERGEABLE by union + re-truncate (associative,
  * commutative, idempotent — partition order can't change the result,
  * asserted under repartition in the spec); and BOUNDED: each partial
  * state is ≤ k doubles regardless of group cardinality, so the
  * pre-shuffle partial aggregation ships k values per (partition,
  * group) instead of the full distinct set — the sketch point at
  * 100 TB, where a per-group `collect_set` would be corpus-sized.
  *
  * Standard error ≈ 1/√(k−2) (~6 % at k = 256).
  *
  * Input is the ALREADY-normalized hash (see [[KmvSketch.hash01]]) so
  * the hashing stays in codegen'd expression space and the aggregator
  * only maintains its bounded sorted array. */
abstract class KmvBase[OUT](k: Int) extends Aggregator[Double, Array[Double], OUT]
    with Serializable {
  require(k >= 2, s"KMV needs k >= 2, got $k")

  def zero: Array[Double] = Array.empty

  /** Insert preserving (sorted, distinct, ≤ k): binary search; skip
    * duplicates; drop the largest when full. O(log k) search +
    * O(k) arraycopy — k is small and constant.
    *
    * NULL guard: [[KmvSketch.hash01]] of a null input yields a null
    * column, which the primitive-Double input encoder decodes as 0.0 —
    * below hash01's (0, 1] range. Admitting it would enter the sketch
    * as the smallest possible hash and bias (k−1)/v_k; instead any
    * a ≤ 0 (or NaN) is SKIPPED, matching countDistinct's and the
    * DuckDB oracle's null-excluding semantics (round-9 ADVICE). */
  def reduce(b: Array[Double], a: Double): Array[Double] = {
    if (!(a > 0.0)) return b // null-decoded 0.0 / NaN — never a real hash
    val pos = java.util.Arrays.binarySearch(b, a)
    if (pos >= 0) b // duplicate hash — a set, not a bag
    else {
      val ins = -pos - 1
      if (b.length < k) {
        val out = new Array[Double](b.length + 1)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = a
        System.arraycopy(b, ins, out, ins + 1, b.length - ins)
        out
      } else if (ins < k) {
        val out = new Array[Double](k)
        System.arraycopy(b, 0, out, 0, ins)
        out(ins) = a
        System.arraycopy(b, ins, out, ins + 1, k - ins - 1)
        out
      } else b // larger than the current k-th minimum — irrelevant
    }
  }

  def merge(b1: Array[Double], b2: Array[Double]): Array[Double] =
    b2.foldLeft(b1)(reduce)

  def bufferEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

class KmvSketch(k: Int) extends KmvBase[Double](k) {
  /** (k−1)/v_k, or the exact distinct count when < k hashes were kept.
    * Both branches are single IEEE ops over hash-derived doubles —
    * bit-equal cross-engine. */
  def finish(r: Array[Double]): Double =
    if (r.length < k) r.length.toDouble else (k - 1).toDouble / r(k - 1)
  def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The sketch ITSELF as the output — the mergeable artifact KMV set
  * algebra composes: union = bottom-k of the (deduped) concatenation,
  * Jaccard ≈ |M ∩ A ∩ B| / |M| with M the union's bottom-k (Beyer
  * et al. 2007's KMV synopses estimator). Downstream algebra stays in
  * codegen'd array expressions — see q158. */
class KmvSketchArray(k: Int) extends KmvBase[Array[Double]](k) {
  def finish(r: Array[Double]): Array[Double] = r
  def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

object KmvSketch {
  /** md5-derived hash normalized to (0, 1]: first 12 hex digits as an
    * exact integer h < 16¹² < 2⁵³, then one IEEE division — the q155
    * float discipline, replayed digit-for-digit in the SQL oracle. */
  def hash01(c: Column): Column =
    (conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long") +
      lit(1L)).cast("double") / lit(281474976710656.0) // 16^12

  /** The sketch as an untyped aggregate column usable in groupBy.agg. */
  def kmvDistinct(c: Column, k: Int): Column =
    udaf(new KmvSketch(k)).apply(hash01(c))

  /** The raw bottom-k hash array per group — the composable form. */
  def kmvArray(c: Column, k: Int): Column =
    udaf(new KmvSketchArray(k)).apply(hash01(c))

  /** Distinct-count estimate from a kept bottom-k array (expression
    * space — usable AFTER sketch algebra like union merges). */
  def estimateFromArray(arr: Column, k: Int): Column =
    when(size(arr) < k, size(arr).cast("double"))
      .otherwise(lit((k - 1).toDouble) / element_at(arr, k))
}
