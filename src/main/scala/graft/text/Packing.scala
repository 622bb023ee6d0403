package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** One packed document: `bin` is the per-group sequence index the doc was
  * packed into. */
final case class PackedDoc(source: String, doc_id: Long, n_tokens: Int, bin: Int)

/** Greedy sequence packing — the pretraining batch-prep step that
  * concatenates documents into fixed-token-budget training sequences
  * (fewer padding tokens than one-doc-per-sequence). Within each group,
  * documents are taken in id order and appended to the current bin while
  * the budget holds; overflow starts a new bin (an oversized single doc
  * gets a bin of its own).
  *
  * Packing is sequential by nature, so the scale unit is the GROUP
  * (source/shard/date): one `repartition(group)` +
  * `sortWithinPartitions` + a single `mapPartitions` pass — no driver
  * collect, no window self-joins, and every group streams through one
  * executor core while groups run in parallel. This is the standard
  * sharded-packing layout at corpus scale; the greedy fold itself is a
  * pure function of the (group, id) order, so results are deterministic
  * and oracle-checkable (q83 replays it as a recursive CTE).
  */
object Packing {

  /** Pure fold state: current bin fill and index. */
  final case class PackState(fill: Int, bin: Int)

  /** One greedy step: overflow (with a non-empty bin) opens a new bin. */
  def step(st: PackState, tok: Int, budget: Int): PackState =
    if (st.fill > 0 && st.fill + tok > budget) PackState(tok, st.bin + 1)
    else PackState(st.fill + tok, st.bin)

  /** Pure kernel: the bin index assigned to each document of one group,
    * in order (property-tested in KernelProps). */
  def packPositions(tokens: Seq[Int], budget: Int): Seq[Int] =
    tokens.scanLeft(PackState(0, 0))(step(_, _, budget)).tail.map(_.bin)

  def packGreedy(
      docs: DataFrame, groupCol: String, idCol: String, tokCol: String,
      budget: Int): Dataset[PackedDoc] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(groupCol).cast("string"), col(idCol).cast("long"),
        col(tokCol).cast("int"))
      .repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(idCol))
      .as[(String, Long, Int)]
      .mapPartitions { it =>
        var curGroup: String = null
        var st = PackState(0, 0)
        it.map { case (g, id, tok) =>
          if (g != curGroup) { curGroup = g; st = PackState(0, 0) }
          st = step(st, tok, budget)
          PackedDoc(g, id, tok, st.bin)
        }
      }
  }
}
