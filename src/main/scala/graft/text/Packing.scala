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
        var fill = 0
        var bin = 0
        it.map { case (g, id, tok) =>
          if (g != curGroup) { curGroup = g; fill = 0; bin = 0 }
          if (fill > 0 && fill + tok > budget) { bin += 1; fill = tok }
          else fill += tok
          PackedDoc(g, id, tok, bin)
        }
      }
  }
}
