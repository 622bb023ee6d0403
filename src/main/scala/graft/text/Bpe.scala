package graft.text

import org.apache.spark.sql.DataFrame

/** Exact byte-pair-encoding tokenizer driven by a CALLER-SUPPLIED
  * merges table — closes the one documented T3 deviation (SURVEY §7.5
  * risk 3): the reference chunks by HF-tokenizer token counts
  * (data_transformation_helpers.py:161-183, settings.py:126-127 via
  * /root/reference), and no JVM tokenizer or model weights exist in a
  * zero-egress build, so the engine previously budgeted by the
  * calibrated proxy ([[Chunker.proxyTokenLen]]). This kernel runs the
  * REAL BPE algorithm; the caller supplies the `(rank, a, b)` merge
  * list of their tokenizer (e.g. parsed from an HF `merges.txt`), so
  * token counts and chunk boundaries are token-exact for that model.
  * Nothing is bundled: with no merges the tokenization degenerates to
  * characters, and the proxy stays the no-model default.
  *
  * Algorithm (the published GPT-2 / HF `tokenizers` BPE, Sennrich
  * 2016): split text into pre-tokens, start each pre-token as a
  * character sequence, then repeatedly find the LOWEST-RANK adjacent
  * pair present and merge ALL its occurrences left-to-right
  * (non-overlapping), until no adjacent pair has a rank.
  *
  * Pre-tokenization contract (shared with the q178 oracle): BPE applies
  * to the lowercased alphanumeric runs `[a-z0-9]+`; other non-space
  * characters count one token each; whitespace separates and counts
  * zero — the same ASCII classes the proxy uses, so proxy and exact
  * modes differ only in the per-word count.
  *
  * Equivalence note (pinned by BpeSpec): for a WELL-FORMED merges table
  * — every merge's components are base characters or results of
  * strictly earlier merges, and all merge results are distinct strings
  * — lowest-rank-first merging is equivalent to one pass applying each
  * rank exhaustively in rank order. (A higher-rank merge can never
  * create a lower-rank adjacency: new adjacencies always involve the
  * freshly merged token, which by distinctness is not a component of
  * any earlier merge.) The q178 DuckDB oracle replays the rank-order
  * pass with nested `replace` calls; the engine runs the true
  * lowest-rank loop — the oracle match is therefore an independent
  * cross-engine proof of the tokenizer, not a shared-code tautology.
  *
  * Scale: the model is driver-resident and tiny relative to data (a
  * 50k-merge GPT-2-sized table is ~1 MB); it rides into tasks via the
  * closure (Spark broadcasts task binaries per stage). Tokenization is
  * embarrassingly parallel per document; per-partition word-level
  * memoisation in [[Bpe.textTokenLen]]'s callers exploits Zipfian
  * repetition (the distinct-word count is far below the token count).
  */
final class BpeModel private (
    val merges: Vector[(String, String)]) extends Serializable {

  /** pair → rank (0 = highest priority, applied first). */
  private val rank: java.util.HashMap[(String, String), Integer] = {
    val m = new java.util.HashMap[(String, String), Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case (p, i) =>
      if (!m.containsKey(p)) m.put(p, i) // first occurrence wins, HF-style
    }
    m
  }

  /** Tokenize ONE pre-token (word) — true lowest-rank-first BPE. */
  def tokenizeWord(w: String): List[String] = {
    if (w.isEmpty) return Nil
    var toks = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { toks.add(String.valueOf(w.charAt(i))); i += 1 }
    while (toks.size > 1) {
      // lowest-rank adjacent pair present
      var bestRank = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var j = 0
      while (j < toks.size - 1) {
        val r = rank.get((toks.get(j), toks.get(j + 1)))
        if (r != null && r < bestRank) {
          bestRank = r; bestA = toks.get(j); bestB = toks.get(j + 1)
        }
        j += 1
      }
      if (bestA == null) {
        val out = List.newBuilder[String]
        var k = 0
        while (k < toks.size) { out += toks.get(k); k += 1 }
        return out.result()
      }
      // merge ALL occurrences of (bestA, bestB), left-to-right,
      // non-overlapping (the GPT-2 new_word loop)
      val merged = bestA + bestB
      val next = new java.util.ArrayList[String](toks.size)
      var k = 0
      while (k < toks.size) {
        if (k < toks.size - 1 && toks.get(k) == bestA && toks.get(k + 1) == bestB) {
          next.add(merged); k += 2
        } else {
          next.add(toks.get(k)); k += 1
        }
      }
      toks = next
    }
    val out = List.newBuilder[String]
    var k = 0
    while (k < toks.size) { out += toks.get(k); k += 1 }
    out.result()
  }

  /** Exact token COUNT of one pre-token, with an optional external memo
    * (callers pass a per-partition map to exploit word repetition). */
  def wordTokenLen(w: String, memo: java.util.HashMap[String, Integer] = null): Int = {
    if (memo == null) return tokenizeWord(w).size
    val c = memo.get(w)
    if (c != null) c.intValue()
    else {
      val n = tokenizeWord(w).size
      memo.put(w, n)
      n
    }
  }

  /** Exact token length of arbitrary text under the pre-tokenization
    * contract: BPE over lowercased `[a-z0-9]+` runs, 1 per other
    * non-space char, 0 for whitespace. Same run/char classes as
    * [[Chunker.proxyTokenLen]] — only the per-word measure changes. */
  def textTokenLen(s: String, memo: java.util.HashMap[String, Integer] = null): Int = {
    var i = 0
    var toks = 0
    val n = s.length
    while (i < n) {
      val c0 = s.charAt(i)
      val c = if (c0 >= 'A' && c0 <= 'Z') (c0 + 32).toChar else c0
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        var j = i + 1
        val sb = new java.lang.StringBuilder(16)
        sb.append(c)
        while (j < n && {
          val d0 = s.charAt(j)
          val d = if (d0 >= 'A' && d0 <= 'Z') (d0 + 32).toChar else d0
          if ((d >= 'a' && d <= 'z') || (d >= '0' && d <= '9')) { sb.append(d); true }
          else false
        }) j += 1
        toks += wordTokenLen(sb.toString, memo)
        i = j
      } else {
        // RE2 \s = [\t\n\f\r ], the q178 oracle's class -- \u000B is a
        // TOKEN, not whitespace (round-14 ADVICE: Java's \s disagrees
        // with the oracle's; the oracle's alphabet wins). And one token
        // per CODEPOINT: an astral char is one oracle match, so a
        // surrogate pair counts once.
        if (!(c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'))
          toks += 1
        i += (if (Character.isHighSurrogate(c0) && i + 1 < n &&
                  Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    toks
  }

  /** A `lenFn` for [[Chunker.recursiveChunksBy]] carrying a fresh memo —
    * build ONE per task/partition, not per document, so the Zipfian
    * cache spans the partition. */
  def lenFnWithMemo(): String => Int = {
    val memo = new java.util.HashMap[String, Integer](1 << 12)
    s => textTokenLen(s, memo)
  }
}

object BpeModel {

  /** Build from an in-memory merge list in rank order (rank 0 first). */
  def apply(merges: Seq[(String, String)]): BpeModel =
    new BpeModel(merges.toVector)

  /** Build from a merges DataFrame with columns (rank, a, b) — the
    * caller's tokenizer model, e.g. an HF merges.txt parsed to a table.
    * MODEL LOAD, not a data collect: merges tables are bounded by the
    * tokenizer vocabulary (≈50k rows / ~1 MB for GPT-2-class models),
    * driver-resident by design like k-means centroids. */
  def fromDataFrame(df: DataFrame): BpeModel = {
    import org.apache.spark.sql.functions.col
    val rows = df.select(
        col("rank").cast("int"), col("a").cast("string"), col("b").cast("string"))
      .orderBy(col("rank"))
      .collect() // bounded model read — see Scaladoc above
    new BpeModel(rows.iterator.map(r => (r.getString(1), r.getString(2))).toVector)
  }
}
