package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}

/** One text chunk. `n_chunks` repeats the per-document chunk count so
  * downstream metadata (chunk_index/total_chunks, models.py:90-97) needs no
  * second pass. */
final case class DocChunk(
    doc_id: Long, chunk_index: Int, chunk_id: String, chunk: String, n_chunks: Int)

/** T3 (data_transformation_helpers.py:161-183): overlapping-window text
  * chunker, the reference's RecursiveCharacterTextSplitter re-expressed for
  * the JVM (SURVEY §7.5 risk 3: HF tokenizer lengths aren't reproducible —
  * we chunk on characters / separator cascade with identical window
  * parameters and document the deviation).
  *
  * Two variants:
  *  - `fixed`: fixed char window + overlap. Closed-form chunk boundaries →
  *    SQL-expressible, used by the oracle-checked query.
  *  - `recursive`: separator-cascade splitter (\n\n, \n, ". ", "? ", "! ",
  *    " ", "") that packs whole separators up to `size` chars with
  *    `overlap` carried between chunks — the reference's actual algorithm
  *    shape.
  * Both are 1→N generators: `flatMap` over a typed Dataset.
  */
object Chunker {
  val DefaultSize = 200
  val DefaultOverlap = 50

  def nChunks(len: Int, size: Int, overlap: Int): Int = {
    val stride = size - overlap
    math.max(1, math.ceil((len - overlap).toDouble / stride).toInt)
  }

  /** Pure kernel: fixed char windows [i*stride, i*stride+size). */
  def fixedChunks(text: String, size: Int = DefaultSize, overlap: Int = DefaultOverlap): Seq[String] = {
    val stride = size - overlap
    val n = nChunks(text.length, size, overlap)
    (0 until n).map { i =>
      val start = i * stride
      text.substring(start, math.min(start + size, text.length))
    }
  }

  /** Pure kernel: recursive separator-cascade split, then greedy packing
    * into ≤`size`-char chunks with `overlap` chars carried from the tail of
    * the previous chunk (LangChain RecursiveCharacterTextSplitter
    * semantics, simplified to character lengths). */
  def recursiveChunks(
      text: String,
      size: Int = DefaultSize,
      overlap: Int = DefaultOverlap,
      separators: Seq[String] = Seq("\n\n", "\n", ". ", "? ", "! ", " ", "")): Seq[String] = {

    def split(t: String, seps: Seq[String]): Seq[String] =
      if (t.length <= size) Seq(t)
      else seps match {
        case Nil => Seq(t)
        case "" +: _ => t.grouped(size).toSeq
        case sep +: rest =>
          val parts = t.split(java.util.regex.Pattern.quote(sep), -1)
          if (parts.length == 1) split(t, rest)
          else parts.zipWithIndex.flatMap { case (p, i) =>
            val piece = if (i < parts.length - 1) p + sep else p
            if (piece.length > size) split(piece, rest) else Seq(piece)
          }.filter(_.nonEmpty).toSeq
      }

    val pieces = split(text, separators)
    val chunks = Seq.newBuilder[String]
    val cur = new StringBuilder
    for (p <- pieces) {
      if (cur.nonEmpty && cur.length + p.length > size) {
        val done = cur.toString
        chunks += done.trim
        cur.clear()
        if (overlap > 0 && done.length > overlap)
          cur.append(done.substring(done.length - overlap))
      }
      cur.append(p)
    }
    if (cur.nonEmpty) chunks += cur.toString.trim
    chunks.result().filter(_.nonEmpty)
  }

  /** BPE-proxy token length — the tokenizer-calibrated measure the
    * reference chunks by (HF tokenizer of nomic-embed-text-v1.5,
    * data_transformation_helpers.py:161-183 + settings.py:126-127 via
    * /root/reference; that tokenizer isn't reproducible on the JVM, so
    * this is the documented deterministic proxy, SURVEY §7.5 risk 3):
    *
    *   tokens(s) = Σ_{alnum runs r} ceil(|r| / 6) + #(non-alnum,
    *   non-whitespace chars); whitespace contributes 0.
    *
    * Rationale: subword vocabularies keep common (short) words whole and
    * split long/rare words — English WordPiece/BPE averages ~1.3
    * tokens/word, which ceil(len/6) reproduces on natural word-length
    * distributions (words ≤6 chars → 1, 7–12 → 2, …); punctuation is
    * nearly always its own token. The proxy is regex-replicable
    * ([A-Za-z0-9]+ | [^A-Za-z0-9\s]) in both Spark and DuckDB, so the
    * per-document counts are oracle-checkable cross-engine (q135).
    * Invariant used by the cascade fallback: tokens(s) <= s.length. */
  // ASCII predicates, NOT Character.isLetterOrDigit/isWhitespace: the
  // contract above is the ASCII regex [A-Za-z0-9]+|[^A-Za-z0-9\s], and the
  // q135 DuckDB oracle replays exactly that regex — Unicode-aware classes
  // would tokenize e.g. 'café' differently in the engine vs the oracle.
  @inline private def asciiAlnum(c: Char): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
  // RE2 \s = [\t\n\f\r ] -- the DuckDB oracle's class, NOT Java's
  // (Java \s adds \x0B; round-14 ADVICE: the engine must match the
  // oracle's alphabet, so \u000B counts as a token here, like RE2)
  @inline private[text] def asciiSpace(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\f' || c == '\r'

  def proxyTokenLen(s: String): Int = {
    var i = 0
    var toks = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (asciiAlnum(c)) {
        var j = i + 1
        while (j < n && asciiAlnum(s.charAt(j))) j += 1
        toks += (j - i + 5) / 6
        i = j
      } else {
        if (!asciiSpace(c)) toks += 1
        // one token per CODEPOINT, not per UTF-16 unit: the DuckDB
        // oracle's regexp_extract_all counts an astral char as one
        // match, so a surrogate pair must count once here too
        // (round-14 ADVICE)
        i += (if (Character.isHighSurrogate(c) && i + 1 < n &&
                  Character.isLowSurrogate(s.charAt(i + 1))) 2 else 1)
      }
    }
    toks
  }

  /** Reference RAG window parameters (settings.py:126-127): 2048-token
    * chunks, 512-token overlap. */
  val RagSizeTokens = 2048
  val RagOverlapTokens = 512

  /** Separator-cascade chunker measured by an arbitrary length function
    * (`lenFn = proxyTokenLen` gives the tokenizer-calibrated chunks the
    * reference produces; `lenFn = _.length` degenerates to character
    * budgets). Packing follows LangChain's merge_splits exactly: greedy
    * piece window emitted when the next piece would overflow `size`,
    * then pieces dropped from the FRONT until the carried tail is within
    * `overlap` (and admits the new piece) — overlap is therefore
    * piece-granular, as in the reference. lenFn is treated as additive
    * across piece concatenation (exact for token proxies at whitespace/
    * separator boundaries; the "" fallback splits at `size` chars, safe
    * because tokens(s) <= s.length). */
  def recursiveChunksBy(
      text: String,
      size: Int,
      overlap: Int,
      lenFn: String => Int,
      separators: Seq[String] = Seq("\n\n", "\n", ". ", "? ", "! ", " ", "")): Seq[String] = {

    def split(t: String, seps: Seq[String]): Seq[String] =
      if (lenFn(t) <= size) Seq(t)
      else seps match {
        case Nil => Seq(t)
        case "" +: _ => t.grouped(size).toSeq // tokens(s) <= |s| bounds each group
        case sep +: rest =>
          val parts = t.split(java.util.regex.Pattern.quote(sep), -1)
          if (parts.length == 1) split(t, rest)
          else parts.zipWithIndex.flatMap { case (p, i) =>
            val piece = if (i < parts.length - 1) p + sep else p
            if (lenFn(piece) > size) split(piece, rest) else Seq(piece)
          }.filter(_.nonEmpty).toSeq
      }

    val pieces = split(text, separators)
    val out = Seq.newBuilder[String]
    var window = Vector.empty[(String, Int)]
    var total = 0
    for (p <- pieces) {
      val pl = lenFn(p)
      if (window.nonEmpty && total + pl > size) {
        out += window.iterator.map(_._1).mkString.trim
        while (window.nonEmpty && (total > overlap || total + pl > size)) {
          total -= window.head._2
          window = window.tail
        }
      }
      window = window :+ (p -> pl)
      total += pl
    }
    if (window.nonEmpty) out += window.iterator.map(_._1).mkString.trim
    out.result().filter(_.nonEmpty)
  }

  /** The reference's RAG chunking: separator cascade at 2048/512 tokens
    * measured by the BPE proxy. */
  def tokenChunks(text: String): Seq[String] =
    recursiveChunksBy(text, RagSizeTokens, RagOverlapTokens, proxyTokenLen)

  /** T3 EXACT mode: the same separator-cascade chunker budgeted by a
    * real BPE tokenizer ([[BpeModel]]) instead of the calibrated proxy —
    * token-exact chunk boundaries for whatever merges table the caller
    * supplies (their model's `merges.txt` as data; nothing bundled).
    * The proxy remains the no-model default: `tokenChunks` is unchanged.
    * Same additivity caveat as every lenFn here (exact at separator
    * boundaries, where alnum runs never span pieces; the "" fallback
    * splits at `size` chars, safe because BPE tokens(s) <= |s|). */
  def tokenChunksExact(text: String, model: BpeModel,
      size: Int = RagSizeTokens, overlap: Int = RagOverlapTokens): Seq[String] =
    recursiveChunksBy(text, size, overlap, model.lenFnWithMemo())

  /** Dataset generator for the exact mode — one word-count memo per
    * TASK (not per document), so the Zipfian repetition of natural text
    * amortizes the per-word BPE across the whole partition. */
  def explodeTokensExact(docs: DataFrame, model: BpeModel,
      size: Int = RagSizeTokens, overlap: Int = RagOverlapTokens): Dataset[DocChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { it =>
      val lenFn = model.lenFnWithMemo()
      it.flatMap { case (id, text0) =>
        val cs = recursiveChunksBy(Option(text0).getOrElse(""), size, overlap, lenFn)
        cs.zipWithIndex.map { case (c, i) =>
          DocChunk(id, i, s"${id}_chunk_${i + 1}", c, cs.length)
        }
      }
    }
  }

  /** Dataset generator over documents(doc_id, text) at the reference's
    * token-budget parameters (the production RAG path; `explode` below
    * keeps the char-budget variants the closed-form oracles replay). */
  def explodeTokens(
      docs: DataFrame,
      size: Int = RagSizeTokens,
      overlap: Int = RagOverlapTokens): Dataset[DocChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].flatMap { case (id, text0) =>
      val cs = recursiveChunksBy(Option(text0).getOrElse(""), size, overlap, proxyTokenLen)
      cs.zipWithIndex.map { case (c, i) =>
        DocChunk(id, i, s"${id}_chunk_${i + 1}", c, cs.length)
      }
    }
  }

  /** Dataset generator over documents(doc_id, text). */
  def explode(
      docs: DataFrame,
      size: Int = DefaultSize,
      overlap: Int = DefaultOverlap,
      recursive: Boolean = false): Dataset[DocChunk] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].flatMap { case (id, text0) =>
      val text = Option(text0).getOrElse("")
      val cs =
        if (recursive) recursiveChunks(text, size, overlap)
        else fixedChunks(text, size, overlap)
      cs.zipWithIndex.map { case (c, i) =>
        DocChunk(id, i, s"${id}_chunk_${i + 1}", c, cs.length)
      }
    }
  }
}
