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
