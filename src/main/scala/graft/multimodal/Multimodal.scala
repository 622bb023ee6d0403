package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded/feature-extracted in partition-batched executor code
  * (the JVM analog of the brief's mapInPandas slot; V1/V4's pluggable
  * inference surface in SURVEY §2.11).
  *
  * The header DECODE is real — [[MediaHeaders.decodeHeader]] parses
  * PNG/JPEG/GIF/WebP dimensions by fixed-offset byte arithmetic, no codec
  * dependency — which is the metadata a curation pipeline filters on
  * (format, resolution) before paying for a full decode. Only the full
  * pixel/sample decode (resize re-encode, frame decode) remains
  * out-of-engine: that genuinely needs codec libraries this container
  * doesn't have, and the Spark-side contract (binary column schema, typed
  * Dataset boundary, mapPartitions batch shape) is identical either way.
  */
object Multimodal {

  final case class BinaryDoc(doc_id: Long, content: Array[Byte])
  final case class MediaMeta(
      doc_id: Long, n_bytes: Int, format: String,
      width: Int, height: Int, first_byte: Int)

  /** Partition-batched metadata extraction: one iterator pass per
    * partition (codec/model init would amortize per partition exactly like
    * a Pandas-UDF batch; chroma_helpers.py:62-81's batch embedder is the
    * reference shape). The per-row decode is the real header parse —
    * total, never throws; unrecognized bytes land as ("unknown", -1, -1)
    * rows rather than poisoning the batch. */
  def extractMeta(docs: Dataset[BinaryDoc]): Dataset[MediaMeta] = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      // per-partition init slot (codec handles, model weights, ...)
      it.map { d =>
        val (fmt, w, h) = MediaHeaders.decodeHeader(d.content)
        MediaMeta(d.doc_id, d.content.length, fmt, w, h,
          if (d.content.isEmpty) -1 else d.content(0) & 0xFF)
      }
    }
  }

  /** Deterministic media synthesis over the documents table: doc_id picks
    * the format (and WebP bitstream variant) and dimensions, the text
    * bytes ride along as the opaque body. The headers are SPEC-VALID
    * ([[MediaHeaders]] synth), so the decode side must do real byte
    * arithmetic to recover (format, width, height) — and the oracle can
    * predict the result purely arithmetically. Dims stay inside every
    * variant's cap (3000 < 2^14-1 for VP8's 14-bit field). */
  def synthMedia(documents: DataFrame): Dataset[BinaryDoc] = {
    import documents.sparkSession.implicits._
    documents
      .select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("content"))
      .as[BinaryDoc]
      .map { d =>
        val w = (1L + d.doc_id % 3000L).toInt
        val h = (1L + (d.doc_id * 7L) % 2000L).toInt
        val bytes = (d.doc_id % 4L).toInt match {
          case 0 => MediaHeaders.synthPng(w, h, d.content)
          case 1 => MediaHeaders.synthJpeg(w, h, d.content)
          case 2 => MediaHeaders.synthGif(w, h, d.content)
          case _ =>
            val variant = (d.doc_id % 3L).toInt match {
              case 0 => "vp8"; case 1 => "vp8l"; case _ => "vp8x"
            }
            MediaHeaders.synthWebp(variant, w, h, d.content)
        }
        BinaryDoc(d.doc_id, bytes)
      }
  }

  final case class Frame(doc_id: Long, frame_index: Int, n_bytes: Int, fp: String)

  /** Frame sampling: split the binary payload into `n` contiguous frames
    * (a video keyframe-sample stand-in; the byte-slicing plumbing and the
    * 1→N typed-flatMap shape are the real contract) with per-frame
    * content fingerprints. */
  def frameSample(docs: Dataset[BinaryDoc], n: Int): Dataset[Frame] = {
    import docs.sparkSession.implicits._
    docs.flatMap { d =>
      val len = d.content.length
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until n).map { i =>
        val start = (i.toLong * len / n).toInt
        val end = ((i + 1).toLong * len / n).toInt
        val slice = java.util.Arrays.copyOfRange(d.content, start, end)
        val fp = md.digest(slice).map("%02x".format(_)).mkString
        md.reset()
        Frame(d.doc_id, i, end - start, fp)
      }
    }
  }

  /** Feature extraction: normalized byte histogram — a genuine (if
    * simple) content feature vector; the stand-in for a learned image
    * embedding with the same schema (`Array[Float]`). */
  def byteHistogram(b: Array[Byte], bins: Int = 16): Array[Float] = {
    val h = new Array[Float](bins)
    if (b.isEmpty) h
    else {
      b.foreach(x => h((x & 0xFF) % bins) += 1f)
      var i = 0
      while (i < bins) { h(i) /= b.length; i += 1 }
      h
    }
  }

  /** STUB resize: pad/truncate to a target byte budget (a real codec
    * would re-encode; the byte-budget contract is what downstream
    * batching depends on). */
  def resizeStub(b: Array[Byte], targetBytes: Int): Array[Byte] =
    if (b.length >= targetBytes) java.util.Arrays.copyOf(b, targetBytes)
    else java.util.Arrays.copyOf(b, targetBytes) // zero-padded

  /** Text corpus → opaque binary column (the ingestion boundary: real
    * pipelines land media bytes + metadata side columns exactly like
    * this). */
  def asBinary(documents: DataFrame): Dataset[BinaryDoc] = {
    import documents.sparkSession.implicits._
    documents
      .select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("content"))
      .as[BinaryDoc]
  }
}
