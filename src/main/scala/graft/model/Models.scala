package graft.model

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.types.StructType

/** Typed record collections (SURVEY §1.1-1.3) — the engine's analog of the
  * reference's msgspec Structs (models.py:16-135 via /root/reference):
  * case classes with `Encoder`-derived schemas, so schema declarations are
  * never duplicated (the reference's "auto-generated Polars schemas",
  * models.py:180-202). `Option[_]` fields are the sparse/omit-defaults
  * semantics: null in parquet, dropped entirely by the sparse JSONL sink.
  */
final case class Document(
    doc_id: Long, text: String, lang: Option[String],
    source: Option[String], n_chars: Option[Long])

final case class ChunkMetadata(
    topic: Option[String], section: Option[String],
    year: Option[Int], tags: Seq[String])

/** Article-chunk shape (models.py:68-98: Article{id, metadata{...}, article}). */
final case class ChunkRecord(
    chunk_id: String, doc_id: Long, chunk_index: Int,
    content: String, metadata: ChunkMetadata)

final case class EmbeddingRecord(vec_id: Long, embedding: Array[Float], label: Int)

/** Community metadata row (detect_communities.py:294-329 output shape). */
final case class CommunityMeta(
    level: Int, community_id: Long, size: Long,
    top_tags: Seq[String], representative_ids: Seq[Long])

object Schemas {
  /** Single source of truth: the Encoder IS the schema. */
  def of[T: Encoder]: StructType = implicitly[Encoder[T]].schema

  implicit val documentEncoder: Encoder[Document] = Encoders.product[Document]
  implicit val chunkEncoder: Encoder[ChunkRecord] = Encoders.product[ChunkRecord]
  implicit val embeddingEncoder: Encoder[EmbeddingRecord] = Encoders.product[EmbeddingRecord]
  implicit val communityEncoder: Encoder[CommunityMeta] = Encoders.product[CommunityMeta]
}
