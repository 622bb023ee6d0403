package graft

import java.nio.file.Files

import graft.model._
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §1.1-1.3: typed Dataset boundary — encoder-derived schemas, parquet
  * interop, and sparse nested-struct JSONL roundtrip (the Article shape). */
class ModelSpec extends SparkSpec {
  import Schemas._
  import spark.implicits._

  test("encoder-derived schema is the single declaration (no drift)") {
    val s = Schemas.of[Document]
    assert(s.fieldNames.toSeq == Seq("doc_id", "text", "lang", "source", "n_chars"))
    assert(s("doc_id").dataType == LongType && !s("doc_id").nullable)
    assert(s("lang").dataType == StringType && s("lang").nullable) // Option → nullable
  }

  test("documents.parquet reads as Dataset[Document]") {
    val ds = Tables(spark, "/root/testdata/sf0.001", "documents").as[Document]
    val d = ds.head()
    assert(d.text.nonEmpty && d.n_chars.exists(_ > 0))
    assert(ds.filter(_.lang.isDefined).count() > 0)
  }

  test("nested sparse struct roundtrips through JSONL (Article shape)") {
    val recs = Seq(
      ChunkRecord("d1_chunk_1", 1L, 0, "content one",
        ChunkMetadata(Some("music"), Some("Introduction"), Some(1988), Seq("a", "b"))),
      ChunkRecord("d2_chunk_1", 2L, 0, "content two",
        ChunkMetadata(None, None, None, Seq.empty)))
    val path = Files.createTempDirectory("graft_model").toString + "/chunks"
    Sinks.writeSparseJsonl(recs.toDS().toDF(), path)
    // sparse on disk: the all-None metadata keeps no null keys
    val raw = spark.read.text(path).as[String].collect()
    assert(raw.exists(l => l.contains("d2_chunk_1") && !l.contains("topic")))
    // explicit-schema read restores the full nested shape
    val back = Sinks.readJsonl(spark, path, Schemas.of[ChunkRecord]).as[ChunkRecord]
      .collect().sortBy(_.chunk_id)
    assert(back.length == 2)
    assert(back(0).metadata.year.contains(1988))
    assert(back(1).metadata.topic.isEmpty && back(1).metadata.tags.isEmpty)
  }
}
