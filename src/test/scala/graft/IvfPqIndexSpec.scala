package graft

import graft.vector.{IvfPqConfig, IvfPqIndex, Similarity}
import org.apache.spark.sql.functions._

/** The ANN façade (round-11 verdict item 4): one recommended path over
  * the proven kernels. The oracle gate pins the façade's four query
  * bodies (q172/q174/q175/q176) bit-green; this spec pins the knobs the
  * queries don't exercise — from-disk multi-probe off the stored coarse
  * table (both metrics), refine on a read-back index via withCorpus,
  * and the residual-mode guards. */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private def emb = spark.read
    .parquet("/root/testdata/sf0.001/embeddings.parquet")

  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.as[(Long, Double)].collect().toSeq

  test("from-disk multi-probe (cos_raw): probes off the stored coarse " +
      "seeds serve bit-equal to the fit-session corpus-derived probes") {
    val e = emb
    val q = e.orderBy("vec_id").limit(1)
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    val inMem = collect(idx.search(q, topK = 10, nProbe = 3))
    idx.write("ivfpq_facade_cosraw_spec")
    idx.release()
    // a session that did not write: probes MUST come off the coarse table
    val s2 = spark.newSession()
    val served = IvfPqIndex.read(s2, "ivfpq_facade_cosraw_spec", "embedding")
    val q2 = s2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .orderBy("vec_id").limit(1)
    assert(collect(served.search(q2, topK = 10, nProbe = 3)) == inMem)
    assert(inMem.nonEmpty)
  }

  test("from-disk multi-probe (l2_grid): a trained index's stored " +
      "centroids rank probe cells exactly like the fit-session frame") {
    val e = emb
    val q = e.orderBy("vec_id").limit(1)
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 4, m = 2, subDims = 32, k = 4, iters = 2, trained = true))
    val inMem = collect(idx.search(q, topK = 10, nProbe = 2))
    idx.write("ivfpq_facade_l2grid_spec")
    idx.release()
    val served = IvfPqIndex.read(spark, "ivfpq_facade_l2grid_spec", "embedding")
    assert(collect(served.search(q, topK = 10, nProbe = 2)) == inMem)
    assert(inMem.nonEmpty)
  }

  test("refine on a read-back index via withCorpus matches the " +
      "fit-session refine funnel") {
    val e = emb
    val q = e.orderBy("vec_id").limit(1)
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    val inMem = collect(idx.search(q, topK = 10, nProbe = 2, refine = Some(20)))
    idx.write("ivfpq_facade_refine_spec")
    idx.release()
    val served = IvfPqIndex.read(spark, "ivfpq_facade_refine_spec", "embedding")
    // refine needs true vectors — absent until attached
    intercept[RuntimeException] {
      served.search(q, topK = 10, nProbe = 2, refine = Some(20))
    }
    val withEmb = served.withCorpus(e)
    assert(collect(withEmb.search(q, topK = 10, nProbe = 2,
      refine = Some(20))) == inMem)
    assert(inMem.nonEmpty)
  }

  test("residual mode: own-cell serving works; multi-probe, refine, and " +
      "write are guarded with actionable errors") {
    val e = emb
    val q = e.orderBy("vec_id").limit(1)
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2,
      trained = true, residual = true))
    val own = collect(idx.search(q, topK = 10))
    assert(own.nonEmpty)
    intercept[IllegalArgumentException] { idx.search(q, 10, nProbe = 2) }
    intercept[IllegalArgumentException] {
      idx.search(q, 10, refine = Some(20))
    }
    intercept[IllegalArgumentException] { idx.write("ivfpq_facade_res_spec") }
    idx.release()
  }

  test("a read-back index persisted WITHOUT a coarse quantizer guards " +
      "nProbe>1 with an actionable error (own-cell still serves)") {
    val e = emb
    val q = e.orderBy("vec_id").limit(1)
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    // direct kernel write with coarse=None — the pre-round-11 layout a
    // user may still have on disk (the façade's write() is always growable)
    Similarity.writePqIndex(idx.model, idx.cells, "vec_id",
      "ivfpq_facade_nocoarse_spec")
    idx.release()
    val served = IvfPqIndex.read(spark, "ivfpq_facade_nocoarse_spec", "embedding")
    assert(collect(served.search(q, topK = 5)).nonEmpty)
    // nCells is unknowable from the tables alone — must refuse, not plan
    // ivfProbeCells with limit(-1); withCorpus can't rescue this either
    val ex = intercept[IllegalArgumentException] {
      served.withCorpus(e).search(q, topK = 5, nProbe = 2)
    }
    assert(ex.getMessage.contains("without a coarse quantizer"))
  }

  test("writePqIndex preflight: a malformed coarse frame is rejected " +
      "BEFORE the existing index tables are dropped") {
    val e = emb
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    idx.write("ivfpq_facade_preflight_spec")
    idx.release()
    val before = collect(
      IvfPqIndex.read(spark, "ivfpq_facade_preflight_spec", "embedding")
        .search(e.orderBy("vec_id").limit(1), topK = 5))
    // direct kernel call with a coarse frame missing the cv column: must
    // throw without touching the tables
    val idx2 = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    intercept[IllegalArgumentException] {
      Similarity.writePqIndex(idx2.model, idx2.cells, "vec_id",
        "ivfpq_facade_preflight_spec",
        coarse = Some((e.select(col("vec_id").as("cell")), "cos_raw")))
    }
    idx2.release()
    val after = collect(
      IvfPqIndex.read(spark, "ivfpq_facade_preflight_spec", "embedding")
        .search(e.orderBy("vec_id").limit(1), topK = 5))
    assert(after == before, "failed preflight destroyed the index")
  }

  test("write: rebuild succeeds over stale warehouse directories the " +
      "catalog does not know (fresh-session rebuild — BandIndex twin)") {
    // round-13 verdict item 4: the PQ index write shares BandIndex's
    // catalog+location idiom, so it needs the same pin — a fresh
    // session's catalog doesn't know a previous session's managed
    // tables (DROP IF EXISTS no-ops) while the stale directories make
    // saveAsTable refuse with LOCATION_ALREADY_EXISTS. Simulated by
    // planting orphan directories at all five table locations.
    val tbl = "ivfpq_stale_spec"
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    for (sfx <- Seq("meta", "cent", "codes", "cells", "coarse")) {
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_$sfx")
      val d = new java.io.File(new java.net.URI(wh).getPath, s"${tbl}_$sfx")
      assert(d.mkdirs() || d.isDirectory)
      java.nio.file.Files.writeString(d.toPath.resolve("junk"), "stale")
    }
    val e = emb
    val idx = IvfPqIndex.fit(e, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    idx.write(tbl) // must not throw LOCATION_ALREADY_EXISTS
    idx.release()
    val served = IvfPqIndex.read(spark, tbl, "embedding")
      .search(e.orderBy("vec_id").limit(1), topK = 5)
    assert(collect(served).nonEmpty)
  }

  test("compact: appended index shrinks to one file per bucket, serves " +
      "bit-equal, and stays appendable") {
    val tbl = "ivfpq_compact_spec"
    import graft.sinks.ManagedTables.dataFileCount
    val e = emb
    val old = e.filter(col("vec_id") % 10 =!= 0)
    val b1 = e.filter(col("vec_id") % 10 === 0 && col("vec_id") % 20 === 0)
    val b2 = e.filter(col("vec_id") % 10 === 0 && col("vec_id") % 20 =!= 0)
    val buckets = 4
    val idx = IvfPqIndex.fit(old, IvfPqConfig("vec_id", "embedding",
      nCells = 8, m = 4, subDims = 16, k = 4, iters = 2))
    idx.write(tbl, buckets = buckets)
    idx.release()
    IvfPqIndex.append(spark, tbl, b1, "embedding")
    IvfPqIndex.append(spark, tbl, b2, "embedding")
    // fragmented: each of the three writes emitted (up to) buckets files
    // PER WRITE TASK — strictly more than the minimal one-per-bucket
    val preCodes = dataFileCount(spark, s"${tbl}_codes")
    val preCells = dataFileCount(spark, s"${tbl}_cells")
    assert(preCodes > buckets && preCells > buckets,
      s"expected fragmentation before compact: codes=$preCodes cells=$preCells")
    val q = b2.orderBy("vec_id").limit(1)
    val before = collect(
      IvfPqIndex.read(spark, tbl, "embedding").search(q, topK = 10))
    IvfPqIndex.compact(spark, tbl)
    assert(dataFileCount(spark, s"${tbl}_codes") == buckets.toLong)
    assert(dataFileCount(spark, s"${tbl}_cells") == buckets.toLong)
    // serving is bit-identical — compaction is a pure physical rewrite
    val after = collect(
      IvfPqIndex.read(spark, tbl, "embedding").search(q, topK = 10))
    assert(after == before && before.nonEmpty)
    // still appendable: meta/cent/coarse untouched, bucket spec preserved
    IvfPqIndex.append(spark, tbl,
      e.filter(col("vec_id") % 10 === 0), "embedding") // idempotent re-add
    val again = collect(
      IvfPqIndex.read(spark, tbl, "embedding").search(q, topK = 10))
    assert(again == before)
  }

  test("compact: resolves in the caller's CURRENT DATABASE, not the " +
      "child session's 'default' (r15 ADVICE)") {
    import graft.sinks.ManagedTables
    val db = "compact_db_spec"
    val tbl = "bucketed_in_nondefault"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.$tbl")
    spark.sql(s"DROP TABLE IF EXISTS $db.${tbl}__compacting")
    // a DECOY of the same name in default: a database-confused compact
    // would read/compact this one (or DROP the real table while the
    // tmp RENAME fails) — the worst-case in the ADVICE finding
    spark.sql(s"DROP TABLE IF EXISTS default.$tbl")
    spark.range(0, 10).selectExpr("id AS k", "CAST(-1 AS BIGINT) AS v")
      .write.bucketBy(2, "k").saveAsTable(s"default.$tbl")
    val prev = spark.catalog.currentDatabase
    try {
      spark.catalog.setCurrentDatabase(db)
      // two appends → fragmented (files > buckets)
      spark.range(0, 50).selectExpr("id AS k", "id % 3 AS v")
        .write.bucketBy(4, "k").sortBy("k").saveAsTable(tbl)
      spark.range(50, 100).selectExpr("id AS k", "id % 3 AS v")
        .write.mode("append").bucketBy(4, "k").sortBy("k").saveAsTable(tbl)
      val content = spark.table(tbl).orderBy("k").collect().toSeq
      val files = ManagedTables.compactBucketedTable(spark, tbl)
      assert(files == 4L, s"expected one file per bucket, got $files")
      assert(spark.table(tbl).orderBy("k").collect().toSeq == content)
      assert(!spark.catalog.tableExists(s"${tbl}__compacting"))
    } finally spark.catalog.setCurrentDatabase(prev)
    // the decoy is untouched — 10 rows, all v = -1
    val decoy = spark.table(s"default.$tbl")
    assert(decoy.count() == 10L &&
      decoy.filter(col("v") =!= -1L).count() == 0L)
    spark.sql(s"DROP TABLE default.$tbl")
    spark.sql(s"DROP TABLE $db.$tbl")
    spark.sql(s"DROP DATABASE $db")
  }

  test("compact: an interrupted swap (serving table gone, __compacting " +
      "present) resumes by completing the rename") {
    import graft.sinks.ManagedTables
    val tbl = "ivfpq_compact_resume_spec"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}__compacting")
    spark.range(0, 100).selectExpr("id AS k", "id % 7 AS v")
      .write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable(tbl)
    val content = spark.table(tbl).orderBy("k").collect().toSeq
    // crash window: compacted data fully written under tmp, serving
    // name already dropped, rename never ran
    spark.table(tbl).write.mode("overwrite").bucketBy(4, "k").sortBy("k")
      .saveAsTable(s"${tbl}__compacting")
    spark.sql(s"DROP TABLE $tbl")
    // resume completes the RENAME only (no re-read, no re-layout): the
    // content must be intact and the tmp name gone
    ManagedTables.compactBucketedTable(spark, tbl)
    assert(spark.table(tbl).orderBy("k").collect().toSeq == content)
    assert(!spark.catalog.tableExists(s"${tbl}__compacting"))
  }

  test("read: empty meta table (interrupted build) fails with a named " +
      "error, not a bare NoSuchElementException") {
    val tbl = "ivfpq_emptymeta_spec"
    // interrupted-build residue: every table present, meta rowless (the
    // readers refresh the sibling tables before the meta read, so they
    // must exist for the guard itself to be reachable)
    for (sfx <- Seq("meta", "cent", "codes", "cells", "coarse")) {
      spark.sql(s"DROP TABLE IF EXISTS ${tbl}_$sfx")
      spark.range(0).selectExpr("'x' AS placeholder")
        .write.mode("overwrite").saveAsTable(s"${tbl}_$sfx")
    }
    spark.sql(s"DROP TABLE IF EXISTS ${tbl}_meta")
    spark.range(0)
      .selectExpr("CAST(0 AS INT) AS m", "CAST(0 AS INT) AS sub_dims",
        "'x' AS id_col", "'none' AS coarse_metric", "CAST(0 AS INT) AS buckets")
      .write.mode("overwrite").saveAsTable(s"${tbl}_meta")
    val e1 = intercept[IllegalStateException] {
      IvfPqIndex.read(spark, tbl, "embedding")
    }
    assert(e1.getMessage.contains("interrupted"))
    val e2 = intercept[IllegalStateException] {
      Similarity.appendPqIndex(spark, tbl,
        emb.limit(1), "embedding")
    }
    assert(e2.getMessage.contains("interrupted"))
  }
}
