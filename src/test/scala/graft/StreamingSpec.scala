package graft

import java.sql.Timestamp

import graft.streaming.EventStreams
import graft.streaming.EventStreams.SessionEvent
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming ≡ batch equivalence: the streaming plans must produce exactly
  * the batch results once all data is processed (the correctness bar for
  * the §2.1 "streams" surface). */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private lazy val eventRows = Seq(
    (1L, ts(0), 7L, "click", 1.5),
    (2L, ts(1), 7L, "click", 2.5),
    (3L, ts(30), 7L, "view", 1.0),
    (4L, ts(59, 59), 8L, "click", 4.0),
    (5L, ts(10), 8L, "view", 0.5))

  private def eventsDF =
    eventRows.toDF("event_id", "ts", "user_id", "event_type", "value")

  test("streaming tumbling agg equals batch tumbling agg") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val sdf = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.streamingTumbling(sdf, "1 hour")
      .writeStream.format("memory").queryName("tumbling_out")
      .outputMode("complete").start()
    try {
      mem.addData(eventRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect().toSeq
      val batch = EventStreams.tumblingAgg(eventsDF, "1 hour")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed == batch)
      assert(batch.map(_.getLong(2)).sum == 5)
    } finally q.stop()
  }

  test("streaming sessionization equals batch gaps-and-islands") {
    // 5-min gap: user 7 → sessions {min 0,1}, {min 30}; user 8 → {10}, {59:59}
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[SessionEvent]
    val q = EventStreams.sessionizeStream(mem.toDS(), gapSec = 300)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    try {
      val evs = eventRows.map { case (id, t, u, _, _) =>
        SessionEvent(u, id, t.getTime * 1000L)
      }
      mem.addData(evs: _*)
      q.processAllAvailable()
      // closed sessions emitted so far + open state = batch result
      val closed = spark.table("sess_out")
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      val batchAll = EventStreams.sessionizeBatch(eventsDF, 300)
        .select("user_id", "session_id", "n_events", "start_us", "end_us")
        .as[(Long, Long, Long, Long, Long)].collect().toSet
      // every closed streaming session must be a batch session verbatim
      assert(closed.subsetOf(batchAll))
      // user 7's first session (2 events) must have closed
      assert(closed.exists { case (u, _, n, _, _) => u == 7L && n == 2L })
      // batch finds 4 sessions total
      assert(batchAll.size == 4)
    } finally q.stop()
  }

  test("stream-stream interval join equals batch interval join") {
    implicit val sc = spark.sqlContext
    // left = clicks, right = views; pair views within 15 min after a click
    val clicks = eventRows.filter(_._4 == "click")
    val views = eventRows.filter(_._4 == "view")
    val memL = MemoryStream[(Long, Timestamp, Long, String, Double)]
    val memR = MemoryStream[(Long, Timestamp, Long, String, Double)]
    def named(df: org.apache.spark.sql.DataFrame) =
      df.toDF("event_id", "ts", "user_id", "event_type", "value")
        .withWatermark("ts", "1 hour")
    val joined = EventStreams.intervalJoin(
      named(memL.toDF()), named(memR.toDF()), maxDelaySec = 900)
    val q = joined.writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      memL.addData(clicks: _*)
      memR.addData(views: _*)
      q.processAllAvailable()
      val streamed = spark.table("ij_out")
        .orderBy("l_id", "r_id").collect().toSeq
      def batchSide(rows: Seq[(Long, Timestamp, Long, String, Double)]) =
        rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      val batch = EventStreams.intervalJoin(
          batchSide(clicks), batchSide(views), maxDelaySec = 900)
        .orderBy("l_id", "r_id").collect().toSeq
      assert(streamed == batch)
      // user 8: view at 10:10 is within 15 min of nothing (click at 10:59:59
      // precedes no view); user 7: view at 10:30 is > 15 min after both
      // clicks → only pairs inside the window survive
      val pairs = batch.map(r => (r.getLong(1), r.getLong(2)))
      assert(pairs.forall { case (l, r) => l != r })
      val expected = for {
        (lid, lts, lu, _, _) <- clicks
        (rid, rts, ru, _, _) <- views
        if lu == ru && rts.getTime >= lts.getTime &&
          rts.getTime <= lts.getTime + 900 * 1000L
      } yield (lid, rid)
      assert(pairs.toSet == expected.toSet)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment join") {
    implicit val sc = spark.sqlContext
    val dim = broadcast(Seq((0L, "alpha"), (1L, "beta")).toDF("bucket", "segment"))
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val q = mem.toDF().toDF("event_id", "ts", "user_id")
      .withColumn("bucket", col("user_id") % 2)
      .join(dim, "bucket") // static side broadcasts; no stream-side shuffle
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 10L), (2L, ts(1), 11L))
      q.processAllAvailable()
      val out = spark.table("enrich_out")
        .select("event_id", "segment").as[(Long, String)].collect().toMap
      assert(out == Map(1L -> "alpha", 2L -> "beta"))
    } finally q.stop()
  }

  test("streaming parquet sink with checkpoint: files land, read back complete") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val q = mem.toDF().toDF("event_id", "ts", "value")
      .writeStream.format("parquet")
      .option("path", s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0), 1.0), (2L, ts(1), 2.0))
      q.processAllAvailable()
      mem.addData((3L, ts(2), 3.0))
      q.processAllAvailable()
      val back = spark.read.parquet(s"$dir/out")
      assert(back.count() == 3)
      assert(back.select(sum("value")).as[Double].collect()(0) == 6.0)
    } finally q.stop()
  }

  test("foreachBatch micro-batch upsert: idempotent sink across batches (V3)") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString + "/tbl"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("id", "v")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // anti-join upsert into the parquet "collection" (the streaming
        // twin of q54; ingest_vector_db.py's batched idempotent upserts)
        val dedupedBatch = batch.dropDuplicates("id")
        val existing =
          try spark.read.parquet(dir)
          catch { case _: Throwable => spark.emptyDataFrame }
        val toAdd =
          if (existing.isEmpty) dedupedBatch
          else dedupedBatch.join(existing.select("id"), Seq("id"), "left_anti")
        toAdd.write.mode("append").parquet(dir)
      }
      .start()
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((2L, "b_dup"), (3L, "c")) // 2 must not double-insert
      q.processAllAvailable()
      val back = spark.read.parquet(dir)
      assert(back.count() == 3)
      assert(back.filter(col("id") === 2).select("v").as[String].collect().toSeq == Seq("b"))
    } finally q.stop()
  }

  test("streaming graph maintenance: incrementalCC folded per micro-batch equals batch CC") {
    // The maintenance story end-to-end: edge micro-batches arrive on a
    // stream; each foreachBatch folds the batch into the running CC
    // labeling via incrementalCC (batch-bounded work). The final state
    // must be bit-identical to one full CC over every edge ever seen —
    // across merges that SPAN batches (1-2 and 3-4 merge only when 2-3
    // arrives in a later batch).
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    var labels = spark.emptyDataFrame
    val q = mem.toDS().toDF("src", "dst")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val b = batch.persist()
        labels =
          if (labels.isEmpty) graft.graph.GraphOps.ccEdges(b, "src", "dst")
          else graft.graph.GraphOps.incrementalCC(labels, b, "src", "dst")
        // pin the state: the next fold scans it after this batch's
        // caches are gone
        labels = labels.localCheckpoint()
        b.unpersist()
        ()
      }
      .start()
    val all = Seq(
      Seq((1L, 2L), (3L, 4L), (10L, 11L)),
      Seq((2L, 3L), (20L, 21L)), // merges {1,2} with {3,4}
      Seq((11L, 20L), (30L, 31L))) // merges {10,11} with {20,21}
    // round-10 verdict item 6 (streamed q138 equality): the maintained
    // labeling must bit-equal a full ccEdges over every edge seen so far
    // AFTER EVERY micro-batch — the community-maintenance loop's
    // invariant (detect-communities re-runs as the graph grows), not
    // just its final state.
    try {
      var seen = Seq.empty[(Long, Long)]
      for (batch <- all) {
        mem.addData(batch: _*); q.processAllAvailable()
        seen = seen ++ batch
        val streamedNow = labels.as[(Long, Long)].collect().toMap
        val fullNow = graft.graph.GraphOps.ccEdges(
          seen.toDF("src", "dst"), "src", "dst")
          .as[(Long, Long)].collect().toMap
        assert(streamedNow == fullNow,
          s"maintained labeling diverged after batch ${seen.size}: " +
            s"$streamedNow vs $fullNow")
      }
    } finally q.stop()
    val streamed = labels.as[(Long, Long)].collect().toMap
    assert(streamed(4L) == 1L && streamed(21L) == 10L && streamed(31L) == 30L)
  }

  test("streaming near-dup detection: minhash bands accumulate across batches") {
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_lsh").toString
    val bandsPath = s"$dir/bands"
    val pairsPath = s"$dir/pairs"
    val base = "spark catalyst optimizes logical plans into physical plans " +
      "with cost based rules and pushes filters into columnar scans today"
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val newBands = graft.dedup.Dedup.minhashBands(batch, "doc_id", "text")
        val existing =
          try spark.read.parquet(bandsPath)
          catch { case _: Throwable => null }
        if (existing != null) {
          // cross-batch candidates: new docs colliding with any prior band
          val hits = newBands.join(
            existing.withColumnRenamed("doc_id", "prior_id"), Seq("band", "band_key"))
            .select(col("prior_id"), col("doc_id").as("new_id")).distinct()
          hits.write.mode("append").parquet(pairsPath)
        }
        newBands.write.mode("append").parquet(bandsPath)
      }
      .start()
    try {
      mem.addData((1L, base), (2L, "a completely different text about pasta " +
        "with tomato sauce basil and parmesan served in a warm bowl tonight"))
      q.processAllAvailable()
      // exact dup of 1 in a later batch — all bands collide deterministically
      // (probabilistic near-dup recall is DedupSpec's subject)
      mem.addData((3L, base))
      q.processAllAvailable()
      val pairs = spark.read.parquet(pairsPath)
        .as[(Long, Long)].collect().toSet
      assert(pairs.contains((1L, 3L))) // cross-batch duplicate caught
      assert(!pairs.exists { case (a, b) => a == 2L || b == 2L })
    } finally q.stop()
  }

  test("streaming band-index maintenance: foreachBatch dedup+append, index hit from a streamed doc") {
    // q152's ingest loop driven from Structured Streaming: each
    // micro-batch is deduped against the BUCKETED band index via the
    // library path (incrementalNearDupWithIndex), then folded in
    // (appendBandIndex) along with its corpus rows — so a later batch's
    // duplicate of an EARLIER STREAMED doc is caught through the
    // appended bands, not just the day-0 seed.
    implicit val sc = spark.sqlContext
    val tbl = "graft_stream_band_idx"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wp = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tbl)
    val wfs = wp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (wfs.exists(wp)) wfs.delete(wp, true)
    val dir = java.nio.file.Files.createTempDirectory("graft_sbi").toString
    val corpusPath = s"$dir/corpus"
    val resultsPath = s"$dir/results"
    val textA = "spark catalyst optimizes logical plans into physical plans " +
      "with cost based rules and pushes filters into columnar scans today"
    val textB = "a completely different text about pasta with tomato sauce " +
      "basil and parmesan served in a warm bowl tonight for dinner guests"
    val textC = "graph algorithms propagate labels across edges until the " +
      "assignment reaches a fixed point after several synchronous supersteps"
    // day-0 seed: index + corpus store
    val day0 = Seq((10L, textA), (11L, textB)).toDF("doc_id", "text")
    graft.dedup.Dedup.writeBandIndex(tbl, day0, "doc_id", "text")
    day0.write.mode("overwrite").parquet(corpusPath)
    val mem = MemoryStream[(Long, String)]
    val q = mem.toDS().toDF("doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // foreachBatch runs in a CLONED session — readBandIndex refreshes
        // the batch session's own relation cache before reading, or it
        // would serve a file list from before the previous append
        val bs = batch.sparkSession
        val corpus = bs.read.parquet(corpusPath)
        graft.dedup.Dedup.incrementalNearDupWithIndex(
            batch, graft.dedup.Dedup.readBandIndex(bs, tbl), corpus,
            "doc_id", "text")
          .write.mode("append").parquet(resultsPath)
        graft.dedup.Dedup.appendBandIndex(tbl, batch, "doc_id", "text")
        batch.write.mode("append").parquet(corpusPath)
      }
      .start()
    try {
      mem.addData((20L, textA), (21L, textC)) // 20 dups the day-0 seed; 21 new
      q.processAllAvailable()
      mem.addData((30L, textC), (31L, "entirely unrelated content about " +
        "mountain weather patterns and seasonal snowfall forecasts for the " +
        "northern ranges published by the observatory"))
      q.processAllAvailable()
      val rep = spark.read.parquet(resultsPath)
        .as[(Long, Boolean, Option[Long])].collect().map(r => r._1 -> r).toMap
      assert(rep(20L)._2 && rep(20L)._3.contains(10L)) // hit via day-0 index
      assert(!rep(21L)._2)                             // genuinely new
      // the decisive case: 30 duplicates a doc that arrived BY STREAM —
      // reachable only through the appended bands
      assert(rep(30L)._2 && rep(30L)._3.contains(21L))
      assert(!rep(31L)._2) // unrelated content stays clean
    } finally {
      q.stop()
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
    }
  }

  test("streaming ANN serving: micro-batch queries off ONE fitted PQ index, batch-equal") {
    // the serving shape q151/q153 establish, driven from Structured
    // Streaming: the index (PqModel + cells) is fitted ONCE outside the
    // stream and every micro-batch's queries are answered off it —
    // foreachBatch pays only broadcast distance tables + a TakeOrdered
    // per query, never a refit. Equivalence bar: streamed answers are
    // bit-equal to the batch path for the same query ids.
    import graft.vector.Similarity
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .persist()
    val cells = Similarity.ivfCells(emb, "vec_id", "embedding", nCells = 4)
      .persist()
    val model = Similarity.pqFit(emb, "vec_id", "embedding",
      m = 2, subDims = 32, k = 4, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft_sann").toString
    val resultsPath = s"$dir/results"
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("q_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        // per-query serving loop (ANN queries are scalar by nature);
        // the model/cells caches persist across micro-batches
        batch.select("q_id").collect().map(_.getLong(0)).foreach { qid =>
          Similarity.ivfPqTopK(model, cells, "vec_id", "embedding",
              emb.filter(col("vec_id") === qid), topK = 5)
            .select(lit(qid).as("q_id"), col("vec_id"), col("adc_dist"))
            .write.mode("append").parquet(resultsPath)
        }
      }
      .start()
    try {
      val qids = emb.orderBy("vec_id").limit(4)
        .select("vec_id").as[Long].collect()
      mem.addData(qids(0), qids(1))
      q.processAllAvailable()
      mem.addData(qids(2), qids(3)) // second batch: index still warm
      q.processAllAvailable()
      val streamed = spark.read.parquet(resultsPath)
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      qids.foreach { qid =>
        val direct = Similarity.ivfPqTopK(model, cells, "vec_id", "embedding",
            emb.filter(col("vec_id") === qid), topK = 5)
          .as[(Long, Double)].collect().toSet
        assert(streamed(qid) == direct, s"query $qid diverged from batch path")
        assert(direct.nonEmpty)
      }
    } finally {
      q.stop()
      model.release()
      cells.unpersist(blocking = false)
      emb.unpersist(blocking = false)
    }
  }

  test("streaming serving off the PERSISTED PQ index: foreachBatch sessions " +
      "read the tables, bit-equal to batch (q175 streamed)") {
    // the production serving loop: the index was fitted and WRITTEN by
    // some earlier job (q175's writePqIndex); the serving stream never
    // sees the fitting session — each foreachBatch reads the index via
    // the guarded readPqIndex (foreachBatch runs in a CLONED session,
    // exactly the cross-session shape the guard exists for) and answers
    // off the tables alone. Bar: streamed = batch, bit-equal.
    import graft.vector.Similarity
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .persist()
    val table = "graft_stream_pq_idx"
    locally { // fit-and-write "job" — models release; nothing in-memory survives
      val cells = Similarity.ivfCells(emb, "vec_id", "embedding", nCells = 4)
      val model = Similarity.pqFit(emb, "vec_id", "embedding",
        m = 2, subDims = 32, k = 4, iters = 2)
      Similarity.writePqIndex(model, cells, "vec_id", table)
      model.release()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_spq").toString
    val resultsPath = s"$dir/results"
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("q_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s2 = batch.sparkSession // the cloned micro-batch session
        val (served, cellsR) = Similarity.readPqIndex(s2, table)
        val embB = s2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        batch.select("q_id").collect().map(_.getLong(0)).foreach { qid =>
          Similarity.ivfPqTopK(served, cellsR, "vec_id", "embedding",
              embB.filter(col("vec_id") === qid), topK = 5)
            .select(lit(qid).as("q_id"), col("vec_id"), col("adc_dist"))
            .write.mode("append").parquet(resultsPath)
        }
      }
      .start()
    try {
      val qids = emb.orderBy("vec_id").limit(4)
        .select("vec_id").as[Long].collect()
      mem.addData(qids(0), qids(1))
      q.processAllAvailable()
      mem.addData(qids(2), qids(3))
      q.processAllAvailable()
      val streamed = spark.read.parquet(resultsPath)
        .as[(Long, Long, Double)].collect()
        .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3)).toSet).toMap
      val (served, cellsR) = Similarity.readPqIndex(spark, table)
      qids.foreach { qid =>
        val direct = Similarity.ivfPqTopK(served, cellsR, "vec_id", "embedding",
            emb.filter(col("vec_id") === qid), topK = 5)
          .as[(Long, Double)].collect().toSet
        assert(streamed(qid) == direct, s"query $qid diverged from batch path")
        assert(direct.nonEmpty)
      }
    } finally {
      q.stop()
      emb.unpersist(blocking = false)
    }
  }

  test("streaming PQ index growth: micro-batch appends equal one bulk " +
      "append, served bit-equal (q176 streamed)") {
    // batch-size independence of the growth loop: vectors arriving over
    // N micro-batches (appendPqIndex per foreachBatch) must leave the
    // index in exactly the state ONE bulk append leaves it — add-time
    // encoding depends only on the stored codebooks/quantizer, never on
    // arrival grouping — so serving off either index is bit-equal.
    import graft.vector.Similarity
    implicit val sc = spark.sqlContext
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .persist()
    val old = emb.filter(col("vec_id") % 10 =!= 0)
    val fresh = emb.filter(col("vec_id") % 10 === 0).persist()
    def buildIndex(table: String): Unit = {
      val cells = Similarity.ivfCells(old, "vec_id", "embedding", nCells = 4)
      val model = Similarity.pqFit(old, "vec_id", "embedding",
        m = 2, subDims = 32, k = 4, iters = 2)
      val coarse = old.orderBy("vec_id").limit(4)
        .select(col("vec_id").as("cell"),
          Similarity.vecD(col("embedding")).as("cv"))
      Similarity.writePqIndex(model, cells, "vec_id", table,
        coarse = Some((coarse, "cos_raw")))
      model.release()
    }
    // reference: one bulk append
    buildIndex("graft_pq_grow_bulk")
    Similarity.appendPqIndex(spark, "graft_pq_grow_bulk", fresh, "embedding")
    // streamed: the same vectors over micro-batches
    buildIndex("graft_pq_grow_stream")
    val mem = MemoryStream[Long]
    val q = mem.toDS().toDF("vid")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val s2 = batch.sparkSession
        val ids = batch.select("vid")
        val embB = s2.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
          .join(ids, col("vec_id") === col("vid")).drop("vid")
        Similarity.appendPqIndex(s2, "graft_pq_grow_stream", embB, "embedding")
      }
      .start()
    try {
      val ids = fresh.orderBy("vec_id").select("vec_id").as[Long].collect()
      val (half1, half2) = ids.splitAt(ids.length / 2)
      mem.addData(half1.toSeq: _*); q.processAllAvailable()
      mem.addData(half2.toSeq: _*); q.processAllAvailable()
    } finally q.stop()
    def serve(table: String): Seq[(Long, Double)] = {
      val (served, cellsR) = Similarity.readPqIndex(spark, table)
      Similarity.ivfPqTopK(served, cellsR, "vec_id", "embedding",
          fresh.orderBy("vec_id").limit(1), topK = 10)
        .as[(Long, Double)].collect().toSeq
    }
    val bulk = serve("graft_pq_grow_bulk")
    val streamed = serve("graft_pq_grow_stream")
    assert(streamed == bulk,
      s"micro-batch growth diverged from bulk append: $streamed vs $bulk")
    assert(bulk.nonEmpty)
    // and the full code tables agree row-for-row, not just the served top-k
    val bulkCodes = spark.table("graft_pq_grow_bulk_codes")
      .as[(Long, Long, Long)].collect().toSet
    val streamCodes = spark.table("graft_pq_grow_stream_codes")
      .as[(Long, Long, Long)].collect().toSet
    assert(bulkCodes == streamCodes, "code tables diverged")
    fresh.unpersist(blocking = false); emb.unpersist(blocking = false)
  }

  test("readBandIndex: a second session sees post-append rows without manual refresh") {
    // the documented silent-staleness trap (round-9 verdict item 5): a
    // session that has ALREADY planned against the index caches its file
    // list; an append from another session is invisible to it until a
    // refresh. readBandIndex is the guarded read that makes the refresh
    // impossible to forget.
    val tbl = "graft_xsession_band_idx"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    val wp = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), tbl)
    val wfs = wp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (wfs.exists(wp)) wfs.delete(wp, true)
    val textA = "spark catalyst optimizes logical plans into physical plans " +
      "with cost based rules and pushes filters into columnar scans today"
    val textB = "a completely different text about pasta with tomato sauce " +
      "basil and parmesan served in a warm bowl tonight for dinner guests"
    try {
      graft.dedup.Dedup.writeBandIndex(tbl,
        Seq((10L, textA)).toDF("doc_id", "text"), "doc_id", "text")
      val reader = spark.newSession() // shares the catalog, own relation cache
      // prime the reader's relation cache with the PRE-append file list
      val before = graft.dedup.Dedup.readBandIndex(reader, tbl).count()
      assert(reader.table(tbl).count() == before)
      // append happens in the ORIGINAL session — the reader is not told
      graft.dedup.Dedup.appendBandIndex(tbl,
        Seq((20L, textB)).toDF("doc_id", "text"), "doc_id", "text")
      // the guarded path sees the grown index; 4 bands per doc
      val after = graft.dedup.Dedup.readBandIndex(reader, tbl)
      assert(after.count() == before + 4,
        s"stale read: expected ${before + 4} rows")
      assert(after.select("old_id").distinct().as[Long].collect().toSet ==
        Set(10L, 20L))
    } finally spark.sql(s"DROP TABLE IF EXISTS $tbl")
  }

  test("streaming dedup: duplicate event ids across micro-batches collapse") {
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val sdf = mem.toDF().toDF("event_id", "ts")
    val q = sdf.withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(0)), (2L, ts(1)), (1L, ts(2)))
      q.processAllAvailable()
      mem.addData((2L, ts(3)), (3L, ts(4))) // 2 is a cross-batch duplicate
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("event_id").as[Long].collect().sorted
      assert(ids.toSeq == Seq(1L, 2L, 3L))
    } finally q.stop()
  }

  test("checkpoint restart recovery: stop mid-stream, resume, exactly-once output") {
    // file source → parquet sink with a checkpoint; the query is stopped,
    // more input arrives, and a NEW query restarted from the same
    // checkpoint picks up only the unprocessed files — no loss, no
    // replay (the K1/orchestration recovery contract).
    val dir = java.nio.file.Files.createTempDirectory("graft_restart").toString
    val in = s"$dir/in"; val out = s"$dir/out"; val ckpt = s"$dir/ckpt"
    val schema = "event_id LONG, value DOUBLE"
    def writeInput(rows: Seq[(Long, Double)], name: String): Unit =
      rows.toDF("event_id", "value").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    def startQuery() =
      spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet")
        .parquet(s"$in/*")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    writeInput(Seq((1L, 1.0), (2L, 2.0)), "batch1")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    writeInput(Seq((3L, 3.0), (4L, 4.0)), "batch2") // arrives while "down"
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val back = spark.read.parquet(out)
    assert(back.count() == 4) // nothing lost, nothing duplicated
    assert(back.select(sum("value")).as[Double].head() == 10.0)
  }
}
