package graft

/** Physical-plan shape assertions — the scale contract (SURVEY §4/§8
  * scale notes): filters and projections must reach the parquet scan,
  * small dims must broadcast, global top-k must avoid a full sort, and
  * the LPA superstep join must broadcast the label table. These are the
  * properties that decide whether the same plan survives 1000 executors
  * reading 100 TB. */
class PlanSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def planOf(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q02: predicate and projection are pushed into the parquet scan") {
    val p = planOf("q02_filter_pushdown")
    assert(p.contains("PushedFilters: ["))
    assert(p.contains("IsNotNull(l_quantity)") || p.contains("GreaterThan(l_quantity"))
    // pruned read schema: only the needed columns reach the scan
    assert(p.contains("ReadSchema"))
    assert(!p.contains("l_comment")) // untouched wide column never read
  }

  test("q04: dimension joins broadcast (no shuffle of the fact side)") {
    val p = planOf("q04_customer_geo_rollup")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("q181: the salted join's replicated side is NEVER broadcast " +
      "(size estimates don't see the explode's salts-fold inflation — " +
      "the sf1 9.9 GiB broadcast-ceiling lesson, round 15)") {
    val p = planOf("q181_salted_join_auto")
    assert(p.contains("SortMergeJoin"), p.take(400))
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("q142: multi-probe explode inflation lives INSIDE the intended " +
      "broadcast; the corpus is never the build side (r15 stretch: " +
      "q181's lesson swept across cardinality-inflating operators)") {
    val p = planOf("q142_ann_lsh_multiprobe")
    // the ×(planes+1) probe explode must sit under the BroadcastExchange
    // (we broadcast the small exploded QUERY; its true size is
    // |query|·(planes+1), known to the caller — the operator contract).
    // If the explode ever ends up on the streamed side with the corpus
    // broadcast instead, a 100 TB corpus hits the broadcast ceiling.
    val bi = p.indexOf("BroadcastExchange")
    assert(bi >= 0, p.take(2000))
    val gi = p.indexOf("Generate explode")
    assert(gi > bi, s"probe explode not inside the broadcast subtree:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"))
  }

  test("q136: duplicate-span windows (the len/stride-fold explode) are " +
      "never a broadcast build side — the dup-hash side may broadcast " +
      "only via AQE's runtime sizes") {
    val p = planOf("q136_duplicate_spans")
    // the exploded window frame is persisted (InMemoryTableScan); the
    // join against the aggregated dup-hash frame must not statically
    // broadcast the window side. (Audit note: unlike q181's salt
    // explode, this explode SHRINKS bytes — (id,pos,hash) rows replace
    // the full text — and the dup side sits behind a shuffle, so AQE
    // decides from real sizes; this pin guards the static plan.)
    // Every broadcast build in the plan must be the dup-hash side: the
    // node right under the exchange is the h-projection over the
    // groupBy(h) aggregate, which collapses the exploded rows BEFORE
    // any broadcast. (The raw plan text below an exchange also prints
    // cached InMemoryRelation definitions, so a naive "no explode after
    // BroadcastExchange" check false-positives.)
    var bi = p.indexOf("BroadcastExchange")
    assert(bi >= 0, p.take(2000)) // dup side broadcasting IS the plan
    while (bi >= 0) {
      val win = p.substring(bi, math.min(p.length, bi + 400))
      assert(win.contains("Project [h#"),
        s"a broadcast not building from the aggregated dup side:\n$win")
      bi = p.indexOf("BroadcastExchange", bi + 1)
    }
    assert(!p.contains("CartesianProduct"))
  }

  test("q07: global top-k plans TakeOrderedAndProject, not a full sort") {
    val p = planOf("q07_global_topk")
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q37: kNN scores with a broadcast query vector") {
    val p = planOf("q37_knn_brute")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q33: minhash aggregates partially before the doc-id shuffle") {
    val p = planOf("q33_minhash_lsh")
    // partial_min on the map side → combiner collapses shingle rows to
    // ≤ |docs|·k values per partition before the exchange; the exchange
    // is also what ReuseExchange dedups for self-join consumers (q91)
    assert(p.contains("partial_min") || p.contains("HashAggregate"))
  }

  test("q82: decontamination joins on n-grams, never a doc-pair product") {
    val p = planOf("q82_decontaminate")
    assert(!p.contains("CartesianProduct"))
    assert(!p.contains("BroadcastNestedLoopJoin"))
    // the per-doc shared count aggregates partially before the shuffle
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("suite-wide: no query plans a CartesianProduct; BNLJ only for 1-row broadcasts") {
    // BroadcastNestedLoopJoin is legitimate exactly where a 1-row scalar
    // frame (count, query vector, anchor) crossJoins the big side; a
    // CartesianProduct (non-broadcast product) is never acceptable.
    val bnljAllowed = Set(
      "q37_knn_brute",    // broadcast query vector
      "q40_two_hop",      // broadcast 1-row anchor
      "q58_ann_ivf",      // broadcast query vector
      "q75_tfidf_topk",   // broadcast 1-row N(docs) scalar
      "q86_ann_recall",   // broadcast query vector (brute + LSH sides)
      "q88_vocabulary",   // broadcast 1-row corpus-token-total scalar
      "q93_bm25",         // broadcast 1-row (n_docs, sum_dl) scalar
      "q97_kmeans",       // broadcast k-row centroid table per iteration
      // q108_hits left the list in round 6: the Σraw rescale scalar is a
      // driver probe inlined as a literal now — no crossJoin in its plan
      "q109_modularity",  // broadcast 1-row m2 (2m edge count) scalar
      "q111_lm_score",    // broadcast 1-row corpus-token-total scalar
      "q129_rrf_hybrid",  // inherits q37's query-vector + q93's stats BNLJs
      "q131_matryoshka_recall", // broadcast query vector per prefix length
      "q133_skew_report", // broadcast 1-row totals + 1-row top-keys string
      "q137_cooccurrence_pmi", // broadcast 1-row N(docs) scalar
      "q139_hard_negatives", // broadcast 4-row anchor set
      "q143_semdedup",       // broadcast k-row centroid table (kmeans)
      "q144_retrieval_metrics", // broadcast 4-row anchor set (as q139)
      "q145_pq_codes",       // broadcast k-row centroid tables per subvector
      "q146_pq_adc_topk",    // centroid tables + 1-row query vector/id
      "q148_importance_weights", // broadcast 1-row (tot_t, tot_s, V) scalar
      "q151_pq_reuse",       // q146's shapes ×2 probes off one fitted model
      "q153_ann_ivf_pq",     // q58's centroid + q146's table/query shapes
      "q154_ivf_pq_nprobe",  // q153's shapes + broadcast 4-row probe set
      "q156_stupid_backoff", // broadcast 1-row (N, V) reference scalar
      "q158_kmv_set_algebra", // 5-row sketch-table pair join (theta <)
      "q159_heavy_hitters",  // broadcast 1-row corpus-token-total scalar
      "q167_ivf_pq_refine",  // q154's shapes + 1-row query crossJoins in the refine
      "q168_ann_ivf_trained", // broadcast k-row centroid table (kmeans cells)
      "q169_ivf_pq_residual", // q153's shapes over the residual frame
      // q168's broadcast k-row centroid table + q169's residual shapes
      "q172_ivf_pq_residual_trained",
      // q167's refine shapes + the k-row trained-centroid probe crossJoin
      "q174_ivf_pq_refine_trained",
      // q153's serving shapes read back off the persisted index tables
      "q175_pq_index_roundtrip",
      // q175's shapes + add-time encode (k-row codebook/coarse crossJoins)
      "q176_pq_index_append",
      // q176's exact flow + compaction (a pure physical rewrite: same
      // serving shapes, same 1-row/k-row broadcast crossJoins)
      "q179_pq_index_compact")
    // Known blind spot: the iterative queries (q42/q60/q80/q81) run
    // their superstep jobs eagerly inside fn, so only their FINAL frame
    // is inspected here; the supersteps' own plan shapes are covered by
    // GraphSpec's equivalence tests and the GraphOps design notes.
    SparkEntry.registry.foreach { q =>
      val p = q.fn(spark, sf).queryExecution.executedPlan.toString
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a CartesianProduct")
      if (!bnljAllowed(q.name))
        assert(!p.contains("BroadcastNestedLoopJoin"),
          s"${q.name} plans an unexpected BroadcastNestedLoopJoin")
      // the iterative queries return persisted frames; drop them so the
      // sweep doesn't accumulate dozens of resident caches (the exact
      // suite leak Bench.clearCaches exists to prevent)
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
  }

  test("q105: bucketed join is SMJ with zero join-side exchange") {
    val p = planOf("q105_bucketed_join")
    assert(p.contains("SortMergeJoin"))
    // the only hashpartitioning exchange is the post-join aggregation's;
    // the join key itself is carried by the bucket layout
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"))
  }

  // the bucketed (band_key) layout must satisfy the band join's
  // distribution: between the index table's scan and the band join
  // there must be NO ShuffleExchange — only the batch side (and
  // downstream aggs) shuffle. AQE is unwrapped explicitly; post-join
  // exchanges contain the scan in their subtree and don't count.
  private def assertZeroIndexSideExchange(queryName: String): Unit = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
    val plan0 = SparkEntry.queries(queryName)(spark, sf)
      .queryExecution.executedPlan
    val plan = plan0 match {
      case a: AdaptiveSparkPlanExec => a.inputPlan
      case p => p
    }
    def hasScan(p: SparkPlan): Boolean = p.toString.contains("graft_band_idx")
    assert(hasScan(plan), "plan must read the bucketed index table")
    // innermost join over the index: a join one of whose CHILDREN holds
    // the scan (the band equi-join), not an outer join above it
    val indexSides = plan.collect {
      case j: SortMergeJoinExec => j.children
      case j: ShuffledHashJoinExec => j.children
      case j: BroadcastHashJoinExec => j.children
    }.flatten.filter(hasScan)
    assert(indexSides.nonEmpty, "no join child contains the index scan")
    val innermost = indexSides.minBy(_.toString.length)
    val offending = innermost.collect { case e: ShuffleExchangeExec => e }
    assert(offending.isEmpty,
      s"index side must ride the bucket layout, not an exchange:\n$innermost")
  }

  test("q141: maintained band index joins with zero index-side exchange") {
    assertZeroIndexSideExchange("q141_neardup_bucketed_index")
  }

  test("q152: the APPENDED band index still joins with zero index-side exchange") {
    // q152's fn runs two consecutive ingest days — builds the index from
    // day-0, dedups+appends day-1, and returns day-2's dedup plan over
    // the GROWN index. The returned plan is therefore exactly the
    // second-consecutive-batch case: the appended files must ride the
    // bucket layout like the original ones.
    assertZeroIndexSideExchange("q152_band_index_append")
  }

  test("q180: the COMPACTED band index still joins with zero index-side exchange") {
    // compaction rewrites the index to one file per bucket with the SAME
    // bucketBy(band_key) spec — the day-2 check over the compacted index
    // must still ride the bucket layout without an exchange
    assertZeroIndexSideExchange("q180_band_index_compact")
  }

  test("q83: packing plans exactly one group repartition, no global sort") {
    val p = planOf("q83_pack_sequences")
    // one hashpartitioning exchange on the group column; the order is
    // sortWithinPartitions (local), never a range-partitioned global sort
    assert(p.contains("hashpartitioning(source"))
    assert(!p.contains("rangepartitioning"))
  }
}
