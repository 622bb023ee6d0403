package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-statistics operators for training-data curation: TF-IDF term
  * weighting and Gopher/C4-style repetition signals. Both are pure
  * explode→hash-agg compositions — two shuffles (term counts, then a
  * per-doc reduce), map-side combined, no driver collect — so they hold
  * at corpus scale. The reference's RAG layer stops at embedding-based
  * retrieval (ingest_vector_db.py via /root/reference); these are the
  * classic lexical complements a 100 TB curation pipeline needs.
  */
object TextStats {

  private def tokens(textCol: String) =
    graft.functions.TextExpressions.fastWordTokens(col(textCol))

  /** Term co-occurrence graph with exact integer PMI-lift — the
    * text→graph bridge of a GraphRAG build (the reference derives its
    * graph from entity links; co-occurrence is the statistical analog
    * over raw text, feeding the same graph/community family).
    *
    * An edge (x, y) for vocabulary terms present together in a document;
    * strength ranked by pointwise-mutual-information lift
    * PMI = ln(lift), lift = P(x,y)/(P(x)P(y)) = n_xy·N/(df_x·df_y) —
    * emitted as the EXACT integer `lift_ppm = (n_xy·N·1e6) div
    * (df_x·df_y)` so cross-engine float/log drift can't perturb ranks
    * or hashes (take ln downstream if the nat-log form is wanted).
    *
    * Scale shape: pair blowup is bounded by the vocabulary cap — the
    * per-doc self-join runs over ≤V vocab terms per doc (≤V²/2 pairs/
    * doc), NEVER over the raw token stream; the V-row vocabulary is a
    * broadcast; everything else is explode + hash aggs + one equi-join
    * on doc id. minPairCount prunes the long noise tail before the df
    * joins. */
  def cooccurrencePmi(
      docs: DataFrame, idCol: String, textCol: String,
      vocabSize: Int, minPairCount: Int = 2, topK: Int = 100): DataFrame = {
    val present = docs
      .select(col(idCol), explode(array_distinct(tokens(textCol))).as("term"))
    val dfreq = present.groupBy("term").agg(count(lit(1)).as("df"))
    val vocab = dfreq.orderBy(col("df").desc, col("term").asc).limit(vocabSize)
    val inVocab = present.join(broadcast(vocab), "term")
      .select(col(idCol), col("term"), col("df"))
    val pairs = inVocab.as("a")
      .join(inVocab.as("b"),
        col(s"a.$idCol") === col(s"b.$idCol") && col("a.term") < col("b.term"))
      .groupBy(col("a.term").as("x"), col("b.term").as("y"))
      .agg(count(lit(1)).as("n_xy"),
        min(col("a.df")).as("df_x"), min(col("b.df")).as("df_y"))
      .filter(col("n_xy") >= minPairCount)
    val n = docs.agg(count(lit(1)).as("n_docs"))
    // decimal(38,0) intermediates: n_xy·N·1e6 overflows Long at ~3e6
    // docs; the 38-digit integral divide stays exact at any corpus size
    // and lands back in BIGINT (the quotient is bounded by N·1e6)
    pairs.crossJoin(broadcast(n))
      .select(col("x"), col("y"), col("n_xy"), col("df_x"), col("df_y"),
        expr("""CAST((CAST(n_xy AS DECIMAL(38,0)) * n_docs * 1000000)
                 div (CAST(df_x AS DECIMAL(38,0)) * df_y) AS BIGINT)""")
          .as("lift_ppm"))
      .orderBy(col("lift_ppm").desc, col("x").asc, col("y").asc)
      .limit(topK)
  }

  /** Top-k TF-IDF terms per document: tf(d,t) · ln(N / df(t)), ties broken
    * by term. Only the 1-row N scalar is hint-broadcast; the df table is
    * vocabulary-sized and grows with the corpus (Heaps' law), so its join
    * strategy is left to AQE — broadcast when the measured build side is
    * small, shuffle hash join on `term` for large vocabularies. The big
    * side is one explode + two hash aggs + one window over doc_id.
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(n))
      .select(col(idCol), col("term"),
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6)
          .as("tfidf"))
    val w = Window.partitionBy(idCol).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= k).drop("rn")
  }

  /** Top-V vocabulary build (tokenizer prep): the V most frequent terms
    * with corpus frequency, document frequency, rank, and cumulative
    * corpus-coverage fraction. Rank order is (cf desc, term asc) — a
    * total order, so the cut is deterministic.
    *
    * Scale shape: one explode + one hash agg to the term table
    * (vocabulary-sized, sublinear in the corpus by Heaps' law), top-V via
    * orderBy+limit (TakeOrderedAndProject — per-partition partial top-V,
    * no global sort), coverage via a window over the V-row result and the
    * corpus token total as a 1-row broadcast (the only non-distributed
    * frames are V rows and 1 row). */
  def vocabulary(docs: DataFrame, idCol: String, textCol: String, topV: Int): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy("term")
      .agg(count(lit(1)).as("cf"), countDistinct(col(idCol)).as("df"))
    val total = tf.agg(sum("cf").as("total"))
    val top = tf.orderBy(col("cf").desc, col("term").asc).limit(topV)
    // partitionBy(lit(1)): single explicit partition over the V-row frame
    // (the temperatureThresholds idiom — intentional, V is tiny)
    val byRank = Window.partitionBy(lit(1)).orderBy(col("cf").desc, col("term").asc)
    val w = byRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    top.crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(byRank).cast("int"))
      .withColumn("coverage",
        round(sum("cf").over(w).cast("double") / col("total"), 6))
      .select("term", "cf", "df", "rank", "coverage")
  }

  /** BM25 top-k retrieval for a bag of query terms (Robertson k1/b, the
    * Lucene-style always-positive idf ln(1 + (N-df+0.5)/(df+0.5))) — the
    * lexical ranker complementing the vector layer's kNN.
    *
    * Determinism: every per-(doc, term) partial score is a chain of IEEE
    * double ops on exact integer inputs (bit-identical in any engine);
    * the cross-term sum folds left-to-right over the term-sorted score
    * list (collect_list is order-nondeterministic — sort_array
    * canonicalizes before the fold), so aggregation order can never move
    * the total. NOT a decimal cast: Spark's double→decimal goes through
    * the shortest string repr and diverges from binary rounding.
    *
    * Scale shape: one tf hash-agg over only the rows matching the ≤|terms|
    * query terms, a genuinely-bounded broadcast (the df table has at most
    * |terms| rows — unlike a full vocabulary it cannot grow with the
    * corpus), doc lengths as a second hash-agg, top-k via
    * TakeOrderedAndProject. */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = docs.select(col(idCol), tokens(textCol).as("t"))
    val lens = toks.select(col(idCol), size(col("t")).cast("long").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"), sum("dl").as("sum_dl"))
    val tf = toks.select(col(idCol), explode(col("t")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dfreq), "term")
      .join(lens, idCol)
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))))
      .withColumn("s",
        col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl") / (col("sum_dl").cast("double") / col("n_docs")))))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_terms"),
        aggregate(
          transform(sort_array(collect_list(struct(col("term").as("t"), col("s").as("s")))),
            x => x.getField("s")),
          lit(0.0), _ + _).as("raw"))
      .select(col(idCol), col("n_terms").cast("int").as("n_terms"),
        round(col("raw"), 6).as("bm25"))
      .orderBy(col("raw").desc, col(idCol).asc)
      .limit(k)
  }

  /** Inverted-index build: one row per term with document frequency,
    * collection frequency, and a capped posting list "doc:tf,doc:tf,…"
    * ordered by (tf desc, doc asc) — the retrieval-index materialization
    * step (posting caps are the standard impact-ordered truncation).
    * df/cf aggregate over ALL postings; only the stored list is capped.
    * One explode → one (term, doc) hash agg → one term-partitioned window
    * → one term hash agg; output is vocabulary-sized (sublinear in the
    * corpus by Heaps' law). */
  def invertedIndex(
      docs: DataFrame, idCol: String, textCol: String,
      maxPostings: Int): DataFrame = {
    val tf = docs.select(col(idCol), explode(tokens(textCol)).as("term"))
      .groupBy(col("term"), col(idCol)).agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("term").orderBy(col("tf").desc, col(idCol).asc)
    tf.withColumn("rn", row_number().over(w))
      .groupBy("term")
      .agg(
        count(lit(1)).as("df"),
        sum("tf").as("cf"),
        array_join(
          transform(
            array_sort(collect_list(when(col("rn") <= maxPostings,
              struct(col("rn").as("rn"),
                concat(col(idCol), lit(":"), col("tf")).as("e"))))),
            x => x.getField("e")),
          ",").as("postings"))
  }

  /** Shannon entropy quality signals per document, in bits: character
    * entropy (over the lowercased character stream) and word entropy
    * (over tokens). Near-zero entropy = degenerate/repetitive content;
    * the standard cheap complement to the Gopher repetition fractions.
    *
    * H = (ln n − Σ c·ln c / n) / ln 2 over class counts c. Each c·ln c
    * is an IEEE double on exact integer input (engine-portable); the sum
    * folds left-to-right over the class-sorted count list, so no
    * aggregation-order dependence anywhere. Scale: two explode→hash-agg
    * passes (chars, words) and per-doc folds over class lists — class
    * cardinality is alphabet/vocabulary-bounded per doc, never
    * corpus-sized. */
  def entropySignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // Per-ROW run-length form — zero shuffles: sort the class array, find
    // run starts, diff consecutive starts into run counts, fold c·ln c in
    // sorted-class order (the same addends in the same order as the
    // earlier explode→groupBy form and as the DuckDB oracle's ordered
    // list_reduce, so values are bit-identical — but the explode'd
    // one-row-per-character shuffle is gone; at corpus scale this removes
    // two corpus-wide exchanges entirely, and per-doc work is
    // length-bounded so there is no skew pile-up either.
    //
    // Every expensive array (sort, run starts, counts) is STAGED as its
    // own projection column and only attribute refs appear inside HOF
    // lambdas: Catalyst evaluates lambdas interpretively and re-evaluates
    // any inlined subtree PER ELEMENT — an inlined array_sort inside the
    // run-start lambda is O(n² log n) per document (measured: minutes at
    // sf0.01; staged: sub-second at sf0.1). CollapseProject keeps the
    // stages separate because each staged column is non-cheap and
    // referenced more than once downstream.
    def staged(df: DataFrame, arr: String, out: String): DataFrame = {
      val n = size(col(arr))
      val withSorted = df.withColumn("__s", array_sort(col(arr)))
      val withBounds = withSorted.withColumn("__b",
        concat(
          filter(sequence(lit(1), n),
            i => (i === 1) || (element_at(col("__s"), i) =!= element_at(col("__s"), i - 1))),
          array(n + 1)))
      val withCounts = withBounds.withColumn("__c",
        transform(sequence(lit(1), size(col("__b")) - 1),
          j => element_at(col("__b"), j + 1) - element_at(col("__b"), j)))
      val slnc = aggregate(col("__c"), lit(0.0),
        (a, c) => a + c.cast("double") * log(c.cast("double")))
      withCounts.withColumn(out,
        when(n > 0,
          round((log(n.cast("double")) - slnc / n.cast("double")) / log(lit(2.0)), 6)))
        .drop("__s", "__b", "__c")
    }
    // lower(text) staged too — inlined it would re-lowercase the whole
    // string per character element inside the char-array lambda
    val base = docs
      .select(col(idCol), lower(col(textCol)).as("__lt"), tokens(textCol).as("wa"))
      .filter(length(col("__lt")) > 0) // charless docs had no rows in the agg form
      .withColumn("ca",
        expr("transform(sequence(1, length(__lt)), i -> substr(__lt, i, 1))"))
    staged(staged(base, "ca", "char_entropy_bits"), "wa", "word_entropy_bits")
      .select(col(idCol), col("char_entropy_bits"), col("word_entropy_bits"))
  }

  /** Unigram language-model quality score per document: mean negative
    * log₂-probability per token under the corpus's OWN unigram
    * distribution — the perplexity-style quality filter (CCNet/Gopher
    * shape) with the corpus itself as the model, so no external LM is
    * needed. score = Σ_t c_dt·(ln T − ln cf_t) / (n_d·ln 2); low =
    * stereotypical text, high = rare-token-heavy (or noisy) text.
    *
    * Determinism: each per-(doc, term) contribution is IEEE double on
    * exact integer inputs; the per-doc sum folds left-to-right over the
    * term-sorted list (the entropySignals discipline), so no
    * aggregation-order dependence. Scale: two explode→hash-agg passes;
    * the term-frequency join is vocabulary-sized (AQE picks the
    * strategy); the 1-row corpus total is the only broadcast. */
  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling", public): score
    * every SOURCE document by how much more likely its tokens are under
    * the TARGET distribution than the source distribution —
    * log w(x) = Σ_term c·(ln p̂_t(term) − ln p̂_s(term)) with add-1
    * smoothed unigram models (V = corpus-wide distinct terms, so unseen-
    * in-target terms contribute a finite penalty, never −∞). Positive
    * bits-per-token ⇒ the doc reads more like the target corpus —
    * DSIR's selection signal (the paper resamples ∝ w; the deterministic
    * in-engine form exposes the weight and a ≥0 `selected` flag, and a
    * caller wanting exact quotas composes with budgetSelect/hashSplit).
    *
    * Float discipline = [[lmScore]]'s (the proven q111 shape): ln only
    * on exact integer counts cast to double, fixed intra-expression
    * order, per-doc sums folded over the term-sorted list. Scale shape:
    * one explode, three hash aggs (tf, target cf, source cf), two
    * term-keyed joins (AQE-broadcast when small), 1-row scalar
    * broadcast — no pairwise work, no driver collect. */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column): DataFrame = {
    val toks = docs
      .select(col(idCol), isTarget.as("is_target"), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy(col(idCol), col("is_target"), col("term"))
      .agg(count(lit(1)).as("c"))
    val cfT = tf.filter(col("is_target")).groupBy("term").agg(sum("c").as("cft"))
    val cfS = tf.filter(!col("is_target")).groupBy("term").agg(sum("c").as("cfs"))
    val consts = broadcast(
      cfT.agg(coalesce(sum(col("cft")), lit(0L)).as("tot_t"))
        .crossJoin(cfS.agg(coalesce(sum(col("cfs")), lit(0L)).as("tot_s")))
        .crossJoin(toks.agg(countDistinct(col("term")).as("v"))))
    val rows = tf.filter(!col("is_target"))
      .join(cfT, Seq("term"), "left")
      .join(cfS, Seq("term"))
      .crossJoin(consts)
      .select(col(idCol), col("term"), col("c"),
        (col("c").cast("double") *
          (log(coalesce(col("cft"), lit(0L)).cast("double") + 1.0) -
            log((col("tot_t") + col("v")).cast("double")) -
            log(col("cfs").cast("double") + 1.0) +
            log((col("tot_s") + col("v")).cast("double")))).as("s"))
    rows.groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"),
        aggregate(
          transform(sort_array(collect_list(struct(col("term").as("t"), col("s").as("s")))),
            x => x.getField("s")),
          lit(0.0), _ + _).as("raw"))
      .select(col(idCol), col("n_tokens"),
        round(col("raw") / col("n_tokens") / log(lit(2.0)), 6).as("bits_per_token"),
        (col("raw") >= 0.0).as("selected"))
  }

  /** ln(0.4) precomputed once in Scala and inlined as the SAME literal
    * into both engines (the q144 shared-literal trick) — the one
    * non-integer transcendental Stupid Backoff needs. */
  val LnBackoffAlpha: Double = math.log(0.4)

  /** Stupid Backoff bigram scoring (Brants, Popat, Xu, Och & Dean 2007,
    * "Large Language Models in Machine Translation" §4) — the
    * billion-token quality signal that upgrades [[lmScore]]'s unigram
    * surprisal with local word ORDER: per scored document, mean
    * surprisal −ln S(w_i | w_{i−1}) over its bigrams against a
    * REFERENCE corpus (rows where `isRef`), with
    *   S = c_ref(w_{i−1} w_i) / c_ref(w_{i−1})      when the reference
    *                                                 has the bigram,
    *   S = α · (c_ref(w_i)+1) / (N+V)               otherwise
    * — the paper's α = 0.4 backoff, terminal add-1-smoothed (q148's
    * smoothing) so reference-unseen unigrams still score finite.
    * Scrambled or machine-garbled text backs off constantly and scores
    * high-surprisal even when its unigram mix looks natural — exactly
    * the failure mode unigram LM filtering passes through.
    *
    * Float discipline (q111): every ln is of a positive-integer-valued
    * double, the per-doc sum folds over BIGRAM-SORTED terms, and ln α
    * is the [[LnBackoffAlpha]] shared literal — bit-equal cross-engine.
    *
    * Scale shape: one bigram explode (corpus-linear), two reference
    * hash aggs (vocab-sized), three equi-joins on bigram/term keys
    * (AQE broadcasts the vocab sides when they fit), one per-doc fold.
    * No pairwise work. Returns (idCol, n_bigrams, bits_per_bigram) for
    * every document with ≥1 bigram. */
  def stupidBackoffScore(
      docs: DataFrame, idCol: String, textCol: String,
      isRef: Column): DataFrame = {
    val t = docs.select(col(idCol), isRef.as("is_ref"), tokens(textCol).as("t"))
      .filter(size(col("t")) >= 2)
    val bg = t.select(col(idCol), col("is_ref"), explode(expr(
      "transform(sequence(1, size(t) - 1), " +
        "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bg"))
    val bf = bg.groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
      .withColumn("pre", substring_index(col("bg"), " ", 1))
      .withColumn("suf", substring_index(col("bg"), " ", -1))
    // reference model: unigram counts, vocab size, token total, bigram counts
    val runi = docs.filter(isRef)
      .select(explode(tokens(textCol)).as("w"))
    val cu = runi.groupBy("w").agg(count(lit(1)).as("cw"))
    val consts = broadcast(cu.agg(
      sum("cw").as("n"), count(lit(1)).as("v")))
    val cb = bg.filter(col("is_ref")).groupBy("bg").agg(count(lit(1)).as("cb"))
    val terms = bf
      .join(cb, Seq("bg"), "left")
      .join(cu.select(col("w").as("pre"), col("cw").as("cp")), Seq("pre"), "left")
      .join(cu.select(col("w").as("suf"), col("cw").as("cs")), Seq("suf"), "left")
      .crossJoin(consts)
      .select(col(idCol), col("bg"), col("c"),
        (col("c").cast("double") *
          when(col("cb").isNotNull,
            log(col("cp").cast("double")) - log(col("cb").cast("double")))
          .otherwise(
            log((col("n") + col("v")).cast("double"))
              - log(coalesce(col("cs"), lit(0L)).cast("double") + 1.0)
              - lit(LnBackoffAlpha))).as("s"))
    terms.groupBy(col(idCol))
      .agg(sum("c").as("n_bigrams"),
        aggregate(
          transform(sort_array(collect_list(struct(col("bg").as("b"), col("s").as("s")))),
            x => x.getField("s")),
          lit(0.0), _ + _).as("raw"))
      .select(col(idCol), col("n_bigrams"),
        round(col("raw") / col("n_bigrams") / log(lit(2.0)), 6).as("bits_per_bigram"))
  }

  /** EXACT top-k most frequent terms via Misra–Gries candidate
    * generation + recount (Misra & Gries 1982, "Finding repeated
    * elements") — the 100 TB shape for heavy hitters over a vocabulary
    * too large to shuffle: a full `groupBy(term).count()` (q88's
    * vocabulary) shuffles EVERY distinct term; here pass 1 runs a
    * bounded `capacity`-counter summary PER PARTITION (the documented
    * genuine-per-partition-imperative case — mapPartitions, O(capacity)
    * memory), whose union is guaranteed to contain every term with
    * global count > N/(capacity+1); pass 2 recounts ONLY the candidate
    * terms exactly (broadcast semi-join) and takes the top-k.
    *
    * The result is EXACT — and provably so when the k-th returned count
    * exceeds N/(capacity+1) (no non-candidate can reach the top-k);
    * that guarantee is emitted as `guarantee_ok` so a mis-sized
    * capacity fails loudly, not wrongly. The final output depends only
    * on the data (candidates are a superset whatever the partitioning),
    * so it is partition-layout-invariant and SQL-oracle-checkable.
    * Returns k rows: (term, cnt, guarantee_ok) by (cnt desc, term). */
  def heavyHittersExact(
      docs: DataFrame, textCol: String,
      k: Int, capacity: Int = 4096): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(explode(tokens(textCol)).as("term")).persist()
    val cand = toks.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { t =>
        m.get(t) match {
          case Some(c) => m(t) = c + 1
          case None if m.size < capacity => m(t) = 1L
          case None => // decrement-all, drop zeros; new key not admitted
            val dead = List.newBuilder[String]
            m.foreach { case (kk, v) => if (v == 1L) dead += kk else m(kk) = v - 1 }
            dead.result().foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF("term").distinct()
    val n = broadcast(toks.agg(count(lit(1)).as("n")))
    val out = toks.join(broadcast(cand), "term")
      .groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
      .crossJoin(n)
      // cnt > n div (capacity+1) — integer division, exactly equivalent
      // to cnt·(capacity+1) > n for integer cnt but overflow-free: the
      // multiplied form wraps Long once total tokens exceed ~2.2e15 at
      // the default capacity — precisely the 100 TB corpus this function
      // is documented for (round-9 ADVICE)
      .select(col("term"), col("cnt"),
        (col("cnt") > expr(s"n div ${capacity + 1}")).as("guarantee_ok"))
      .persist()
    out.count()
    toks.unpersist(blocking = false)
    out
  }

  def lmScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), explode(tokens(textCol)).as("term"))
    val tf = toks.groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
    val cf = tf.groupBy("term").agg(sum("c").as("cf"))
    val tot = cf.agg(sum("cf").as("t"))
    val rows = tf.join(cf, "term").crossJoin(broadcast(tot))
      .select(col(idCol), col("term"), col("c"),
        (col("c").cast("double") *
          (log(col("t").cast("double")) - log(col("cf").cast("double")))).as("s"))
    rows.groupBy(col(idCol))
      .agg(sum("c").as("n_tokens"),
        aggregate(
          transform(sort_array(collect_list(struct(col("term").as("t"), col("s").as("s")))),
            x => x.getField("s")),
          lit(0.0), _ + _).as("raw"))
      .select(col(idCol), col("n_tokens"),
        round(col("raw") / col("n_tokens") / log(lit(2.0)), 6).as("bits_per_token"))
  }

  /** C4/RefinedWeb-style LINE-level cleaning: split each document on
    * newlines, drop lines that (a) repeat an earlier identical line in
    * the same document (RefinedWeb's intra-doc line dedup), (b) have
    * fewer than `minWords` word tokens, or (c) contain a badword token
    * (C4's line filters; its terminal-punctuation rule is the same
    * predicate shape — add a regex test on the line if the corpus has
    * punctuation). Returns per doc: (idCol, n_lines, n_kept, clean_text)
    * with clean_text the kept lines rejoined in original order.
    *
    * Scale shape: one posexplode to (doc, line-index, line) rows, one
    * (doc, line) window for the first-occurrence flag, one per-doc hash
    * agg that re-assembles via an index-sorted fold — everything
    * doc-partition-parallel, no driver collect. */
  def lineFilter(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int, badwords: Seq[String]): DataFrame = {
    // `__lt` materialized in its own projection (r16, the Change-2
    // discipline): the old inlined form re-ran the tokenizer regex once
    // per badword (each array_contains) plus once for the size guard —
    // 1 + |badwords| evals per LINE. Same rows, same keep decisions.
    // Collision-free helper name (r16 ADVICE): the narrowed frame holds
    // (idCol, i, line), so only an idCol literally named "__lt" could
    // silently collide with the helper — suffix past it.
    val ltName =
      Iterator.from(0).map(i => if (i == 0) "__lt" else "__lt" + i)
        .find(n => n != idCol && n != "i" && n != "line").get
    val lineToks = col(ltName)
    val bad =
      if (badwords.isEmpty) lit(false)
      else badwords.map(b => array_contains(lineToks, b)).reduce(_ || _)
    val lines = docs.select(col(idCol),
      posexplode(split(col(textCol), "\n")).as(Seq("i", "line")))
      .withColumn(ltName,
        graft.functions.TextExpressions.fastWordTokens(col("line")))
    val w = Window.partitionBy(col(idCol), col("line")).orderBy(col("i"))
    lines
      .withColumn("keep",
        (row_number().over(w) === 1) && size(lineToks) >= minWords && !bad)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        coalesce(sum(when(col("keep"), 1)), lit(0)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("i").as("i"), col("line").as("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
  }

  /** C4-style CORPUS-level line deduplication (Raffel et al. 2020 §2.2 —
    * "we discarded all but one of any three-sentence span occurring more
    * than once", operationalized per line as the public C4 reproductions
    * do): a line whose GLOBAL frequency reaches `minCount` keeps only its
    * first occurrence — smallest (doc, index), a total order — and every
    * other instance is dropped; rare lines pass through. Per-doc text is
    * reassembled in original order. Complements [[lineFilter]], which is
    * doc-LOCAL: boilerplate repeated ACROSS documents (cookie banners,
    * license headers) is exactly what this pass removes from a pretraining
    * corpus.
    *
    * Scale shape: one posexplode (no shuffle) → one groupBy(line) agg
    * (count + min(struct(doc, i)), both partial-aggregated map-side so
    * hot boilerplate lines collapse before the exchange) → a line-keyed
    * equi-join back (each instance matches exactly one freq row; AQE
    * skew-join splits hot keys) → one per-doc hash agg to reassemble.
    * Never a doc×doc or line×line product; no driver collect. */
  def corpusLineDedup(
      docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    val lines = docs.select(col(idCol).as("__d"),
      posexplode(split(col(textCol), "\n")).as(Seq("i", "line")))
    val freq = lines.groupBy("line").agg(
      count(lit(1)).as("__n"),
      min(struct(col("__d"), col("i"))).as("__first"))
    lines.join(freq, "line")
      .withColumn("keep",
        col("__n") < minCount ||
          (col("__first.__d") === col("__d") && col("__first.i") === col("i")))
      .groupBy(col("__d"))
      .agg(
        count(lit(1)).cast("int").as("n_lines"),
        coalesce(sum(when(col("keep"), 1)), lit(0)).cast("int").as("n_kept"),
        array_join(
          transform(
            array_sort(collect_list(when(col("keep"),
              struct(col("i").as("i"), col("line").as("line"))))),
            x => x.getField("line")),
          "\n").as("clean_text"))
      .withColumnRenamed("__d", idCol)
  }

  /** Word-level repetition signals per document (the Gopher quality
    * filters' lexical core): distinct-token ratio, most-frequent-token
    * fraction, most-frequent-bigram fraction. All ratios are exact
    * integer quotients evaluated in double — deterministic under any
    * aggregation order. */
  def repetitionSignals(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol), tokens(textCol).as("t"))
    val tokCounts = toks.select(col(idCol), explode(col("t")).as("term"))
      .groupBy(col(idCol), col("term")).agg(count(lit(1)).as("c"))
    val tokStats = tokCounts.groupBy(idCol).agg(
      sum("c").as("n_tokens"),
      count(lit(1)).as("n_distinct"),
      max("c").as("top_tok"))
    // size >= 2 guard: sequence(1, 0) would DESCEND ([1,0]) and the
    // element_at(t, 0) would throw under ANSI mode (Spark 4 default).
    val bigrams = toks.filter(size(col("t")) >= 2)
      .select(col(idCol), explode(
        expr("transform(sequence(1, size(t) - 1), " +
          "i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))")).as("bg"))
      .groupBy(col(idCol), col("bg")).agg(count(lit(1)).as("c"))
    val bgStats = bigrams.groupBy(idCol).agg(
      sum("c").as("n_bigrams"), max("c").as("top_bg"))
    tokStats.join(bgStats, Seq(idCol), "left").select(
      col(idCol),
      round(col("n_distinct").cast("double") / col("n_tokens"), 6)
        .as("distinct_ratio"),
      round(col("top_tok").cast("double") / col("n_tokens"), 6)
        .as("top_word_frac"),
      round(coalesce(col("top_bg"), lit(0L)).cast("double") /
        greatest(coalesce(col("n_bigrams"), lit(0L)), lit(1L)), 6)
        .as("top_bigram_frac"))
  }

  /** The Gopher document-quality rule set (Rae et al. 2021 §A1.1, the
    * standard pretraining-corpus gate; C4/RefinedWeb run variants of the
    * same rules): per document every signal plus the composite pass
    * verdict. Rules:
    *   1. 50 ≤ word count ≤ 100 000
    *   2. 3 ≤ mean word length ≤ 10
    *   3. symbol-to-word ratio (#, … or ...) ≤ 0.1
    *   4. ≤ 10% of lines start with a bullet
    *   5. ≤ 30% of lines end with an ellipsis
    *   6. ≥ 80% of words contain an alphabetic character
    *   7. ≥ 2 distinct Gopher stop words present
    *
    * Determinism: integer counts + exact double quotients (rounded 6),
    * RE2-safe regexes (no lookaround) so the identical patterns run
    * under DuckDB — the oracle computes the same eight columns. Scale:
    * a pure projection, embarrassingly parallel, no shuffle. */
  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    // `__w`/`__st` hoisted into their own projection (r16, the Change-2
    // discipline): the stop-word regex used to sit INSIDE the filter
    // lambda over the 8-element stop array — higher-order-function
    // lambdas are interpreted per element outside codegen's
    // subexpression elimination, so it re-tokenized every document 8×.
    // `words` is likewise pinned to one evaluation instead of leaning on
    // codegen CSE across its three consumers. Same columns, same values.
    // Helper names are COLLISION-FREE (r16 ADVICE): withColumn silently
    // replaces a same-named caller column, which would change results
    // with no error; suffix until absent from the input schema.
    def fresh(base: String): String =
      Iterator.from(0)
        .map(i => if (i == 0) base else base + i)
        .find(n => !docs.columns.contains(n)).get
    val wName = fresh("__w")
    val stName = fresh("__st")
    val words = col(wName)
    val nWords = greatest(size(words), lit(1)).cast("long")
    val nChars = length(regexp_replace(t, "\\s+", "")).cast("long")
    val nSym = size(expr(s"regexp_extract_all($textCol, '#|\\\\.\\\\.\\\\.|…', 0)")).cast("long")
    val lines = split(t, "\n")
    val nLines = greatest(size(lines), lit(1)).cast("long")
    val nBullet = size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("long")
    val nEllip = size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("long")
    val nAlpha = size(filter(words, w => w.rlike("[a-zA-Z]"))).cast("long")
    // sum-of-contains, not size(filter(stops, contains)): the same count,
    // but `__st` is referenced 8× OUTSIDE any lambda — multi-use of a
    // non-cheap column is what stops CollapseProject re-inlining the
    // regex into a per-element HOF body (a single-use column would be
    // inlined right back where it started)
    val stopHits = GopherStops
      .map(s => when(array_contains(col(stName), s), 1L).otherwise(0L))
      .reduce(_ + _)
    docs
      .withColumn(wName, expr(s"regexp_extract_all($textCol, '\\\\S+', 0)"))
      .withColumn(stName, expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
      .select(
        col(idCol),
        size(words).cast("long").as("n_words"),
        round(nChars.cast("double") / nWords, 6).as("mean_word_len"),
        round(nSym.cast("double") / nWords, 6).as("symbol_ratio"),
        round(nBullet.cast("double") / nLines, 6).as("bullet_frac"),
        round(nEllip.cast("double") / nLines, 6).as("ellipsis_frac"),
        round(nAlpha.cast("double") / nWords, 6).as("alpha_frac"),
        stopHits.as("n_stop_hits"))
      .withColumn("pass",
        col("n_words").between(50L, 100000L) &&
        col("mean_word_len").between(3.0, 10.0) &&
        col("symbol_ratio") <= 0.1 &&
        col("bullet_frac") <= 0.1 &&
        col("ellipsis_frac") <= 0.3 &&
        col("alpha_frac") >= 0.8 &&
        col("n_stop_hits") >= 2L)
  }

  /** The Gopher stop-word list (rule 7). */
  val GopherStops: Seq[String] =
    Seq("and", "be", "have", "of", "that", "the", "to", "with")
}
