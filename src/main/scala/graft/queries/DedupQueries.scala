package graft.queries

import graft.{Q, Tables}
import graft.dedup.{BandIndex, BandIndexConfig, Dedup}
import org.apache.spark.sql.functions._

/** Deduplication queries (the brief's training-data-pipeline extensions)
  * over the `documents` table, each with an exact DuckDB oracle — all
  * hashing is portable md5-hex arithmetic (Dedup.scala).
  */
object DedupQueries {

  val all: Seq[Q] = Seq(

    // Exact dedup via content-hash groupBy: fingerprint → representative id
    // + multiplicity (the distributed unique-by-key; reference dedups via
    // unique(subset, keep="first"), data_transformation_helpers.py:89-120).
    Q("q32_dedup_exact",
      """SELECT sha256(text) AS fp, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY sha256(text)""".stripMargin) { (s, dir) =>
      Dedup.exactGroups(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // MinHash(16) + LSH banding (4 bands × 4 rows): docs sharing a
    // (band, band_key) are near-dup candidates. One md5 per shingle;
    // signature = 16 partial-min aggregates in one groupBy.
    Q("q33_minhash_lsh",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(t) - 2),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |    FROM toks WHERE len(t) >= 3)),
        |hh AS (
        |  SELECT doc_id,
        |    list_reduce(list_transform(generate_series(1, 12),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_transform(generate_series(13, 24),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) * 2 + 1 AS h2
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS mh
        |  FROM hh CROSS JOIN range(16) r(i) GROUP BY doc_id, i)
        |SELECT doc_id, CAST(i // 4 AS INT) AS band,
        |       md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS band_key
        |FROM sig GROUP BY doc_id, i // 4""".stripMargin) { (s, dir) =>
      Dedup.minhashBands(Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4)
    },

    // 32-bit SimHash over the distinct-token set (bitstring output).
    Q("q34_simhash",
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, md5(tok) AS m FROM toks),
        |bits AS (
        |  SELECT doc_id, j,
        |    SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, j // 4 + 1, 1)) - 1)
        |                   >> (3 - j % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
        |  FROM h CROSS JOIN range(32) r(j) GROUP BY doc_id, j)
        |SELECT doc_id,
        |       string_agg(CASE WHEN sgn >= 0 THEN '1' ELSE '0' END, '' ORDER BY j) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.simhash32(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // Reproducible hash-based dataset split (train/val/test ≈ 80/10/10):
    // split membership is a pure function of doc_id, so it is stable
    // across runs/partitionings — the production-grade replacement for
    // seeded sampling in training-data pipelines.
    Q("q73_hash_split",
      """WITH s AS (
        |  SELECT lang,
        |    (CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |     + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT)) AS b
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN b < 205 THEN 'train' WHEN b < 230 THEN 'val' ELSE 'test' END AS split,
        |  COUNT(*) AS n
        |FROM s GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy(col("lang"), Dedup.hashSplit3(col("doc_id")).as("split"))
        .agg(count(lit(1)).as("n"))
    },

    // SimHash near-dup pairing: signatures → numeric form → blocked
    // self-join with hamming distance = bit_count(xor) ≤ 10. Completes
    // the SimHash pipeline q34 starts (signature → candidate pairs).
    Q("q74_simhash_neardup",
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
        |  FROM documents),
        |h AS (SELECT doc_id, md5(tok) AS m FROM toks),
        |bits AS (
        |  SELECT doc_id, j,
        |    SUM(CASE WHEN ((strpos('0123456789abcdef', substr(m, j // 4 + 1, 1)) - 1)
        |                   >> (3 - j % 4)) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
        |  FROM h CROSS JOIN range(32) r(j) GROUP BY doc_id, j),
        |sig AS (
        |  SELECT doc_id,
        |    SUM(CASE WHEN sgn >= 0 THEN (CAST(1 AS BIGINT) << (31 - CAST(j AS INT))) ELSE 0 END) AS num
        |  FROM bits GROUP BY doc_id),
        |s AS (SELECT d.doc_id, d.source, sig.num FROM documents d JOIN sig USING (doc_id))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(bit_count(xor(a.num, b.num)) AS INT) AS hamming
        |FROM s a JOIN s b ON a.source = b.source AND a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.num, b.num)) <= 10""".stripMargin) { (s, dir) =>
      val sig = Dedup.simhash32(Tables(s, dir, "documents"), "doc_id", "text")
        .withColumn("num", conv(col("simhash"), 2, 10).cast("long"))
      val withBlock = sig.join(
        Tables(s, dir, "documents").select("doc_id", "source"), "doc_id")
      val a = withBlock.select(
        col("doc_id").as("id_a"), col("source").as("blk"), col("num").as("na"))
      val b = withBlock.select(
        col("doc_id").as("id_b"), col("source").as("blk"), col("num").as("nb"))
      a.join(b, Seq("blk"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("hamming", bit_count(col("na").bitwiseXOR(col("nb"))).cast("int"))
        .filter(col("hamming") <= 10)
        .select("id_a", "id_b", "hamming")
    },

    // Training-mixture sampling: per-language keep rates as a pure
    // function of doc_id (first md5 byte < rate·256) — deterministic
    // across runs/partitionings, unlike seeded sample(). Rates: en 90%,
    // de 50%, es 37.5%, fr 25%, default (zh) 12.5%.
    Q("q78_mixture_sample",
      """WITH s AS (
        |  SELECT lang, source,
        |    (CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |     + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT)) AS b
        |  FROM documents)
        |SELECT lang, source, COUNT(*) AS n_kept
        |FROM s
        |WHERE b < CASE lang WHEN 'en' THEN 230 WHEN 'de' THEN 128
        |                    WHEN 'es' THEN 96 WHEN 'fr' THEN 64 ELSE 32 END
        |GROUP BY lang, source""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .filter(Dedup.mixtureKeep(col("doc_id"), col("lang"),
          Map("en" -> 230, "de" -> 128, "es" -> 96, "fr" -> 64),
          defaultRate256 = 32))
        .groupBy("lang", "source").agg(count(lit(1)).as("n_kept"))
    },

    // Deterministic global shuffle (training-example ordering): 16 hash
    // buckets + dense within-bucket position — per-bucket windows on
    // 16-way shuffled partitions, never a single-partition global sort.
    Q("q79_shuffle_buckets",
      """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hh FROM documents),
        |b AS (SELECT doc_id, hh,
        |        CAST(strpos('0123456789abcdef', substr(hh, 1, 1)) - 1 AS INT) AS bucket
        |      FROM h)
        |SELECT doc_id, bucket,
        |  CAST(row_number() OVER (PARTITION BY bucket ORDER BY hh, doc_id) AS INT) AS pos
        |FROM b""".stripMargin) { (s, dir) =>
      Dedup.shuffleBuckets(Tables(s, dir, "documents"), "doc_id", buckets = 16)
        .select("doc_id", "bucket", "pos")
    },

    // Blocked 2-gram Jaccard: pairwise similarity inside
    // (source, length-bucket) blocks — the blocking keeps the pair join
    // an equi-join instead of a corpus cross product.
    Q("q35_ngram_jaccard",
      """WITH base AS (
        |  SELECT doc_id, source, CAST(n_chars // 100 AS INT) AS lb,
        |    list_distinct(list_transform(
        |      generate_series(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1),
        |      i -> regexp_extract_all(lower(text), '[a-z0-9]+')[i] || ' ' ||
        |           regexp_extract_all(lower(text), '[a-z0-9]+')[i+1])) AS sh
        |  FROM documents
        |  WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 2)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CAST(len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS DOUBLE)
        |        / (len(a.sh) + len(b.sh) - len(list_filter(a.sh, x -> list_contains(b.sh, x)))),
        |        6) AS jaccard
        |FROM base a JOIN base b
        |  ON a.source = b.source AND a.lb = b.lb AND a.doc_id < b.doc_id""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairs(
        Tables(s, dir, "documents"), "doc_id", "text",
        blockCols = Seq(col("source"), (col("n_chars") / 100).cast("int").as("lb")),
        shingleN = 2)
    },

    // Temperature-based mixture rebalancing (T=2): keep thresholds are
    // DERIVED from the corpus (kept distribution ∝ sqrt(p), rarest
    // stratum keeps everything) instead of hand-set like q78; the keep
    // decision is the same first-md5-byte test. sqrt/division are
    // IEEE-exact in both engines, so thresholds and counts hash-match.
    Q("q87_temperature_mixture",
      """WITH c AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
        |q AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE) / SUM(n) OVER ()) AS qs FROM c),
        |q2 AS (SELECT lang, n, qs, CAST(n AS DOUBLE) / qs AS ratio FROM q),
        |q3 AS (SELECT lang, n, qs, ratio, MIN(ratio) OVER () AS cmin FROM q2),
        |r AS (SELECT lang, n AS n_orig,
        |        CASE WHEN ratio = cmin THEN 256
        |             ELSE CAST(floor(cmin * qs / n * 256) AS INT) END AS thresh FROM q3),
        |s AS (SELECT lang,
        |  (CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |   + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT)) AS b
        |  FROM documents),
        |k AS (SELECT s.lang, COUNT(*) AS n_kept
        |      FROM s JOIN r ON s.lang = r.lang WHERE s.b < r.thresh GROUP BY s.lang)
        |SELECT r.lang, r.n_orig, r.thresh, COALESCE(k.n_kept, 0) AS n_kept
        |FROM r LEFT JOIN k ON r.lang = k.lang""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val rates = Dedup.temperatureThresholds(docs, "lang")
      val byte = conv(substring(md5(col("doc_id").cast("string")), 1, 2), 16, 10).cast("int")
      val kept = docs.select(col("lang"), byte.as("b"))
        .join(rates, "lang")
        .filter(col("b") < col("thresh"))
        .groupBy("lang").agg(count(lit(1)).as("n_kept"))
      rates.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_orig"), col("thresh"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    },

    // Per-domain document caps (C4/RefinedWeb domain balancing): at most
    // 10 docs per source, chosen by deterministic md5-of-key order — a
    // reproducible uniform sample of each domain.
    Q("q89_domain_cap",
      """WITH r AS (
        |  SELECT doc_id, source,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INT) AS rk
        |  FROM documents)
        |SELECT doc_id, source, rk FROM r WHERE rk <= 10""".stripMargin) { (s, dir) =>
      Dedup.domainCap(Tables(s, dir, "documents"), "doc_id", "source",
          maxPerDomain = 10)
        .select("doc_id", "source", "rk")
    },

    // Token-budget corpus selection: highest-quality docs whose running
    // token cost stays within a 10k-token budget. The Spark side computes
    // the running sum as a bucketed DISTRIBUTED prefix sum (bucket totals
    // → tiny running-offset window → bucket-parallel local cumsum); the
    // oracle's single global window proves the decomposition exact.
    Q("q90_budget_select",
      """WITH s AS (
        |  SELECT doc_id,
        |    ROUND(
        |      CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        |           x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |        / GREATEST(len(regexp_extract_all(lower(text), '[a-z]+')), 1) * 0.5
        |      + (1 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
        |            / GREATEST(length(text), 1)) * 0.5, 6) AS quality,
        |    CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (SELECT doc_id, quality, n_tokens,
        |        CAST(SUM(n_tokens) OVER (ORDER BY quality DESC, doc_id) AS BIGINT)
        |          AS cum_tokens
        |      FROM s)
        |SELECT doc_id, quality, n_tokens, cum_tokens FROM c
        |WHERE cum_tokens <= 10000""".stripMargin) { (s, dir) =>
      val scored = Tables(s, dir, "documents").select(
        col("doc_id"),
        round(graft.functions.TextFunctions.qualityScore(col("text")), 6)
          .as("quality"),
        size(expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"))
          .cast("long").as("n_tokens"))
      Dedup.budgetSelect(scored, "doc_id", "quality", "n_tokens",
          budget = 10000L)
        .withColumnRenamed("cum", "cum_tokens")
    },

    // Test-set decontamination: every doc with doc_id % 10 = 0 is "held
    // out"; any doc (including near-dups planted in the corpus) sharing
    // an 8-gram with the held-out set is flagged. The real pipeline step
    // before training-set publication (C4/Dolma both ship it).
    Q("q82_decontaminate",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |         doc_id % 10 = 0 AS is_test
        |  FROM documents),
        |ft AS (SELECT * FROM toks WHERE len(t) >= 8),
        |grams AS (
        |  SELECT doc_id, is_test,
        |    unnest(list_distinct(list_transform(
        |      generate_series(0, greatest(len(t) - 8, 0)),
        |      i -> array_to_string(t[i+1:i+8], ' ')))) AS ng
        |  FROM ft),
        |tg AS (SELECT DISTINCT ng FROM grams WHERE is_test),
        |sh AS (SELECT g.doc_id, COUNT(DISTINCT g.ng) AS n_shared
        |       FROM grams g JOIN tg USING (ng) GROUP BY g.doc_id)
        |SELECT d.doc_id, CAST(COALESCE(sh.n_shared, 0) AS BIGINT) AS n_shared,
        |       COALESCE(sh.n_shared, 0) > 0 AS contaminated
        |FROM documents d LEFT JOIN sh ON d.doc_id = sh.doc_id""".stripMargin) { (s, dir) =>
      Dedup.decontaminateNgrams(
        Tables(s, dir, "documents"), "doc_id", "text",
        isTest = pmod(col("doc_id"), lit(10)) === 0, n = 8)
    },

    // End-to-end fuzzy dedup (the SlimPajama/RefinedWeb near-dup removal
    // pipeline): MinHash→LSH candidates → exact shingle-Jaccard
    // verification at ≥ 1/2 (integer cross-multiply, no float edge) →
    // connected components over the verified near-dup graph → min-id
    // canonical per cluster. The oracle replays the LSH banding (q33's
    // CTEs), verifies candidates relationally, and closes clusters with a
    // recursive min-reachability CTE.
    Q("q91_fuzzy_dedup",
      s"""$fuzzyCcCtes
        |SELECT d.doc_id,
        |       COALESCE(cc.cluster, d.doc_id) AS cluster,
        |       COALESCE(cc.cluster, d.doc_id) = d.doc_id AS keep
        |FROM documents d LEFT JOIN cc ON d.doc_id = cc.id""".stripMargin) { (s, dir) =>
      Dedup.fuzzyDedup(s, Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, jaccNum = 1, jaccDen = 2)
    },

    // Leakage-safe split: near-dup CLUSTERS (q91's components), not
    // documents, are hash-assigned to train/val/test — near-identical
    // docs can never straddle the boundary (the contamination mode a
    // doc-keyed split like q73 permits). Oracle = q91's banding +
    // recursive-CC chain + the q73 md5-byte split on the cluster id.
    Q("q130_leakage_safe_split",
      s"""$fuzzyCcCtes,
        |asg AS (
        |  SELECT d.doc_id, COALESCE(cc.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id)
        |SELECT doc_id, cluster,
        |  CASE WHEN
        |    (CAST(strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |     + CAST(strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 2, 1)) - 1 AS INT)) < 205
        |    THEN 'train'
        |  WHEN
        |    (CAST(strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |     + CAST(strpos('0123456789abcdef', substr(md5(CAST(cluster AS VARCHAR)), 2, 1)) - 1 AS INT)) < 230
        |    THEN 'val' ELSE 'test' END AS split
        |FROM asg""".stripMargin) { (s, dir) =>
      Dedup.leakageSafeSplit(s, Tables(s, dir, "documents"), "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, jaccNum = 1, jaccDen = 2)
    },

    // Incremental ingest dedup: the doc_id%10=0 "daily batch" checked
    // against the rest of the corpus as the accumulated index — band
    // equi-join (batch-sized cost), exact-Jaccard verify, smallest
    // existing dup id per new doc. Never batch×batch or index×index.
    Q("q132_incremental_neardup",
      incrementalNearDupOracle()) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      BandIndex.checkOnce(
        newDocs = docs.filter(col("doc_id") % 10 === 0),
        corpus = docs.filter(col("doc_id") % 10 =!= 0),
        BandIndexConfig("doc_id", "text"))
    },

    // q132 with the corpus band index MAINTAINED as a bucketed table
    // (bucketBy on band_key): the index's bucket layout satisfies the
    // band join's distribution, so the 100 TB incremental path pays
    // ZERO index-side exchange per daily batch — the index shuffle was
    // paid once at write time (PlanSpec asserts the plan shape). Same
    // oracle as q132: the index representation must be invisible.
    Q("q141_neardup_bucketed_index",
      incrementalNearDupOracle()) { (s, dir) =>
      val tbl = dropIndexTable(s, dir, "graft_band_idx")
      val docs = Tables(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") % 10 =!= 0)
      val idx = BandIndex.build(s, tbl, corpus, BandIndexConfig("doc_id", "text"))
      idx.checkBatch(docs.filter(col("doc_id") % 10 === 0), corpus)
    },

    // The band index MAINTAINED across ingest days (the q141 read side's
    // missing write half): day-0 corpus builds the bucketed index, day-1's
    // batch is deduped against it and its bands are APPENDED (batch-sized,
    // bucket-layout-preserving), day-2's batch is deduped against the
    // GROWN index — its dup hits against day-1 docs are only reachable
    // through the appended bands. The oracle sees just the final
    // semantics: day-2 vs everything older. PlanSpec's two-batch case
    // asserts the appended index STILL joins with zero index-side
    // exchange.
    Q("q152_band_index_append",
      incrementalNearDupOracle(newPred = "% 3 = 2", oldPred = "% 3 <> 2")) { (s, dir) =>
      val tbl = dropIndexTable(s, dir, "graft_band_idx_app")
      val docs = Tables(s, dir, "documents")
      val day0 = docs.filter(col("doc_id") % 3 === 0)
      val day1 = docs.filter(col("doc_id") % 3 === 1)
      val day2 = docs.filter(col("doc_id") % 3 === 2)
      val idx = BandIndex.build(s, tbl, day0, BandIndexConfig("doc_id", "text"))
      // day-1 ingest: dedup against the index, then fold its bands in
      idx.checkBatch(day1, day0).count()
      idx.append(day1)
      // day-2 ingest sees day-0 AND day-1 through the one grown index —
      // re-OPENED from the stored meta, proving the any-session path
      BandIndex.open(s, tbl)
        .checkBatch(day2, docs.filter(col("doc_id") % 3 =!= 2))
    },

    // COMPACT the maintained band index (round 14): q152's grow flow
    // with BandIndex.compact() after the day-1 fold — compaction is a
    // pure physical rewrite back to one file per bucket (each append
    // adds `buckets` files; N daily batches = N·buckets-file scans), so
    // day-2's check is bit-identical and the oracle is q152's verbatim.
    // The layout properties (file shrink, zero index-side exchange
    // after compaction) are pinned engine-side in DedupSpec/PlanSpec.
    Q("q180_band_index_compact",
      incrementalNearDupOracle(newPred = "% 3 = 2", oldPred = "% 3 <> 2")) { (s, dir) =>
      val tbl = dropIndexTable(s, dir, "graft_band_idx_cmp")
      val docs = Tables(s, dir, "documents")
      val day0 = docs.filter(col("doc_id") % 3 === 0)
      val day1 = docs.filter(col("doc_id") % 3 === 1)
      val day2 = docs.filter(col("doc_id") % 3 === 2)
      val idx = BandIndex.build(s, tbl, day0, BandIndexConfig("doc_id", "text"))
      idx.checkBatch(day1, day0).count()
      idx.append(day1)
      idx.compact()
      BandIndex.open(s, tbl)
        .checkBatch(day2, docs.filter(col("doc_id") % 3 =!= 2))
    },

    // Weighted sampling without replacement (Efraimidis–Spirakis A-ES):
    // 100 docs drawn proportional to length (n_chars) — the
    // quality/size-weighted reproducible subsample a mixture builder
    // takes per source. Key = ln(u)/w with u from md5(id:seed); the
    // oracle replays hash, key, and the top-n order bit-for-bit.
    Q("q155_weighted_sample",
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    list_reduce(list_transform(generate_series(1, 12),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5(CAST(doc_id AS VARCHAR) || ':42'), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS hv
        |  FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, n_chars,
        |        ln(CAST(hv + 1 AS DOUBLE) / 281474976710656.0)
        |          / CAST(n_chars AS DOUBLE) AS skey
        |      FROM h)
        |SELECT doc_id, n_chars FROM k ORDER BY skey DESC, doc_id LIMIT 100""".stripMargin) { (s, dir) =>
      Dedup.weightedSample(
        Tables(s, dir, "documents").select("doc_id", "n_chars"),
        "doc_id", "n_chars", n = 100, seed = 42L)
        .select("doc_id", "n_chars")
    },

    // Per-stratum weighted quotas: 20 docs PER LANGUAGE drawn
    // proportional to n_chars in one pass — q89's per-domain cap shape
    // with A-ES weight-proportional picks instead of hash-arbitrary
    // ones; the per-source sampling step of mixture construction.
    Q("q160_weighted_sample_per_group",
      """WITH h AS (
        |  SELECT doc_id, lang, n_chars,
        |    list_reduce(list_transform(generate_series(1, 12),
        |      i -> CAST(strpos('0123456789abcdef',
        |             substr(md5(CAST(doc_id AS VARCHAR) || ':7'), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS hv
        |  FROM documents WHERE n_chars > 0),
        |k AS (SELECT doc_id, lang, n_chars,
        |        ln(CAST(hv + 1 AS DOUBLE) / 281474976710656.0)
        |          / CAST(n_chars AS DOUBLE) AS skey
        |      FROM h),
        |r AS (SELECT doc_id, lang, n_chars,
        |        row_number() OVER (PARTITION BY lang ORDER BY skey DESC, doc_id) AS rn
        |      FROM k)
        |SELECT lang, doc_id, n_chars FROM r WHERE rn <= 20""".stripMargin) { (s, dir) =>
      Dedup.weightedSamplePerGroup(
        Tables(s, dir, "documents").select("doc_id", "lang", "n_chars"),
        "doc_id", "n_chars", groupCols = Seq("lang"), nPerGroup = 20, seed = 7L)
        .select("lang", "doc_id", "n_chars")
    },

    // Dedup resolution: q91's near-dup clusters resolved to a CANONICAL
    // copy by quality (longest text, ties to the smaller id) — the
    // keep-the-best-copy step real pipelines run instead of keeping the
    // arbitrary min-id member. Oracle = the shared fuzzy-CC chain + a
    // per-cluster quality argmax window.
    Q("q163_dedup_canonical",
      s"""$fuzzyCcCtes,
        |asg AS (
        |  SELECT d.doc_id, d.n_chars, COALESCE(cc.cluster, d.doc_id) AS cluster
        |  FROM documents d LEFT JOIN cc ON d.doc_id = cc.id),
        |canon AS (SELECT cluster, doc_id AS canonical_id FROM (
        |  SELECT cluster, doc_id, row_number() OVER (
        |    PARTITION BY cluster ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM asg) t WHERE rn = 1)
        |SELECT a.doc_id, a.cluster, c.canonical_id,
        |       a.doc_id = c.canonical_id AS keep
        |FROM asg a JOIN canon c USING (cluster)""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val asg = Dedup.fuzzyDedup(s, docs, "doc_id", "text",
          shingleN = 3, numHashes = 16, bands = 4, jaccNum = 1, jaccDen = 2)
        .select("doc_id", "cluster")
        .join(docs.select("doc_id", "n_chars"), "doc_id")
      Dedup.canonicalPerCluster(asg, "cluster", "doc_id", "n_chars")
    },

    // Cross-source contamination matrix: distinct 8-gram overlap +
    // containment between every source pair — the leak audit before
    // corpus mixing (q82's decontamination generalized from one
    // held-out set to all pairs). Work = |distinct grams| + |matches|;
    // per-gram fan-out bounded by C(|sources|,2).
    Q("q162_cross_source_overlap",
      """WITH tk AS (
        |  SELECT source, regexp_extract_all(lower(text), '[a-z0-9]+') AS t
        |  FROM documents),
        |g AS (
        |  SELECT DISTINCT source,
        |    unnest(list_transform(generate_series(1, len(t) - 7),
        |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] || ' ' ||
        |           t[i+4] || ' ' || t[i+5] || ' ' || t[i+6] || ' ' || t[i+7])) AS ng
        |  FROM tk WHERE len(t) >= 8),
        |tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS tot FROM g GROUP BY source),
        |p AS (SELECT a.source AS source_a, b.source AS source_b,
        |        CAST(COUNT(*) AS BIGINT) AS shared_ngrams
        |      FROM g a JOIN g b ON a.ng = b.ng AND a.source < b.source
        |      GROUP BY 1, 2)
        |SELECT p.source_a, p.source_b, p.shared_ngrams,
        |  ta.tot AS tot_a, tb.tot AS tot_b,
        |  ROUND(CAST(p.shared_ngrams AS DOUBLE) / ta.tot, 6) AS containment_a,
        |  ROUND(CAST(p.shared_ngrams AS DOUBLE) / tb.tot, 6) AS containment_b
        |FROM p JOIN tot ta ON p.source_a = ta.source
        |       JOIN tot tb ON p.source_b = tb.source""".stripMargin) { (s, dir) =>
      Dedup.crossSourceNgramOverlap(
        Tables(s, dir, "documents"), "source", "text", n = 8)
    },

    // Substring-level duplicate spans (Lee et al. 2022 exact-substring
    // dedup): 50-char windows at stride 25, duplicated = same text in
    // ≥2 docs, overlapping windows merged to maximal per-doc spans.
    // Catches verbatim boilerplate doc-level MinHash misses. Summary
    // per affected doc keeps the result small and totally ordered.
    Q("q136_duplicate_spans",
      """WITH w AS (
        |  SELECT doc_id, i AS pos, substr(text, CAST(i + 1 AS INT), 50) AS win
        |  FROM documents,
        |       LATERAL unnest(generate_series(0, CAST(length(text) AS BIGINT) - 50, 25)) AS t(i)
        |  WHERE length(text) >= 50),
        |dup AS (SELECT win FROM w GROUP BY win HAVING COUNT(DISTINCT doc_id) >= 2),
        |m AS (SELECT doc_id, pos AS s, pos + 50 AS e FROM w JOIN dup USING (win)),
        |o AS (SELECT doc_id, s, e,
        |        MAX(e) OVER (PARTITION BY doc_id ORDER BY s
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS me
        |      FROM m),
        |isl AS (SELECT doc_id, s, e,
        |          SUM(CASE WHEN me IS NULL OR s > me THEN 1 ELSE 0 END)
        |            OVER (PARTITION BY doc_id ORDER BY s) AS island
        |        FROM o),
        |sp AS (SELECT doc_id, MIN(s) AS ss, MAX(e) AS se
        |       FROM isl GROUP BY doc_id, island)
        |SELECT doc_id, COUNT(*) AS n_dup_spans,
        |       CAST(SUM(se - ss) AS BIGINT) AS dup_chars
        |FROM sp GROUP BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.duplicateSpans(Tables(s, dir, "documents"), "doc_id", "text",
          winLen = 50, stride = 25)
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_dup_spans"),
          sum(col("span_end") - col("span_start")).as("dup_chars"))
    },

    // End-to-end curation funnel — the module kernels composed the way a
    // production pretraining pipeline chains them, reported as per-stage
    // survivor counts: language+quality gate → exact dedup →
    // decontamination (held-out = doc_id%10=0) → reproducible train
    // split. Every stage is one of the already-oracled kernels; the
    // funnel proves they compose.
    Q("q106_curation_pipeline",
      """WITH sc AS (
        |  SELECT doc_id, lang, text,
        |    ROUND(
        |      CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        |           x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |        / GREATEST(len(regexp_extract_all(lower(text), '[a-z]+')), 1) * 0.5
        |      + (1 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
        |            / GREATEST(length(text), 1)) * 0.5, 6) AS q
        |  FROM documents),
        |s1 AS (SELECT doc_id, text FROM sc WHERE lang = 'en' AND q >= 0.52),
        |keep AS (SELECT MIN(doc_id) AS doc_id FROM s1 GROUP BY sha256(text)),
        |s2 AS (SELECT s1.doc_id, s1.text FROM s1 JOIN keep USING (doc_id)),
        |toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |                doc_id % 10 = 0 AS is_test
        |         FROM s2),
        |grams AS (
        |  SELECT doc_id, is_test,
        |    unnest(list_distinct(list_transform(
        |      generate_series(0, greatest(len(t) - 8, 0)),
        |      i -> array_to_string(t[i+1:i+8], ' ')))) AS ng
        |  FROM toks WHERE len(t) >= 8),
        |tg AS (SELECT DISTINCT ng FROM grams WHERE is_test),
        |cont AS (SELECT DISTINCT g.doc_id FROM grams g JOIN tg USING (ng)),
        |s3 AS (SELECT s2.doc_id, s2.text FROM s2
        |       WHERE s2.doc_id % 10 <> 0
        |         AND s2.doc_id NOT IN (SELECT doc_id FROM cont)),
        |s4 AS (SELECT doc_id FROM s3
        |       WHERE (CAST(strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |              + CAST(strpos('0123456789abcdef',
        |                substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT)) < 205)
        |SELECT '1_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
        |UNION ALL SELECT '2_quality', COUNT(*) FROM s1
        |UNION ALL SELECT '3_exact_dedup', COUNT(*) FROM s2
        |UNION ALL SELECT '4_decontaminated', COUNT(*) FROM s3
        |UNION ALL SELECT '5_train', COUNT(*) FROM s4""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val s1 = docs.filter(col("lang") === "en" &&
        round(graft.functions.TextFunctions.qualityScore(col("text")), 6) >= 0.52)
      val s2 = s1.join(
        Dedup.exactGroups(s1, "doc_id", "text")
          .select(col("keep_id").as("doc_id")), "doc_id")
      val dec = Dedup.decontaminateNgrams(s2, "doc_id", "text",
        isTest = pmod(col("doc_id"), lit(10)) === 0, n = 8)
      val s3 = s2
        .join(dec.filter(!col("contaminated")).select("doc_id"), "doc_id")
        .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val s4 = s3.filter(Dedup.hashSplit3(col("doc_id")) === "train")
      Seq("1_input" -> docs, "2_quality" -> s1, "3_exact_dedup" -> s2,
          "4_decontaminated" -> s3, "5_train" -> s4)
        .map { case (n, df) =>
          df.agg(count(lit(1)).as("n_docs")).select(lit(n).as("stage"), col("n_docs"))
        }
        .reduce(_ unionByName _)
    },

    // The FULL curation capstone (round-11 verdict item 5) — the
    // brief-level pretraining pipeline end-to-end, every stage one of
    // the already-oracled kernels, reported as per-stage survivor
    // counts: Gopher document-quality rules → MinHash-LSH fuzzy dedup →
    // SemDeDup semantic dedup (over the survivors' embeddings,
    // vec_id = doc_id) → 8-gram test-set decontamination → per-language
    // mixture sampling → greedy sequence packing (stage 7 counts packed
    // BINS, the training-sequence unit). This is q106's funnel widened
    // to the full reference-pipeline story: where q106 gates on the
    // composite quality score and exact hashes, this runs the Gopher
    // rule set and BOTH near-dup modes (lexical + semantic) before the
    // decontaminate/sample/pack tail. Gopher thresholds are corpus-
    // tuned: the synthetic vocabulary hits at most one of the eight
    // Gopher stop words, so the stop rule gates at >= 1 distinct hit
    // (>= 2 keeps zero docs — the rule would erase the funnel, not
    // exercise it); every other threshold is Rae et al. 2021 §A1.1's.
    // Oracle composes the stage CTEs already proven one-by-one
    // (q123/q91/q143/q82/q78/q83), each re-rooted at the previous
    // stage's survivor CTE.
    Q("q177_curation_capstone",
      s"""WITH RECURSIVE gw AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '\\S+') AS words,
        |    length(regexp_replace(text, '\\s+', '', 'g')) AS n_chars,
        |    len(regexp_extract_all(text, '#|\\.\\.\\.|…')) AS n_sym,
        |    string_split(text, chr(10)) AS lines,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |gc AS (
        |  SELECT doc_id,
        |    len(words) AS n_words_raw,
        |    GREATEST(len(words), 1) AS nw,
        |    n_chars, n_sym,
        |    GREATEST(len(lines), 1) AS nl,
        |    len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS n_bullet,
        |    len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$$'))) AS n_ellip,
        |    len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
        |    len(list_filter(['and','be','have','of','that','the','to','with'],
        |        s -> list_contains(toks, s))) AS n_stop_hits
        |  FROM gw),
        |s2 AS (
        |  SELECT d.doc_id, d.lang, d.source, d.text
        |  FROM documents d JOIN gc USING (doc_id)
        |  WHERE gc.n_words_raw BETWEEN 50 AND 100000
        |    AND ROUND(CAST(gc.n_chars AS DOUBLE) / gc.nw, 6) BETWEEN 3.0 AND 10.0
        |    AND ROUND(CAST(gc.n_sym AS DOUBLE) / gc.nw, 6) <= 0.1
        |    AND ROUND(CAST(gc.n_bullet AS DOUBLE) / gc.nl, 6) <= 0.1
        |    AND ROUND(CAST(gc.n_ellip AS DOUBLE) / gc.nl, 6) <= 0.3
        |    AND ROUND(CAST(gc.n_alpha AS DOUBLE) / gc.nw, 6) >= 0.8
        |    AND gc.n_stop_hits >= 1),
        |${fuzzyCcBody("s2")},
        |s3 AS (SELECT s2.doc_id, s2.lang, s2.source, s2.text
        |       FROM s2 LEFT JOIN cc ON s2.doc_id = cc.id
        |       WHERE COALESCE(cc.cluster, s2.doc_id) = s2.doc_id),
        |sememb AS (SELECT e.vec_id, e.embedding
        |           FROM embeddings e JOIN s3 ON e.vec_id = s3.doc_id),
        |${VectorQueries.kmeansCtes(8, 2, sfx = "sd", srcFrom = "sememb")},
        |sdasg AS (SELECT vec_id, cid AS cluster FROM asd2),
        |sdvr AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |         FROM sememb),
        |sdnr AS (SELECT vec_id, v,
        |           sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS nrm
        |         FROM sdvr),
        |sdpp AS MATERIALIZED (
        |  SELECT x.vec_id AS src, y.vec_id AS dst
        |  FROM sdnr x JOIN sdasg cx ON x.vec_id = cx.vec_id
        |       JOIN sdasg cy ON cx.cluster = cy.cluster
        |       JOIN sdnr y ON y.vec_id = cy.vec_id AND x.vec_id < y.vec_id
        |  WHERE list_reduce(list_transform(generate_series(1, 64), d -> x.v[d] * y.v[d]),
        |          (p, q) -> p + q) / (x.nrm * y.nrm) >= 0.35),
        |sdund AS (SELECT src, dst FROM sdpp UNION ALL SELECT dst AS src, src AS dst FROM sdpp),
        |sdreach AS (SELECT src AS id, src AS comp FROM sdund
        |            UNION
        |            SELECT u.src AS id, r.comp FROM sdund u JOIN sdreach r ON u.dst = r.id),
        |sdcc AS (SELECT id, MIN(comp) AS comp FROM sdreach GROUP BY id),
        |s4 AS (SELECT s3.doc_id, s3.lang, s3.source, s3.text
        |       FROM s3 LEFT JOIN sdcc ON s3.doc_id = sdcc.id
        |       WHERE COALESCE(sdcc.comp, s3.doc_id) = s3.doc_id),
        |dtoks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
        |                 doc_id % 10 = 0 AS is_test
        |          FROM s4),
        |dgrams AS (
        |  SELECT doc_id, is_test,
        |    unnest(list_distinct(list_transform(
        |      generate_series(0, greatest(len(t) - 8, 0)),
        |      i -> array_to_string(t[i+1:i+8], ' ')))) AS ng
        |  FROM dtoks WHERE len(t) >= 8),
        |dtg AS (SELECT DISTINCT ng FROM dgrams WHERE is_test),
        |dcont AS (SELECT DISTINCT g.doc_id FROM dgrams g JOIN dtg USING (ng)),
        |s5 AS (SELECT s4.doc_id, s4.lang, s4.source, s4.text FROM s4
        |       WHERE s4.doc_id % 10 <> 0
        |         AND s4.doc_id NOT IN (SELECT doc_id FROM dcont)),
        |s6k AS (
        |  SELECT doc_id, lang, source, text FROM (
        |    SELECT doc_id, lang, source, text,
        |      (CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1 AS INT) * 16
        |       + CAST(strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1 AS INT)) AS b
        |    FROM s5) t
        |  WHERE b < CASE lang WHEN 'en' THEN 230 WHEN 'de' THEN 128
        |                      WHEN 'es' THEN 96 WHEN 'fr' THEN 64 ELSE 32 END),
        |${TextQueries.packingBody("s6k")},
        |pbins AS (SELECT DISTINCT source, bin FROM steps WHERE rn >= 1)
        |SELECT '1_input' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM documents
        |UNION ALL SELECT '2_gopher', COUNT(*) FROM s2
        |UNION ALL SELECT '3_fuzzy_dedup', COUNT(*) FROM s3
        |UNION ALL SELECT '4_semdedup', COUNT(*) FROM s4
        |UNION ALL SELECT '5_decontaminated', COUNT(*) FROM s5
        |UNION ALL SELECT '6_mixture', COUNT(*) FROM s6k
        |UNION ALL SELECT '7_packed_bins', COUNT(*) FROM pbins""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val gate = graft.text.TextStats.gopherRules(docs, "doc_id", "text")
        .filter(col("n_words").between(50L, 100000L) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("symbol_ratio") <= 0.1 && col("bullet_frac") <= 0.1 &&
          col("ellipsis_frac") <= 0.3 && col("alpha_frac") >= 0.8 &&
          col("n_stop_hits") >= 1)
        .select("doc_id")
      // each stage boundary is localCheckpointed: the survivor frame
      // feeds BOTH the next stage's kernel (two of which run their own
      // iterative CC loops on top of it) and its own survivor count —
      // caching alone keeps the DATA but not the PLAN, and the chained
      // lineage made every downstream analysis walk the whole funnel
      // tree (measured 27.5 s vs ~14 s component-sum at sf0.1; a 200M-
      // char analyzed plan by stage 7). The checkpoint is exactly where
      // a production pipeline would materialize between stages anyway.
      val s2 = docs.join(gate, "doc_id").localCheckpoint()
      val fd = Dedup.fuzzyDedup(s, s2, "doc_id", "text",
        shingleN = 3, numHashes = 16, bands = 4, jaccNum = 1, jaccDen = 2)
      val s3 = s2.join(fd.filter(col("keep")).select("doc_id"), "doc_id")
        .localCheckpoint()
      val emb3 = Tables(s, dir, "embeddings")
        .join(s3.select(col("doc_id").as("vec_id")), "vec_id")
      val sd = graft.vector.Similarity.semDedup(emb3, "vec_id", "embedding",
        k = 8, iters = 2, tau = 0.35)
      // anti-join the PROVEN dups, not inner-join the survivors: a doc
      // with no embedding row can't be a semantic dup and must pass the
      // stage (the oracle's LEFT JOIN + COALESCE keep rule). The inner-
      // join form silently dropped every non-embedded fuzzy survivor —
      // invisible at sf0.01 where embeddings cover all docs, wrong at
      // sf0.1 where only 2,000 of 5,000 docs are embedded (round-12
      // review; the gate now also runs q177 at sf0.1).
      val s4 = s3.join(sd.filter(col("is_dup"))
        .select(col("vec_id").as("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val dec = Dedup.decontaminateNgrams(s4, "doc_id", "text",
        isTest = pmod(col("doc_id"), lit(10)) === 0, n = 8)
      val s5 = s4.join(dec.filter(!col("contaminated")).select("doc_id"), "doc_id")
        .filter(pmod(col("doc_id"), lit(10)) =!= 0).localCheckpoint()
      val s6 = s5.filter(Dedup.mixtureKeep(col("doc_id"), col("lang"),
        Map("en" -> 230, "de" -> 128, "es" -> 96, "fr" -> 64),
        defaultRate256 = 32)).localCheckpoint()
      val pbins = graft.text.Packing.packGreedy(
        s6.select(col("source"), col("doc_id"),
          size(Dedup.wordTokens(col("text"))).as("n_tokens")),
        "source", "doc_id", "n_tokens", budget = 128).toDF()
        .select("source", "bin").distinct()
      Seq(
        "1_input" -> docs, "2_gopher" -> s2, "3_fuzzy_dedup" -> s3,
        "4_semdedup" -> s4, "5_decontaminated" -> s5, "6_mixture" -> s6,
        "7_packed_bins" -> pbins)
        .map { case (nm, df) =>
          df.agg(count(lit(1)).as("n")).select(lit(nm).as("stage"), col("n"))
        }
        .reduce(_ unionByName _)
    },
  )

  /** Shared q91/q130/q163 oracle prefix: MinHash banding, candidate
    * generation, exact-Jaccard verify, and the near-dup components as a
    * min-reachability recursive CTE, ending at `cc(id, cluster)`. */
  private def fuzzyCcCtes: String = "WITH RECURSIVE " + fuzzyCcBody("documents")

  /** [[fuzzyCcCtes]]' body without the WITH prefix, rooted at any
    * (doc_id, text) CTE — q177 composes it mid-funnel over the Gopher
    * survivors instead of the raw corpus. */
  private def fuzzyCcBody(docsFrom: String): String =
    s"""toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM $docsFrom),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(t) - 2),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |    FROM toks WHERE len(t) >= 3)),
        |hh AS (
        |  SELECT doc_id,
        |    list_reduce(list_transform(generate_series(1, 12),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_transform(generate_series(13, 24),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) * 2 + 1 AS h2
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS mh
        |  FROM hh CROSS JOIN range(16) r(i) GROUP BY doc_id, i),
        |bk AS (
        |  SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS band_key
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key
        |  WHERE a.doc_id < b.doc_id),
        |ssize AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |ins AS (
        |  SELECT c.id_a, c.id_b, COUNT(*) AS i
        |  FROM cand c JOIN sh a ON a.doc_id = c.id_a
        |              JOIN sh b ON b.doc_id = c.id_b AND b.s = a.s
        |  GROUP BY c.id_a, c.id_b),
        |ver AS (
        |  SELECT ins.id_a, ins.id_b
        |  FROM ins JOIN ssize sa ON sa.doc_id = ins.id_a
        |           JOIN ssize sb ON sb.doc_id = ins.id_b
        |  WHERE ins.i * 2 >= (sa.n + sb.n - ins.i) * 1),
        |und AS (SELECT id_a AS s, id_b AS d FROM ver
        |        UNION ALL SELECT id_b AS s, id_a AS d FROM ver),
        |reach AS (SELECT s AS id, s AS comp FROM und
        |          UNION
        |          SELECT u.s AS id, r.comp FROM und u JOIN reach r ON u.d = r.id),
        |cc AS (SELECT id, MIN(comp) AS cluster FROM reach GROUP BY id)""".stripMargin

  /** Drop-and-clean a managed index table (warehouse dir can outlive the
    * in-memory catalog — the q105 lesson); returns the per-sf table name. */
  private def dropIndexTable(s: org.apache.spark.sql.SparkSession,
      dir: String, prefix: String): String = {
    val tbl = s"${prefix}_${dir.replaceAll("[^a-zA-Z0-9]", "_")}"
    graft.sinks.ManagedTables.dropTableAndLocation(s, tbl)
    tbl
  }

  /** Shared by q132 (recomputed index), q141 (maintained bucketed index)
    * and q152 (appended index): the engine-side index representation must
    * be invisible in results, so all replay the same DuckDB computation,
    * parametrized only by which docs are "new" vs "already ingested". */
  private def incrementalNearDupOracle(
      newPred: String = "% 10 = 0", oldPred: String = "% 10 <> 0"): String =
    s"""WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |sh AS (
        |  SELECT DISTINCT doc_id, s FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(t) - 2),
        |             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
        |    FROM toks WHERE len(t) >= 3)),
        |hh AS (
        |  SELECT doc_id,
        |    list_reduce(list_transform(generate_series(1, 12),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) AS h1,
        |    list_reduce(list_transform(generate_series(13, 24),
        |      i -> CAST(strpos('0123456789abcdef', substr(md5(s), i, 1)) - 1 AS BIGINT)),
        |      (a, b) -> a * 16 + b) * 2 + 1 AS h2
        |  FROM sh),
        |sig AS (
        |  SELECT doc_id, i, MIN((h1 + i * h2) % 281474976710656) AS mh
        |  FROM hh CROSS JOIN range(16) r(i) GROUP BY doc_id, i),
        |bk AS (
        |  SELECT doc_id, i // 4 AS band,
        |         md5(string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i)) AS band_key
        |  FROM sig GROUP BY doc_id, i // 4),
        |cand AS (
        |  SELECT DISTINCT a.doc_id AS new_id, b.doc_id AS old_id
        |  FROM bk a JOIN bk b ON a.band = b.band AND a.band_key = b.band_key
        |  WHERE a.doc_id $newPred AND b.doc_id $oldPred),
        |ssize AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
        |ins AS (
        |  SELECT c.new_id, c.old_id, COUNT(*) AS i
        |  FROM cand c JOIN sh a ON a.doc_id = c.new_id
        |              JOIN sh b ON b.doc_id = c.old_id AND b.s = a.s
        |  GROUP BY c.new_id, c.old_id),
        |dup AS (
        |  SELECT ins.new_id, MIN(ins.old_id) AS dup_of
        |  FROM ins JOIN ssize sa ON sa.doc_id = ins.new_id
        |           JOIN ssize sb ON sb.doc_id = ins.old_id
        |  WHERE ins.i * 2 >= (sa.n + sb.n - ins.i) * 1
        |  GROUP BY ins.new_id)
        |SELECT d.doc_id, dup.dup_of IS NOT NULL AS is_dup, dup.dup_of
        |FROM documents d LEFT JOIN dup ON d.doc_id = dup.new_id
        |WHERE d.doc_id $newPred""".stripMargin

}
