package graft.queries

import graft.{Q, Tables}
import graft.functions.{TextExpressions, TextFunctions => T}
import graft.text.{Chunker, Packing, Sections, TextStats}
import org.apache.spark.sql.functions._

/** Text/RAG-layer queries (SURVEY §2.9, §2.13 generators; plus the
  * text-analysis ops from the brief: token counting, quality scoring,
  * language-ID, fingerprinting). Oracles use RE2-safe regexes so the same
  * pattern runs on DuckDB.
  */
object TextQueries {

  val all: Seq[Q] = Seq(

    // Token counting (whitespace + BPE-ish regex) and md5 fingerprint.
    Q("q22_doc_stats",
      """SELECT doc_id, length(text) AS n_chars,
        |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
        |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS INT) AS n_bpe_tokens,
        |  md5(text) AS fp_md5
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        length(col("text")).as("n_chars"),
        T.tokenCount(col("text")).as("n_tokens"),
        T.bpeTokenCount(col("text")).as("n_bpe_tokens"),
        md5(col("text")).as("fp_md5"))
    },

    // T3 chunker (fixed window, 200 chars / 50 overlap) as a Dataset
    // flatMap generator; the closed-form boundaries make it oracle-able.
    Q("q23_chunk_fixed",
      """WITH d AS (
        |  SELECT doc_id, text,
        |    GREATEST(1, CAST(CEIL((length(text) - 50) / 150.0) AS BIGINT)) AS n_chunks
        |  FROM documents),
        |idx AS (SELECT doc_id, text, n_chunks,
        |        unnest(generate_series(0, n_chunks - 1)) AS i FROM d)
        |SELECT doc_id, i AS chunk_index,
        |  doc_id || '_chunk_' || (i + 1) AS chunk_id,
        |  substr(text, CAST(i * 150 + 1 AS INT), 200) AS chunk, n_chunks
        |FROM idx""".stripMargin) { (s, dir) =>
      Chunker.explode(Tables(s, dir, "documents"), size = 200, overlap = 50)
        .select(
          col("doc_id"), col("chunk_index").cast("long").as("chunk_index"),
          col("chunk_id"), col("chunk"), col("n_chunks").cast("long").as("n_chunks"))
    },

    // T3 tokenizer calibration: the BPE-proxy token measure the RAG
    // chunker budgets by (Chunker.proxyTokenLen — alnum runs at
    // ceil(len/6) + 1/punctuation char), plus the closed-form
    // token-window chunk count at the reference's 2048/512 parameters.
    // The proxy is regex-replicable in both engines, so the oracle
    // proves the Scala kernel and a pure-SQL reading agree token-for-
    // token; the data-dependent greedy boundaries themselves are
    // covered by ChunkerSpec/KernelProps.
    Q("q135_token_budget",
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS t
        |  FROM documents),
        |agg AS (
        |  SELECT doc_id,
        |         CAST(SUM(CASE WHEN regexp_matches(t, '^[A-Za-z0-9]')
        |                       THEN CEIL(LENGTH(t) / 6.0) ELSE 1 END) AS BIGINT) AS n_tokens
        |  FROM toks GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens,
        |       GREATEST(1, CAST(CEIL((COALESCE(a.n_tokens, 0) - 512) / 1536.0) AS BIGINT)) AS n_chunks
        |FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id""".stripMargin) { (s, dir) =>
      import s.implicits._
      Tables(s, dir, "documents").select("doc_id", "text").as[(Long, String)]
        .map { case (id, text) =>
          val t = Chunker.proxyTokenLen(Option(text).getOrElse(""))
          (id, t.toLong,
            Chunker.nChunks(t, Chunker.RagSizeTokens, Chunker.RagOverlapTokens).toLong)
        }
        .toDF("doc_id", "n_tokens", "n_chunks")
    },

    // Text→graph bridge: vocabulary-capped term co-occurrence edges
    // ranked by exact integer PMI-lift (ppm) — the statistical analog
    // of the reference's entity-link graph build, feeding the same
    // graph/community family. Pair blowup bounded by the vocab cap;
    // decimal-exact arithmetic keeps ranks/hashes engine-identical.
    Q("q137_cooccurrence_pmi",
      """WITH present AS (
        |  SELECT DISTINCT doc_id, t AS term
        |  FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
        |        FROM documents)),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM present GROUP BY term),
        |vocab AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT 150),
        |iv AS (SELECT p.doc_id, p.term, v.df FROM present p JOIN vocab v USING (term)),
        |pairs AS (
        |  SELECT a.term AS x, b.term AS y, COUNT(*) AS n_xy,
        |         MIN(a.df) AS df_x, MIN(b.df) AS df_y
        |  FROM iv a JOIN iv b ON a.doc_id = b.doc_id AND a.term < b.term
        |  GROUP BY a.term, b.term HAVING COUNT(*) >= 2),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT x, y, n_xy, df_x, df_y,
        |       CAST((CAST(n_xy AS HUGEINT) * n_docs * 1000000)
        |            // (CAST(df_x AS HUGEINT) * df_y) AS BIGINT) AS lift_ppm
        |FROM pairs, n
        |ORDER BY lift_ppm DESC, x, y LIMIT 100""".stripMargin) { (s, dir) =>
      TextStats.cooccurrencePmi(Tables(s, dir, "documents"), "doc_id", "text",
        vocabSize = 150, minPairCount = 2, topK = 100)
    },

    // T2 section parser generator. The synthetic corpus has no `== x ==`
    // headers, so the oracle covers the degenerate single-"Introduction"
    // path; header/stop/min-length logic is covered by SectionsSpec.
    Q("q24_sections",
      """SELECT doc_id, 'Introduction' AS section, trim(text) AS content
        |FROM documents WHERE length(trim(text)) >= 30""".stripMargin) { (s, dir) =>
      Sections.explode(Tables(s, dir, "documents")).toDF()
    },

    // T1 normalize (NFKC expression + regex sanitize) + T6 SHA-256. NFKC is
    // identity on this ASCII corpus, letting the regex-only oracle match;
    // Unicode behavior is covered by TextFunctionsSpec.
    Q("q25_normalize",
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(regexp_replace(text, '\\"', '"', 'g'),
        |       '[\n\r]+', ' ', 'g'), '\s+', ' ', 'g')) AS clean,
        |  sha256(trim(regexp_replace(regexp_replace(regexp_replace(text, '\\"', '"', 'g'),
        |       '[\n\r]+', ' ', 'g'), '\s+', ' ', 'g'))) AS digest
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), T.normalizeText(col("text")).as("clean"))
        .withColumn("digest", sha2(col("clean"), 256))
    },

    // T1 fidelity — mojibake repair (the ftfy step). The corpus is ASCII,
    // so the query CONSTRUCTS real mojibake: decorate the cleaned text
    // with non-ASCII punctuation/accents (same literal both engines),
    // mis-decode it UTF-8→latin-1 engine-side (decode∘encode), then run
    // the repair expression. Repair provably inverts the mis-decode in
    // one pass, so the oracle simply emits the decorated clean text —
    // any repair bug hash-mismatches. n_ghost_chars asserts the damage
    // was non-trivial (every multi-byte char gained ghost chars).
    Q("q127_mojibake_repair",
      """SELECT doc_id,
        |  '« ' || trim(regexp_replace(regexp_replace(regexp_replace(text, '\\"', '"', 'g'),
        |       '[\n\r]+', ' ', 'g'), '\s+', ' ', 'g')) || ' — café™ Ÿ»' AS repaired,
        |  CAST(8 AS BIGINT) AS n_ghost_chars
        |FROM documents""".stripMargin) { (s, dir) =>
      val clean = T.normalizeText(col("text"))
      val decorated = concat(lit("« "), clean, lit(" — café™ Ÿ»"))
      val damaged = decode(encode(decorated, "UTF-8"), "ISO-8859-1")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TextExpressions.fixMojibake(damaged, passes = 1).as("repaired"),
        (length(damaged) - length(decorated)).cast("long").as("n_ghost_chars"))
    },

    // Quality scoring: stopword ratio + punctuation ratio composite.
    Q("q26_quality_score",
      """SELECT doc_id, ROUND(
        |  CAST(len(list_filter(regexp_extract_all(lower(text), '[a-z]+'),
        |       x -> x IN ('the','a','of','and','to','in','is','that','it','for'))) AS DOUBLE)
        |    / GREATEST(len(regexp_extract_all(lower(text), '[a-z]+')), 1) * 0.5
        |  + (1 - CAST(len(regexp_extract_all(text, '[^a-zA-Z0-9\s]')) AS DOUBLE)
        |        / GREATEST(length(text), 1)) * 0.5, 6) AS quality
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), round(T.qualityScore(col("text")), 6).as("quality"))
    },

    // Language-ID heuristic (stopword argmax, ties → alphabetically first,
    // 'und' on zero hits). The oracle SQL is GENERATED from the same
    // stopword dictionaries the column expression uses, so the two can
    // never drift.
    Q("q27_lang_id", {
      val scoreRows = T.stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
        val inList = words.map(w => s"'$w'").mkString(", ")
        s"""SELECT doc_id, lang, '$lang' AS cand,
           |  len(list_filter(t, x -> x IN ($inList))) AS score FROM toks""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH toks AS (
         |  SELECT doc_id, lang,
         |    list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS t
         |  FROM documents),
         |sc AS (
         |$scoreRows),
         |best AS (
         |  SELECT doc_id, lang, cand, score,
         |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, cand) AS rn
         |  FROM sc)
         |SELECT doc_id, lang,
         |  CASE WHEN score = 0 THEN 'und' ELSE cand END AS lang_pred
         |FROM best WHERE rn = 1""".stripMargin
    }) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        T.langId(col("text")).as("lang_pred"))
    },

    // T6: content-addressed doc ids (sha256("text-id") prefix,
    // chroma_helpers.py:111-124).
    Q("q28_content_ids",
      """SELECT doc_id, substr(sha256(text || '-' || doc_id), 1, 32) AS content_id
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), T.contentDocId(col("text"), col("doc_id")).as("content_id"))
    },

    // Rolling-hash fingerprint (custom codegen'd Catalyst expression,
    // h = 31·h + byte over Java's wrapping 64-bit longs). The oracle
    // emulates the wrap with HUGEINT mod-2^64 arithmetic and a signed
    // shift — exact on this ASCII corpus (ascii(char) ≡ UTF-8 byte).
    Q("q29_rolling_fingerprint",
      """SELECT doc_id, CAST(
        |  CASE WHEN r >= 9223372036854775808::HUGEINT
        |       THEN r - 18446744073709551616::HUGEINT ELSE r END AS BIGINT) AS fp64
        |FROM (
        |  SELECT doc_id, list_reduce(
        |    list_prepend(CAST(1125899906842597 AS HUGEINT),
        |      list_transform(generate_series(1, length(text)),
        |        i -> CAST(ascii(substr(text, i, 1)) AS HUGEINT))),
        |    (a, b) -> (a * 31 + b) % 18446744073709551616::HUGEINT) AS r
        |  FROM documents)""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextExpressions.rollingHash(col("text")).as("fp64"))
    },

    // N5: ordered-unique + Oxford-comma natural-language join
    // (data_transformation_helpers.py:123-158), per part brand.
    Q("q30_oxford_join",
      """WITH toks AS (
        |  SELECT DISTINCT p_brand, unnest(string_split(p_type, ' ')) AS tok FROM part),
        |agg AS (SELECT p_brand, list_sort(list(tok)) AS arr FROM toks GROUP BY p_brand)
        |SELECT p_brand,
        |  CASE WHEN len(arr) = 1 THEN arr[1]
        |       WHEN len(arr) = 2 THEN arr[1] || ' and ' || arr[2]
        |       ELSE array_to_string(arr[1:len(arr)-1], ', ') || ', and ' || arr[len(arr)]
        |  END AS pretty
        |FROM agg""".stripMargin) { (s, dir) =>
      Tables(s, dir, "part")
        .select(col("p_brand"), explode(split(col("p_type"), " ")).as("tok"))
        .groupBy("p_brand")
        .agg(sort_array(collect_set(col("tok"))).as("arr"))
        .select(col("p_brand"), T.oxfordJoin(col("arr")).as("pretty"))
    },

    // T3 recursive separator-cascade chunker (the reference's actual
    // splitter shape). Boundaries aren't closed-form, but the greedy pack
    // is a per-document left fold, so the oracle replays it as a recursive
    // CTE: state = (next piece index, accumulator, chunk counter), one
    // emitted chunk per overflow plus the final flush. The corpus has no
    // \n / '. ' / '? ' / '! ' separators and no >size words, so the
    // separator cascade reduces to the space split the CTE models (the
    // full cascade is covered by ChunkerSpec).
    Q("q31_chunk_recursive",
      """WITH RECURSIVE
        |base AS (SELECT doc_id, text FROM documents),
        |plist AS (
        |  SELECT doc_id,
        |    CASE WHEN len(text) <= 200 THEN [text]
        |         ELSE list_filter(
        |           list_transform(string_split(text, ' '),
        |             (p, j) -> CASE WHEN j < len(string_split(text, ' '))
        |                            THEN p || ' ' ELSE p END),
        |           p -> p <> '')
        |    END AS pl
        |  FROM base),
        |pieces AS (
        |  SELECT doc_id, u.i AS i, u.p AS piece FROM (
        |    SELECT doc_id,
        |      unnest(list_transform(generate_series(1, len(pl)),
        |        j -> struct_pack(i := j, p := pl[j]))) AS u
        |    FROM plist)),
        |steps AS (
        |  SELECT doc_id, 0 AS i, '' AS cur, 0 AS cno, CAST(NULL AS VARCHAR) AS emitted
        |  FROM base
        |  UNION ALL
        |  SELECT s.doc_id, s.i + 1,
        |    CASE WHEN s.cur <> '' AND len(s.cur) + len(p.piece) > 200
        |         THEN (CASE WHEN len(s.cur) > 50
        |                    THEN substr(s.cur, len(s.cur) - 49) ELSE '' END) || p.piece
        |         ELSE s.cur || p.piece END,
        |    s.cno + CASE WHEN s.cur <> '' AND len(s.cur) + len(p.piece) > 200
        |                 THEN 1 ELSE 0 END,
        |    CASE WHEN s.cur <> '' AND len(s.cur) + len(p.piece) > 200
        |         THEN trim(s.cur) ELSE NULL END
        |  FROM steps s JOIN pieces p ON p.doc_id = s.doc_id AND p.i = s.i + 1),
        |npieces AS (SELECT doc_id, MAX(i) AS n FROM pieces GROUP BY doc_id),
        |finals AS (SELECT s.doc_id, s.cno, 1 AS flag, trim(s.cur) AS chunk
        |           FROM steps s JOIN npieces np ON s.doc_id = np.doc_id AND s.i = np.n
        |           WHERE trim(s.cur) <> ''),
        |emitted AS (SELECT doc_id, cno, 0 AS flag, emitted AS chunk FROM steps
        |            WHERE emitted IS NOT NULL AND emitted <> ''),
        |allc AS (SELECT * FROM emitted UNION ALL SELECT * FROM finals),
        |o AS (SELECT doc_id, chunk,
        |        ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY cno, flag) AS rn,
        |        COUNT(*) OVER (PARTITION BY doc_id) AS cnt
        |      FROM allc)
        |SELECT doc_id, CAST(rn - 1 AS INT) AS chunk_index,
        |       CAST(doc_id AS VARCHAR) || '_chunk_' || CAST(rn AS VARCHAR) AS chunk_id,
        |       chunk, CAST(cnt AS INT) AS n_chunks
        |FROM o""".stripMargin) { (s, dir) =>
      Chunker.explode(Tables(s, dir, "documents"), size = 200, overlap = 50, recursive = true)
        .toDF()
    },

    // Top-5 TF-IDF terms per document (corpus term weighting). The df
    // dimension and N scalar broadcast; the doc-side plan is one explode +
    // two hash aggs + one bounded window. Both sides round(·,6) and order
    // by the ROUNDED score so tie-breaks can't drift on a ulp.
    Q("q75_tfidf_topk",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |scored AS (
        |  SELECT doc_id, term,
        |    ROUND(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / df), 6) AS tfidf
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rn FROM scored)
        |SELECT doc_id, term, tfidf FROM r WHERE rn <= 5""".stripMargin) { (s, dir) =>
      TextStats.tfidfTopK(Tables(s, dir, "documents"), "doc_id", "text", k = 5)
    },

    // Vocabulary build (tokenizer prep): top-30 terms by corpus frequency
    // with doc frequency, deterministic (cf desc, term) rank, and
    // cumulative corpus-coverage fraction. The only non-distributed frames
    // are the 30-row top slice and the 1-row token total.
    Q("q88_vocabulary",
      """WITH toks AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT term, COUNT(*) AS cf, COUNT(DISTINCT doc_id) AS df
        |       FROM toks GROUP BY term),
        |tot AS (SELECT CAST(SUM(cf) AS BIGINT) AS total FROM tf),
        |top AS (SELECT term, cf, df FROM tf ORDER BY cf DESC, term LIMIT 30)
        |SELECT term, cf, df,
        |  CAST(row_number() OVER (ORDER BY cf DESC, term) AS INT) AS rank,
        |  ROUND(CAST(SUM(cf) OVER (ORDER BY cf DESC, term) AS DOUBLE)
        |        / (SELECT total FROM tot), 6) AS coverage
        |FROM top""".stripMargin) { (s, dir) =>
      TextStats.vocabulary(Tables(s, dir, "documents"), "doc_id", "text", topV = 30)
    },

    // Gopher/C4-style repetition signals: distinct-token ratio, top-word
    // fraction, top-bigram fraction — exact integer quotients in double.
    Q("q76_repetition",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS c FROM (
        |         SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY doc_id, tok),
        |ts AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct,
        |              MAX(c) AS top_tok FROM tc GROUP BY doc_id),
        |bg AS (SELECT doc_id, b, COUNT(*) AS c FROM (
        |         SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
        |                       i -> t[i] || ' ' || t[i+1])) AS b
        |         FROM toks WHERE len(t) >= 2) GROUP BY doc_id, b),
        |bs AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bg FROM bg GROUP BY doc_id)
        |SELECT ts.doc_id,
        |  ROUND(CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS distinct_ratio,
        |  ROUND(CAST(top_tok AS DOUBLE) / n_tokens, 6) AS top_word_frac,
        |  ROUND(CAST(COALESCE(top_bg, 0) AS DOUBLE)
        |        / GREATEST(COALESCE(n_bigrams, 0), 1), 6) AS top_bigram_frac
        |FROM ts LEFT JOIN bs USING (doc_id)""".stripMargin) { (s, dir) =>
      TextStats.repetitionSignals(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // C4-style PII scrubbing. The corpus is synthetic word soup, so the
    // query plants a deterministic email + phone per row (derived from
    // doc_id) and proves both get redacted; RE2-safe patterns keep the
    // identical regexes runnable under DuckDB's RE2.
    Q("q77_pii_redact",
      """SELECT doc_id, regexp_replace(regexp_replace(
        |    'Contact u' || CAST(doc_id AS VARCHAR) || '@mail.com or call +1 (555) 010-'
        |      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ', thanks; ' || text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+[0-9]{1,3}( [0-9]{2,4}){2,4}|[0-9]{10,}|\+?([0-9]{1,3}[ .-]?)?\(?[0-9]{3}\)?[ .-]?[0-9]{3}[ .-]?[0-9]{4}', '<PHONE>', 'g') AS redacted
        |FROM documents""".stripMargin) { (s, dir) =>
      val planted = concat(
        lit("Contact u"), col("doc_id").cast("string"),
        lit("@mail.com or call +1 (555) 010-"),
        lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0"),
        lit(", thanks; "), col("text"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), T.redactPii(planted).as("redacted"))
    },

    // Greedy sequence packing (pretraining batch prep): per source, docs
    // in id order are packed into 128-token training sequences. The
    // greedy fold is a pure function of the (source, doc_id) order, so
    // the oracle replays it as a per-group recursive CTE.
    Q("q83_pack_sequences",
      s"""$packingCte
        |SELECT source, doc_id, n_tokens, CAST(bin AS INT) AS bin
        |FROM steps WHERE rn >= 1""".stripMargin) { (s, dir) =>
      val d = Tables(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(graft.dedup.Dedup.wordTokens(col("text"))).as("n_tokens"))
      Packing.packGreedy(d, "source", "doc_id", "n_tokens", budget = 128).toDF()
    },

    // The packed sequences materialized: per (source, bin), the docs
    // concatenated in id order with a separator token — the actual
    // training-sequence artifact (q83 assigns bins; this emits the text).
    // One ordered collect per bin after the packing pass; the separator
    // stands in for the tokenizer's document-boundary special token.
    Q("q85_packed_text",
      s"""$packingCte,
        |packed AS (SELECT source, doc_id, n_tokens, bin FROM steps WHERE rn >= 1)
        |SELECT p.source, CAST(p.bin AS INT) AS bin,
        |       CAST(COUNT(*) AS INT) AS n_docs,
        |       CAST(SUM(p.n_tokens) AS BIGINT) AS total_tokens,
        |       string_agg(doc.text, ' <doc> ' ORDER BY p.doc_id) AS packed_text
        |FROM packed p JOIN documents doc USING (doc_id)
        |GROUP BY p.source, p.bin""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
      val d = docs.select(col("source"), col("doc_id"),
        size(graft.dedup.Dedup.wordTokens(col("text"))).as("n_tokens"))
      Packing.packGreedy(d, "source", "doc_id", "n_tokens", budget = 128).toDF()
        .join(docs.select(col("doc_id"), col("text")), "doc_id")
        .groupBy(col("source"), col("bin"))
        .agg(
          count(lit(1)).cast("int").as("n_docs"),
          sum(col("n_tokens")).as("total_tokens"),
          array_join(
            transform(array_sort(collect_list(struct(col("doc_id"), col("text")))),
              x => x.getField("text")),
            " <doc> ").as("packed_text"))
    },

    // BM25 top-15 for a 3-term query (one rare term, two common): the
    // lexical ranker complementing vector kNN. Per-term partials are
    // bit-identical IEEE doubles; the cross-term sum folds left-to-right
    // over the term-sorted list in BOTH engines (DuckDB list_reduce over
    // array_agg ORDER BY term ≡ Spark aggregate over sort_array), so
    // no aggregation-order drift; ordering on the raw score, total
    // tie-break by doc_id.
    Q("q93_bm25",
      """WITH toks AS (
        |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
        |lens AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM toks),
        |stats AS (SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl FROM lens),
        |tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(t) AS term FROM toks)
        |  WHERE term IN ('spark', 'window', 'dup') GROUP BY doc_id, term),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
        |scored AS (
        |  SELECT doc_id, term,
        |    ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
        |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl
        |          / (CAST(sum_dl AS DOUBLE) / n_docs))) AS s
        |  FROM tf JOIN dfreq USING (term) JOIN lens USING (doc_id) CROSS JOIN stats),
        |agg AS (
        |  SELECT doc_id, CAST(COUNT(*) AS INT) AS n_terms,
        |    list_reduce(array_agg(s ORDER BY term), (a, b) -> a + b) AS raw
        |  FROM scored GROUP BY doc_id)
        |SELECT doc_id, n_terms, ROUND(raw, 6) AS bm25
        |FROM agg ORDER BY raw DESC, doc_id LIMIT 15""".stripMargin) { (s, dir) =>
      TextStats.bm25TopK(Tables(s, dir, "documents"), "doc_id", "text",
        terms = Seq("spark", "window", "dup"), k = 15)
    },

    // Inverted-index materialization: term → (df, cf, capped posting list
    // ordered by impact). df/cf cover ALL postings; the stored list keeps
    // the top 5 per term.
    Q("q94_inverted_index",
      """WITH tf AS (
        |  SELECT term, doc_id, COUNT(*) AS tf FROM (
        |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |    FROM documents)
        |  GROUP BY term, doc_id),
        |r AS (SELECT *, row_number() OVER (
        |        PARTITION BY term ORDER BY tf DESC, doc_id) AS rn FROM tf)
        |SELECT term, CAST(COUNT(*) AS BIGINT) AS df, CAST(SUM(tf) AS BIGINT) AS cf,
        |  string_agg(CASE WHEN rn <= 5 THEN doc_id || ':' || tf END, ',' ORDER BY rn)
        |    AS postings
        |FROM r GROUP BY term""".stripMargin) { (s, dir) =>
      TextStats.invertedIndex(Tables(s, dir, "documents"), "doc_id", "text",
        maxPostings = 5)
    },

    // Shannon entropy quality signals (char + word, bits): near-zero
    // entropy flags degenerate/repetitive content. Per-class c·ln c
    // addends fold left-to-right over the class-sorted list in both
    // engines — no aggregation-order dependence.
    Q("q95_entropy",
      """WITH ch AS (
        |  SELECT doc_id, cls, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(list_transform(
        |      generate_series(1, length(lower(text))),
        |      i -> substr(lower(text), i, 1))) AS cls
        |    FROM documents)
        |  GROUP BY doc_id, cls),
        |che AS (
        |  SELECT doc_id, SUM(c) AS n,
        |    list_reduce(list_transform(array_agg(c ORDER BY cls),
        |      x -> CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))), (a, b) -> a + b) AS slnc
        |  FROM ch GROUP BY doc_id),
        |wd AS (
        |  SELECT doc_id, cls, COUNT(*) AS c FROM (
        |    SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS cls
        |    FROM documents)
        |  GROUP BY doc_id, cls),
        |wde AS (
        |  SELECT doc_id, SUM(c) AS n,
        |    list_reduce(list_transform(array_agg(c ORDER BY cls),
        |      x -> CAST(x AS DOUBLE) * ln(CAST(x AS DOUBLE))), (a, b) -> a + b) AS slnc
        |  FROM wd GROUP BY doc_id)
        |SELECT che.doc_id,
        |  ROUND((ln(CAST(che.n AS DOUBLE)) - che.slnc / che.n) / ln(2.0), 6)
        |    AS char_entropy_bits,
        |  ROUND((ln(CAST(wde.n AS DOUBLE)) - wde.slnc / wde.n) / ln(2.0), 6)
        |    AS word_entropy_bits
        |FROM che LEFT JOIN wde ON che.doc_id = wde.doc_id""".stripMargin) { (s, dir) =>
      TextStats.entropySignals(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // C4/RefinedWeb line-level cleaning over derived 8-word lines:
    // intra-doc line dedup + min-words + badword-line drop, kept lines
    // rejoined in order. (The corpus has no newlines, so the query first
    // derives them — 8 words per line — with the SAME regex in both
    // engines; the operator itself consumes any newline-delimited text.)
    Q("q98_line_filter",
      """WITH nl AS (
        |  SELECT doc_id, regexp_replace(text,
        |    '(\S+ \S+ \S+ \S+ \S+ \S+ \S+ \S+) ', '\1' || chr(10), 'g') AS t
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM nl),
        |lines AS (
        |  SELECT doc_id, s.i AS i, s.line AS line FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(l)),
        |      i -> {'i': i, 'line': l[i]})) AS s
        |    FROM ls)),
        |f AS (
        |  SELECT doc_id, i, line,
        |    (row_number() OVER (PARTITION BY doc_id, line ORDER BY i) = 1
        |     AND len(regexp_extract_all(lower(line), '[a-z0-9]+')) >= 8
        |     AND NOT list_contains(regexp_extract_all(lower(line), '[a-z0-9]+'), 'dup'))
        |      AS keep
        |  FROM lines)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY i), '')
        |    AS clean_text
        |FROM f GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val withLines = Tables(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"),
          "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n").as("text"))
      TextStats.lineFilter(withLines, "doc_id", "text",
        minWords = 8, badwords = Seq("dup"))
    },

    // C4 corpus-LEVEL line dedup (vs q98's doc-local pass): boilerplate
    // lines repeated across documents keep only their global first
    // occurrence (min (doc, idx) — a total order both engines replay).
    // Same derived 8-word lines as q98.
    Q("q128_corpus_line_dedup",
      """WITH nl AS (
        |  SELECT doc_id, regexp_replace(text,
        |    '(\S+ \S+ \S+ \S+ \S+ \S+ \S+ \S+) ', '\1' || chr(10), 'g') AS t
        |  FROM documents),
        |ls AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM nl),
        |lines AS (
        |  SELECT doc_id, s.i AS i, s.line AS line FROM (
        |    SELECT doc_id, unnest(list_transform(generate_series(1, len(l)),
        |      i -> {'i': i, 'line': l[i]})) AS s
        |    FROM ls)),
        |f AS (
        |  SELECT doc_id, i, line,
        |    (COUNT(*) OVER (PARTITION BY line) < 2
        |     OR row_number() OVER (PARTITION BY line ORDER BY doc_id, i) = 1)
        |      AS keep
        |  FROM lines)
        |SELECT doc_id, CAST(COUNT(*) AS INT) AS n_lines,
        |  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS INT) AS n_kept,
        |  COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY i), '')
        |    AS clean_text
        |FROM f GROUP BY doc_id""".stripMargin) { (s, dir) =>
      val withLines = Tables(s, dir, "documents").select(col("doc_id"),
        regexp_replace(col("text"),
          "(\\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+ \\S+) ", "$1\n").as("text"))
      TextStats.corpusLineDedup(withLines, "doc_id", "text", minCount = 2)
    },

    // Unigram LM quality score: mean negative log₂-probability per token
    // under the corpus's own unigram distribution — the perplexity-style
    // filter (CCNet/Gopher shape) without an external model. Per-term
    // addends fold left-to-right over the term-sorted list in both
    // engines (the q95 discipline) — no aggregation-order dependence.
    // EXACT heavy hitters via Misra-Gries candidates + recount: top-20
    // corpus terms WITHOUT shuffling the vocabulary — pass 1 is a
    // bounded 4096-counter per-partition summary (guaranteed to hold
    // every term with count > N/4097), pass 2 recounts candidates only.
    // Output is exact (and says so: guarantee_ok), so the oracle is the
    // plain exact top-20.
    Q("q159_heavy_hitters",
      """WITH tk AS (
        |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |c AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tk GROUP BY term),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tk)
        |SELECT term, cnt, cnt > n.n // 4097 AS guarantee_ok
        |FROM c, n ORDER BY cnt DESC, term LIMIT 20""".stripMargin) { (s, dir) =>
      TextStats.heavyHittersExact(Tables(s, dir, "documents"), "text",
        k = 20, capacity = 4096)
    },

    // Stupid Backoff bigram LM scoring (Brants et al. 2007 §4): mean
    // bigram surprisal against the doc_id%10=0 reference corpus, with
    // the α=0.4 backoff to add-1-smoothed unigrams for reference-unseen
    // bigrams — the word-ORDER-sensitive quality signal unigram q111
    // lacks. ln(0.4) is one shared Scala-computed literal in both
    // engines; all other lns are of integer-valued doubles (q111
    // discipline), folds are bigram-sorted.
    Q("q156_stupid_backoff", {
      val lnA = graft.text.TextStats.LnBackoffAlpha.toString
      s"""WITH toks AS (
         |  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t FROM documents),
         |uni AS (SELECT unnest(t) AS w FROM toks WHERE doc_id % 10 = 0),
         |cu AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cw FROM uni GROUP BY w),
         |k AS (SELECT (SELECT CAST(SUM(cw) AS BIGINT) FROM cu) AS n,
         |             (SELECT CAST(COUNT(*) AS BIGINT) FROM cu) AS v),
         |big AS (SELECT doc_id, doc_id % 10 = 0 AS is_ref,
         |          unnest(list_transform(generate_series(1, len(t) - 1),
         |                 i -> t[i] || ' ' || t[i+1])) AS bg
         |        FROM toks WHERE len(t) >= 2),
         |bf AS (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg),
         |cb AS (SELECT bg, CAST(COUNT(*) AS BIGINT) AS cb FROM big WHERE is_ref GROUP BY bg),
         |r AS (SELECT bf.doc_id, bf.bg, bf.c,
         |        CAST(bf.c AS DOUBLE) *
         |          (CASE WHEN cb.cb IS NOT NULL
         |            THEN ln(CAST(cp.cw AS DOUBLE)) - ln(CAST(cb.cb AS DOUBLE))
         |            ELSE ln(CAST(k.n + k.v AS DOUBLE))
         |                 - ln(CAST(COALESCE(cs.cw, 0) AS DOUBLE) + 1.0)
         |                 - ($lnA)
         |           END) AS s
         |      FROM bf
         |      LEFT JOIN cb USING (bg)
         |      LEFT JOIN cu cp ON cp.w = split_part(bf.bg, ' ', 1)
         |      LEFT JOIN cu cs ON cs.w = split_part(bf.bg, ' ', 2)
         |      CROSS JOIN k),
         |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
         |          list_reduce(array_agg(s ORDER BY bg), (a, b) -> a + b) AS raw
         |        FROM r GROUP BY doc_id)
         |SELECT doc_id, n_bigrams, ROUND(raw / n_bigrams / ln(2.0), 6) AS bits_per_bigram
         |FROM agg""".stripMargin
    }) { (s, dir) =>
      TextStats.stupidBackoffScore(Tables(s, dir, "documents"),
        "doc_id", "text", isRef = col("doc_id") % 10 === 0)
    },

    Q("q111_lm_score",
      """WITH tk AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS c FROM tk GROUP BY doc_id, term),
        |cf AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cf FROM tf GROUP BY term),
        |tt AS (SELECT CAST(SUM(cf) AS BIGINT) AS t FROM cf),
        |r AS (SELECT tf.doc_id, tf.term, tf.c,
        |        CAST(tf.c AS DOUBLE) *
        |          (ln(CAST(tt.t AS DOUBLE)) - ln(CAST(cf.cf AS DOUBLE))) AS s
        |      FROM tf JOIN cf USING (term), tt),
        |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |          list_reduce(array_agg(s ORDER BY term), (a, b) -> a + b) AS raw
        |        FROM r GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  ROUND(raw / n_tokens / ln(2.0), 6) AS bits_per_token
        |FROM agg""".stripMargin) { (s, dir) =>
      TextStats.lmScore(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // DSIR-style importance weighting (Xie et al. 2023): score non-'en'
    // documents by the add-1-smoothed unigram likelihood ratio between
    // the 'en' (target) and non-'en' (source) corpora — bits/token > 0
    // reads more target-like (DSIR's data-selection signal). Float
    // discipline = q111's (ln of integer counts, fixed order, term-
    // sorted per-doc folds).
    Q("q148_importance_weights",
      """WITH tk AS (
        |  SELECT doc_id, lang = 'en' AS is_target,
        |         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, is_target, term, COUNT(*) AS c
        |       FROM tk GROUP BY doc_id, is_target, term),
        |cft AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cft FROM tf WHERE is_target GROUP BY term),
        |cfs AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cfs FROM tf WHERE NOT is_target GROUP BY term),
        |k AS (SELECT
        |        (SELECT COALESCE(CAST(SUM(cft) AS BIGINT), 0) FROM cft) AS tot_t,
        |        (SELECT COALESCE(CAST(SUM(cfs) AS BIGINT), 0) FROM cfs) AS tot_s,
        |        (SELECT CAST(COUNT(DISTINCT term) AS BIGINT) FROM tk) AS v),
        |r AS (SELECT tf.doc_id, tf.term, tf.c,
        |        CAST(tf.c AS DOUBLE) *
        |          (ln(CAST(COALESCE(cft.cft, 0) AS DOUBLE) + 1.0)
        |           - ln(CAST(k.tot_t + k.v AS DOUBLE))
        |           - ln(CAST(cfs.cfs AS DOUBLE) + 1.0)
        |           + ln(CAST(k.tot_s + k.v AS DOUBLE))) AS s
        |      FROM tf LEFT JOIN cft USING (term) JOIN cfs USING (term), k
        |      WHERE NOT tf.is_target),
        |agg AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
        |          list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |            array_agg(s ORDER BY term)), (a, b) -> a + b) AS raw
        |        FROM r GROUP BY doc_id)
        |SELECT doc_id, n_tokens,
        |  ROUND(raw / n_tokens / ln(2.0), 6) AS bits_per_token,
        |  raw >= 0.0 AS selected
        |FROM agg""".stripMargin) { (s, dir) =>
      TextStats.importanceWeights(Tables(s, dir, "documents"), "doc_id", "text",
        isTarget = col("lang") === "en")
    },

    // The full Gopher document-quality rule set (Rae et al. 2021 §A1.1)
    // — every signal column + the composite pass verdict; a pure
    // projection (no shuffle), identical RE2-safe regexes both engines.
    Q("q123_gopher_rules",
      """WITH w AS (
        |  SELECT doc_id,
        |    regexp_extract_all(text, '\S+') AS words,
        |    length(regexp_replace(text, '\s+', '', 'g')) AS n_chars,
        |    len(regexp_extract_all(text, '#|\.\.\.|…')) AS n_sym,
        |    string_split(text, chr(10)) AS lines,
        |    regexp_extract_all(lower(text), '[a-z]+') AS toks
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |    len(words) AS n_words_raw,
        |    GREATEST(len(words), 1) AS nw,
        |    n_chars, n_sym,
        |    GREATEST(len(lines), 1) AS nl,
        |    len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS n_bullet,
        |    len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS n_ellip,
        |    len(list_filter(words, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
        |    len(list_filter(['and','be','have','of','that','the','to','with'],
        |        s -> list_contains(toks, s))) AS n_stop_hits
        |  FROM w)
        |SELECT doc_id,
        |  CAST(n_words_raw AS BIGINT) AS n_words,
        |  ROUND(CAST(n_chars AS DOUBLE) / nw, 6) AS mean_word_len,
        |  ROUND(CAST(n_sym AS DOUBLE) / nw, 6) AS symbol_ratio,
        |  ROUND(CAST(n_bullet AS DOUBLE) / nl, 6) AS bullet_frac,
        |  ROUND(CAST(n_ellip AS DOUBLE) / nl, 6) AS ellipsis_frac,
        |  ROUND(CAST(n_alpha AS DOUBLE) / nw, 6) AS alpha_frac,
        |  CAST(n_stop_hits AS BIGINT) AS n_stop_hits,
        |  (n_words_raw BETWEEN 50 AND 100000
        |   AND ROUND(CAST(n_chars AS DOUBLE) / nw, 6) BETWEEN 3.0 AND 10.0
        |   AND ROUND(CAST(n_sym AS DOUBLE) / nw, 6) <= 0.1
        |   AND ROUND(CAST(n_bullet AS DOUBLE) / nl, 6) <= 0.1
        |   AND ROUND(CAST(n_ellip AS DOUBLE) / nl, 6) <= 0.3
        |   AND ROUND(CAST(n_alpha AS DOUBLE) / nw, 6) >= 0.8
        |   AND n_stop_hits >= 2) AS pass
        |FROM c""".stripMargin) { (s, dir) =>
      TextStats.gopherRules(Tables(s, dir, "documents"), "doc_id", "text")
    },

    // HTML character-reference decoding (T1's ftfy-long-tail slice):
    // each doc gets a deterministic entity-laden wrapper (decimal ref
    // derived from n_chars — codepoints 65..564 exercise the >255 UTF-32
    // path — plus hex/astral, named set, escaped-escape, and the guard
    // cases: zero, surrogate, malformed, trailing '&#'), then decoded.
    // Oracle replays split('&#') → per-piece CASE with chr() → fold →
    // the same named-replace chain with &amp; last.
    Q("q170_html_entities", {
      // list_prepend(0, …) seeds the fold so the list is never empty —
      // DuckDB documents list_reduce as erroring on empty lists, and the
      // WHEN conjunction does not guarantee short-circuit; the 0 seed is
      // value-neutral (((0*16+d1)*16+d2)… = the plain fold).
      val hexFold = "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, " +
        "len(regexp_extract(p, '^[xX]([0-9a-fA-F]{1,6});', 1))), " +
        "i -> CAST(strpos('0123456789abcdef', substr(lower(" +
        "regexp_extract(p, '^[xX]([0-9a-fA-F]{1,6});', 1)), i, 1)) - 1 AS BIGINT))), " +
        "(a, b) -> a * 16 + b)"
      val decCode = "CAST(regexp_extract(p, '^([0-9]{1,7});', 1) AS BIGINT)"
      s"""WITH base AS (
         |  SELECT doc_id,
         |    'A &amp;amp; B &lt;i&gt; &#' || CAST((n_chars % 500) + 65 AS VARCHAR)
         |      || '; &#x1F600; mid &#55296; &#0; &#zz; tail &quot;'
         |      || substr(text, 1, 16) AS s
         |  FROM documents),
         |sp AS (SELECT doc_id, string_split(s, '&#') AS ps FROM base),
         |num AS (
         |  SELECT doc_id,
         |    ps[1] || list_reduce(list_prepend('', list_transform(ps[2:], p ->
         |      CASE
         |        WHEN regexp_matches(p, '^[0-9]{1,7};')
         |             AND $decCode BETWEEN 1 AND 1114111
         |             AND NOT ($decCode BETWEEN 55296 AND 57343)
         |          THEN chr(CAST($decCode AS INT))
         |               || regexp_replace(p, '^[0-9]{1,7};', '')
         |        WHEN regexp_matches(p, '^[xX][0-9a-fA-F]{1,6};')
         |             AND $hexFold BETWEEN 1 AND 1114111
         |             AND NOT ($hexFold BETWEEN 55296 AND 57343)
         |          THEN chr(CAST($hexFold AS INT))
         |               || regexp_replace(p, '^[xX][0-9a-fA-F]{1,6};', '')
         |        ELSE '&#' || p
         |      END)), (a, b) -> a || b) AS s
         |  FROM sp)
         |SELECT doc_id,
         |  replace(replace(replace(replace(replace(replace(s,
         |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&apos;', ''''),
         |    '&nbsp;', ' '), '&amp;', '&') AS decoded
         |FROM num""".stripMargin
    }) { (s, dir) =>
      import graft.functions.TextFunctions
      val encoded = concat(
        lit("A &amp;amp; B &lt;i&gt; &#"),
        ((col("n_chars") % 500) + 65).cast("string"),
        lit("; &#x1F600; mid &#55296; &#0; &#zz; tail &quot;"),
        substring(col("text"), 1, 16))
      Tables(s, dir, "documents")
        .select(col("doc_id"), TextFunctions.decodeHtmlEntities(encoded).as("decoded"))
    },

    // T1 COMPOSED (data_transformation_helpers.py:49-57 — the reference's
    // ONE `ftfy.fix_text` → NFKC → regex-sanitize pass): normalizeText now
    // chains unescape → mojibake repair → NFKC → quote-uncurl → sanitize.
    // One input exercises EVERY stage: a pure-ASCII entity prefix (a
    // non-ASCII entity output would suppress the whole-string repair —
    // the documented conservatism), a latin-1 mis-decoded decoration
    // carrying NFKC targets (™→TM, ﬁ→fi) and curly quotes (→ uncurled),
    // an escaped quote, a newline, and run-on spaces. The constructed
    // mis-decode is provably inverted by repair (q127's argument), so the
    // oracle emits the expected pre-collapse string directly and replays
    // only the final sanitize regexes — any stage bug hash-mismatches.
    Q("q171_normalize_composed",
      """WITH c AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(regexp_replace(regexp_replace(text, '\\"', '"', 'g'),
        |         '[\n\r]+', ' ', 'g'), '\s+', ' ', 'g')) AS clean
        |  FROM documents),
        |e AS (
        |  SELECT doc_id,
        |    '&amp; <i> A "" ln1' || chr(10) || 'ln2  sp « ' || substr(clean, 1, 24)
        |      || ' — "caféTM ''x'' fi Ÿ»' AS pre
        |  FROM c)
        |SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(pre, '[\n\r]+', ' ', 'g'),
        |       '\s+', ' ', 'g')) AS normalized
        |FROM e""".stripMargin) { (s, dir) =>
      val clean = T.normalizeText(col("text"))
      val decorated = concat(lit("« "), substring(clean, 1, 24),
        lit(" — “café™ ‘x’ ﬁ Ÿ»"))
      val damaged = decode(encode(decorated, "UTF-8"), "ISO-8859-1")
      val composed = concat(
        lit("&amp;amp; &lt;i&gt; &#65; &quot;\\\" ln1\nln2  sp "), damaged)
      Tables(s, dir, "documents")
        .select(col("doc_id"), T.normalizeText(composed).as("normalized"))
    },

    // T1 lossy-replacement recovery (round-10 stretch item 8 — the LAST
    // fix_text stage): q127's constructed mis-decode, but one damaged
    // byte is then DESTROYED (™'s final byte 0xA2 → ¢ → U+FFFD, the mark
    // a non-sloppy decoder leaves). The repair must recover everything
    // except that one scalar — ™ becomes � — instead of abandoning the
    // whole string (the pre-round-11 conservative behavior). Repair
    // provably inverts the rest of the constructed damage, so the oracle
    // emits the expected string directly (q127's argument).
    Q("q173_lossy_repair",
      """SELECT doc_id,
        |  '« ' || trim(regexp_replace(regexp_replace(regexp_replace(text, '\\"', '"', 'g'),
        |       '[\n\r]+', ' ', 'g'), '\s+', ' ', 'g')) || ' — café� Ÿ»' AS repaired
        |FROM documents""".stripMargin) { (s, dir) =>
      val clean = T.normalizeText(col("text"))
      val decorated = concat(lit("« "), clean, lit(" — café™ Ÿ»"))
      val damaged = decode(encode(decorated, "UTF-8"), "ISO-8859-1")
      // ¢ is ™'s final UTF-8 byte under the latin-1 mis-decode and occurs
      // nowhere else (the corpus is ASCII; no other decoration byte is
      // 0xA2) — destroying it models the lossy decoder
      val lossy = regexp_replace(damaged, "¢", "�")
      Tables(s, dir, "documents").select(
        col("doc_id"),
        TextExpressions.fixMojibake(lossy, passes = 1).as("repaired"))
    },

    q178BpeExact,
  )

  /** q178 fixture merges (the exact-BPE demo model): 18 common-English
    * pairs, WELL-FORMED — every merge's components are base characters
    * or results of earlier merges, and all results are distinct — so
    * the engine's lowest-rank-first loop and the oracle's rank-order
    * replace pass provably coincide ([[graft.text.BpeModel]]'s
    * equivalence note; the property is also pinned brute-force in
    * BpeSpec). This is a QUERY fixture, not a bundled model: the
    * library takes merges as caller data (BpeModel.fromDataFrame). */
  // lazy: `all` above initializes first and q178BpeExact reads this
  private[graft] lazy val Q178Merges: Seq[(String, String)] = Seq(
    "t" -> "h", "th" -> "e", "i" -> "n", "a" -> "n", "o" -> "n",
    "e" -> "r", "a" -> "t", "e" -> "n", "o" -> "r", "an" -> "d",
    "in" -> "g", "o" -> "u", "s" -> "t", "a" -> "r", "o" -> "f",
    "e" -> "s", "r" -> "e", "i" -> "s")

  /** T3 EXACT mode (closes the last documented deviation): per-document
    * token counts from a REAL merges-table BPE (graft.text.BpeModel —
    * true lowest-rank-first merging, the HF/GPT-2 algorithm), plus the
    * closed-form 2048/512 window budget over them. The DuckDB oracle
    * re-derives every count independently: each distinct word is
    * paren-wrapped per character and the merges are replayed IN RANK
    * ORDER as nested `replace` calls (SQL replace is left-to-right and
    * non-overlapping — exactly BPE's merge-all step), so an oracle
    * match is a cross-engine proof of the tokenizer, not a shared-code
    * tautology. Distinct-word granularity keeps the oracle linear in
    * vocabulary, and the engine memoises per task for the same reason
    * (Zipf: distinct words ≪ tokens). */
  private def q178BpeExact: Q = {
    val folded = Q178Merges.foldLeft("e") { case (acc, (a, b)) =>
      s"replace($acc, '($a)($b)', '($a$b)')"
    }
    Q("q178_bpe_exact_tokens",
      s"""WITH words AS (
         |  -- ASCII classes on the RAW text, lower() only on the extracted
         |  -- ASCII word: the engine lowercases A-Z alone, while lower(text)
         |  -- is full-Unicode (U+0130 'İ' → 'i'+combining dot would mint a
         |  -- word the engine never sees) — the q135 discipline
         |  SELECT doc_id, lower(unnest(regexp_extract_all(text, '[A-Za-z0-9]+'))) AS w
         |  FROM documents),
         |dw AS (SELECT DISTINCT w FROM words),
         |enc AS (SELECT w, regexp_replace(w, '(.)', '(\\1)', 'g') AS e FROM dw),
         |tokd AS (SELECT w, $folded AS t FROM enc),
         |cnt AS (SELECT w, CAST(length(t) - length(replace(t, '(', '')) AS BIGINT) AS n
         |        FROM tokd),
         |wsum AS (SELECT doc_id, SUM(n) AS wn FROM words JOIN cnt USING (w) GROUP BY doc_id),
         |tot AS (
         |  -- COALESCE both terms: a NULL text must yield 0 tokens / 1 chunk
         |  -- exactly like the engine's getOrElse(""), not NULL
         |  SELECT d.doc_id,
         |    CAST(COALESCE(w.wn, 0)
         |         + COALESCE(len(regexp_extract_all(d.text, '[^a-zA-Z0-9\\s]')), 0)
         |         AS BIGINT) AS bpe_tokens
         |  FROM documents d LEFT JOIN wsum w ON d.doc_id = w.doc_id)
         |SELECT doc_id, bpe_tokens,
         |  GREATEST(1, CAST(CEIL((bpe_tokens - 512) / 1536.0) AS BIGINT)) AS n_chunks
         |FROM tot""".stripMargin) { (s, dir) =>
      import s.implicits._
      val model = graft.text.BpeModel(Q178Merges)
      Tables(s, dir, "documents").select("doc_id", "text").as[(Long, String)]
        .mapPartitions { it =>
          val memo = new java.util.HashMap[String, Integer](1 << 12)
          it.map { case (id, t0) =>
            val n = model.textTokenLen(Option(t0).getOrElse(""), memo)
            (id, n.toLong,
              Chunker.nChunks(n, Chunker.RagSizeTokens, Chunker.RagOverlapTokens).toLong)
          }
        }.toDF("doc_id", "bpe_tokens", "n_chunks")
    }
  }

  /** Shared oracle prelude for q83/q85: the greedy per-source packing
    * fold as a recursive CTE (state = item index, bin fill, bin index;
    * 128-token budget — mirrors Packing.step exactly). Escaped $ since
    * the callers interpolate this into their oracle strings. */
  private def packingCte: String = "WITH RECURSIVE\n" + packingBody("documents")

  /** [[packingCte]]' body without the WITH prefix, rooted at any
    * (source, doc_id, text) CTE — q177 packs its mixture survivors. */
  private[queries] def packingBody(docsFrom: String): String =
    s"""d AS (SELECT source, doc_id,
      |        CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_tokens,
      |        ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
      |      FROM $docsFrom),
      |steps AS (
      |  SELECT source, 0 AS rn, CAST(NULL AS BIGINT) AS doc_id,
      |         0 AS n_tokens, 0 AS fill, 0 AS bin
      |  FROM (SELECT DISTINCT source FROM $docsFrom)
      |  UNION ALL
      |  SELECT d.source, d.rn, d.doc_id, d.n_tokens,
      |    CASE WHEN s.fill > 0 AND s.fill + d.n_tokens > 128
      |         THEN d.n_tokens ELSE s.fill + d.n_tokens END,
      |    CASE WHEN s.fill > 0 AND s.fill + d.n_tokens > 128
      |         THEN s.bin + 1 ELSE s.bin END
      |  FROM steps s JOIN d ON d.source = s.source AND d.rn = s.rn + 1)""".stripMargin
}
