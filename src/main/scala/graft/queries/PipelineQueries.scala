package graft.queries

import graft.{Q, Tables}
import graft.multimodal.Multimodal
import graft.operators.{Relational => R}
import graft.sinks.Sinks
import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pipeline-surface queries: events/time (streaming's batch-equivalent
  * forms), sinks (JSONL roundtrip, partitioned parquet + K7 validation),
  * multimodal binary plumbing, nested-JSON extraction (N6), and the
  * remaining relational free-wins (rollup, intersect/except, templating,
  * array truncation).
  */
object PipelineQueries {

  private def tmpPath(name: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_$name"

  val all: Seq[Q] = Seq(

    // Tumbling-window aggregation — the batch-equivalent of the streaming
    // plan (EventStreams.streamingTumbling shares this exact logical plan;
    // StreamingSpec proves batch ≡ streaming).
    Q("q44_windowed_agg",
      """SELECT CAST(floor(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start,
        |  event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      EventStreams.tumblingAgg(Tables(s, dir, "events"), "1 hour")
    },

    // Sessionization (gaps-and-islands, 300 s gap) — exact-integer micros
    // end to end; the streaming twin is flatMapGroupsWithState
    // (EventStreams.sessionizeStream, proven equivalent in StreamingSpec).
    Q("q45_sessionize",
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 300000000 THEN 1 ELSE 0 END AS is_new
        |  FROM t),
        |sess AS (
        |  SELECT user_id, us,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM flagged)
        |SELECT user_id, session_id, COUNT(*) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us, MAX(us) - MIN(us) AS duration_us
        |FROM sess GROUP BY user_id, session_id""".stripMargin) { (s, dir) =>
      EventStreams.sessionizeBatch(Tables(s, dir, "events"), gapSec = 300L)
    },

    // Native session windows (Spark's session_window) — same 300 s gap
    // rule as q45's manual gaps-and-islands, expressed as the built-in
    // streaming-capable operator; start = first event, end = last + gap.
    Q("q61_session_window",
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 300000000 THEN 1 ELSE 0 END AS is_new
        |  FROM t),
        |sess AS (
        |  SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged)
        |SELECT user_id, MIN(us) AS start_us, MAX(us) + 300000000 AS end_us,
        |       COUNT(*) AS n_events
        |FROM sess GROUP BY user_id, sid""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(
          col("user_id"),
          unix_micros(col("w.start")).as("start_us"),
          unix_micros(col("w.end")).as("end_us"),
          col("n_events"))
    },

    // Sliding windows (1 h window, 30 min slide): every event lands in
    // exactly two windows; the oracle enumerates both via epoch math.
    Q("q62_sliding_window",
      """WITH w AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,6)) AS v,
        |    unnest([CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT),
        |            CAST(floor(epoch(ts) / 1800) * 1800 - 1800 AS BIGINT)]) AS window_start
        |  FROM events)
        |SELECT window_start, event_type, COUNT(*) AS n_events,
        |       CAST(SUM(v) AS DOUBLE) AS sum_value
        |FROM w GROUP BY window_start, event_type""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
        .select(
          unix_timestamp(col("w.start")).as("window_start"),
          col("event_type"), col("n_events"), col("sum_value"))
    },

    // Multimodal: opaque binary column → partition-batched REAL header
    // decode → typed metadata. synthMedia builds SPEC-VALID PNG/JPEG/GIF/
    // WebP bytes (doc_id picks format/variant/dims, text rides as the
    // body), so MediaHeaders.decodeHeader must do real fixed-offset byte
    // arithmetic (BE32 PNG IHDR, JPEG SOFn marker scan, LE16 GIF LSD,
    // WebP VP8/VP8L/VP8X bit-fields) to recover what the oracle predicts
    // arithmetically. The parser itself is pinned against REAL image
    // fixtures in MultimodalSpec so synth+parse can't share a wrong
    // layout. Header-length constants per format: png 33, jpeg 17,
    // gif 13, webp 30/25/30 (vp8/vp8l/vp8x by doc_id%3).
    Q("q46_multimodal_meta",
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) + CASE CAST(doc_id % 4 AS INT)
        |       WHEN 0 THEN 33 WHEN 1 THEN 17 WHEN 2 THEN 13
        |       ELSE CASE CAST(doc_id % 3 AS INT) WHEN 1 THEN 25 ELSE 30 END
        |       END AS INT) AS n_bytes,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |       WHEN 2 THEN 'gif' ELSE 'webp' END AS format,
        |  CAST(1 + doc_id % 3000 AS INT) AS width,
        |  CAST(1 + (doc_id * 7) % 2000 AS INT) AS height,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 137 WHEN 1 THEN 255
        |       WHEN 2 THEN 71 ELSE 82 END AS first_byte
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.extractMeta(Multimodal.synthMedia(Tables(s, dir, "documents"))).toDF()
    },

    // Range (interval) join: events matched back into their enclosing
    // session intervals via the bucketized equi-join (every event lands
    // in exactly one session, so the match is total and unique).
    Q("q67_range_join",
      """WITH t AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN prev_us IS NULL OR us - prev_us > 300000000 THEN 1 ELSE 0 END AS is_new
        |  FROM t),
        |sess AS (
        |  SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flagged),
        |intervals AS (
        |  SELECT user_id, MIN(us) AS start_us, MAX(us) AS end_us
        |  FROM sess GROUP BY user_id, sid)
        |SELECT f.event_id, i.start_us AS session_start
        |FROM flagged f JOIN intervals i
        |  ON f.user_id = i.user_id AND f.us BETWEEN i.start_us AND i.end_us""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      val sessions = EventStreams.sessionizeBatch(Tables(s, dir, "events"), 300L)
        .select(col("user_id"), col("start_us"), col("end_us"))
      R.bucketRangeJoin(ev, sessions,
          keys = Seq("user_id"), ptCol = "us", loCol = "start_us", hiCol = "end_us",
          bucketWidth = 3600000000L)
        .select(col("event_id"), col("start_us").as("session_start"))
    },

    // As-of join: every non-click event matched to the user's latest
    // click at-or-before it (union+window composition — one shuffle,
    // linear, never a per-key cross product). Oracle = DuckDB's native
    // ASOF LEFT JOIN.
    Q("q66_asof_join",
      """WITH r AS (
        |  SELECT user_id, epoch_us(ts) AS us, MAX(event_id) AS click_event_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |l AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us
        |  FROM events WHERE event_type <> 'click')
        |SELECT l.event_id, r.click_event_id, l.us - r.us AS gap_us
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.us >= r.us""".stripMargin) { (s, dir) =>
      val ev = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"),
                unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "us").agg(max("event_id").as("click_event_id"))
      val others = ev.filter(col("event_type") =!= "click")
        .select("user_id", "event_id", "us")
      R.asofJoin(others, clicks,
          keys = Seq("user_id"), timeCol = "us",
          rightPayload = Seq("click_event_id", "us"))
        .select(
          col("event_id"),
          col("asof_match.click_event_id").as("click_event_id"),
          (col("us") - col("asof_match.us")).as("gap_us"))
    },

    // Multimodal frame sampling: 3 contiguous byte-frames per payload
    // with per-frame md5 fingerprints (1→N typed flatMap over binary).
    Q("q65_frame_sample",
      """WITH f AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n,
        |         unnest(generate_series(0, 2)) AS i
        |  FROM documents)
        |SELECT doc_id, CAST(i AS INT) AS frame_index,
        |  CAST((((i + 1) * n) // 3) - ((i * n) // 3) AS INT) AS n_bytes,
        |  md5(substr(text, CAST((i * n) // 3 + 1 AS INT),
        |      CAST((((i + 1) * n) // 3) - ((i * n) // 3) AS INT))) AS fp
        |FROM f""".stripMargin) { (s, dir) =>
      Multimodal.frameSample(
        Multimodal.asBinary(Tables(s, dir, "documents")), n = 3).toDF()
    },

    // Media curation filter — WHY a pipeline parses headers at all:
    // drop low-resolution and unwanted-format media BEFORE paying for a
    // full decode. Synth-valid bytes → real header parse → filter on the
    // PARSED dims/format → per-format stats. The oracle predicts the
    // same rows purely arithmetically, so any parse error (offset,
    // endianness, variant confusion) shifts the kept-set and breaks the
    // hash. Distributed shape: decode is a narrow mapPartitions pass,
    // the filter prunes before the single small shuffle (4-row groupBy).
    Q("q182_media_filter",
      """WITH m AS (
        |  SELECT doc_id,
        |    CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |         WHEN 2 THEN 'gif' ELSE 'webp' END AS format,
        |    CAST(1 + doc_id % 3000 AS INT) AS width,
        |    CAST(1 + (doc_id * 7) % 2000 AS INT) AS height
        |  FROM documents)
        |SELECT format, COUNT(*) AS n_kept,
        |  CAST(SUM(CAST(width AS BIGINT) * height) AS BIGINT) AS sum_pixels,
        |  CAST(MIN(width) AS INT) AS min_width,
        |  CAST(MAX(height) AS INT) AS max_height
        |FROM m
        |WHERE width >= 256 AND height >= 256 AND format <> 'gif'
        |GROUP BY format""".stripMargin) { (s, dir) =>
      Multimodal.extractMeta(Multimodal.synthMedia(Tables(s, dir, "documents")))
        .toDF()
        .filter(col("width") >= 256 && col("height") >= 256 &&
          col("format") =!= "gif")
        .groupBy("format")
        .agg(
          count(lit(1)).as("n_kept"),
          sum(col("width").cast("bigint") * col("height")).as("sum_pixels"),
          min(col("width")).as("min_width"),
          max(col("height")).as("max_height"))
    },

    // K2+S2: sparse-JSONL sink roundtrip — null-stripped NDJSON out,
    // explicit-schema scan back, aggregate compared against the source
    // table (proving the write/read path is lossless).
    Q("q47_jsonl_roundtrip",
      """SELECT source, COUNT(*) AS n_docs,
        |  COUNT(CASE WHEN n_chars >= 150 THEN lang END) AS n_extra,
        |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
      val docs = Tables(s, dir, "documents")
        .withColumn("extra", when(col("n_chars") >= 150, col("lang")))
      val path = tmpPath(s"jsonl_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
      Sinks.writeSparseJsonl(docs, path)
      val schema = StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType), StructField("extra", StringType)))
      Sinks.readJsonl(s, path, schema)
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          count(col("extra")).as("n_extra"),
          sum(col("n_chars")).as("sum_chars"))
    },

    // S2/K2 sibling: CSV interchange roundtrip — header write, explicit-
    // schema scan back (inference would drift int32 → int), aggregate
    // compared against the source table, proving the text encode/decode
    // path is lossless (doubles re-parse bit-exactly from shortest-repr).
    Q("q110_csv_roundtrip",
      """SELECT c_mktsegment, COUNT(*) AS n_cust,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
        |  COUNT(DISTINCT c_nationkey) AS n_nations
        |FROM customer GROUP BY c_mktsegment""".stripMargin) { (s, dir) =>
      val path = tmpPath(s"csv_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
      Sinks.writeCsv(Tables(s, dir, "customer"), path)
      val schema = StructType(Seq(
        StructField("c_custkey", LongType), StructField("c_name", StringType),
        StructField("c_nationkey", IntegerType), StructField("c_acctbal", DoubleType),
        StructField("c_mktsegment", StringType)))
      Sinks.readCsv(s, path, schema)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("sum_bal"),
          countDistinct("c_nationkey").as("n_nations"))
    },

    // N6: nested-JSON field extraction from the events props payload
    // (the Wikidata claims-path analog, wikidata_helpers.py:348-494).
    Q("q48_json_extract",
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) AS k,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables(s, dir, "events")
        .groupBy(get_json_object(col("props"), "$.k").cast("int").as("k"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
    },

    // Rollup (subtotal hierarchy) — free from Catalyst (SURVEY §2.4
    // "absent in reference, built-in in Spark").
    Q("q49_rollup",
      """SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY ROLLUP(r.r_name, n.n_name)""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val n = broadcast(Tables(s, dir, "nation"))
      val r = broadcast(Tables(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .select(col("r_name"), col("n_name"), col("c_acctbal"))
        .rollup(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("n_customers"), R.dsum(col("c_acctbal")).as("sum_bal"))
    },

    // U-family completion: INTERSECT + EXCEPT in one tagged result.
    Q("q50_intersect_except",
      """SELECT 'both' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |  INTERSECT SELECT o_custkey FROM orders)
        |UNION ALL
        |SELECT 'no_orders' AS tag, k FROM (
        |  SELECT c_custkey AS k FROM customer WHERE c_mktsegment = 'BUILDING'
        |  EXCEPT SELECT o_custkey FROM orders)""".stripMargin) { (s, dir) =>
      val building = Tables(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey").as("k"))
      val withOrders = Tables(s, dir, "orders").select(col("o_custkey").as("k"))
      building.intersect(withOrders).select(lit("both").as("tag"), col("k"))
        .unionByName(
          building.except(withOrders).select(lit("no_orders").as("tag"), col("k")))
    },

    // T4: context-header templating with conditional parts
    // (extract_artists_articles.py:146-193's search_document prefix).
    Q("q51_context_template",
      """SELECT doc_id,
        |  'search_document: Topic: ' || source || '.' ||
        |  CASE WHEN n_chars >= 150 THEN ' Context: ' || lang || ' |' ELSE '' END ||
        |  ' doc ' || CAST(doc_id AS VARCHAR) || ' (Section: Introduction) | ' ||
        |  substr(text, 1, 80) AS doc_header
        |FROM documents""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents").select(
        col("doc_id"),
        concat(
          lit("search_document: Topic: "), col("source"), lit("."),
          when(col("n_chars") >= 150,
            concat(lit(" Context: "), col("lang"), lit(" |"))).otherwise(lit("")),
          lit(" doc "), col("doc_id").cast("string"),
          lit(" (Section: Introduction) | "), substring(col("text"), 1, 80)
        ).as("doc_header"))
    },

    // N3+N4+A12: sorted-distinct collect, truncation cap, comma-join
    // (the metadata caps of ingest_community_summaries.py:49,63).
    Q("q52_array_truncate",
      """WITH toks AS (
        |  SELECT DISTINCT p_brand, unnest(string_split(p_type, ' ')) AS tok FROM part),
        |agg AS (SELECT p_brand, list_sort(list(tok)) AS arr FROM toks GROUP BY p_brand)
        |SELECT p_brand, CAST(len(arr) AS INT) AS n_distinct,
        |  array_to_string(arr[1:5], ', ') AS top5
        |FROM agg""".stripMargin) { (s, dir) =>
      Tables(s, dir, "part")
        .select(col("p_brand"), explode(split(col("p_type"), " ")).as("tok"))
        .groupBy("p_brand")
        .agg(sort_array(collect_set(col("tok"))).as("arr"))
        .select(
          col("p_brand"), size(col("arr")).as("n_distinct"),
          array_join(slice(col("arr"), 1, 5), ", ").as("top5"))
    },

    // The reference's 5 asset-checks as ONE quality-gate job (checks.py:
    // 14-159): key integrity, full-row dups, completeness ratio, coverage
    // average — each check one aggregation plan, unioned into a
    // check/pass table (the Spark analog of Dagster @asset_check).
    Q("q63_quality_gate",
      """SELECT 'orders_key_integrity' AS check_name,
        |       (COUNT(*) - COUNT(o_custkey)) = 0 AS pass FROM orders
        |UNION ALL
        |SELECT 'nation_no_dup_rows',
        |       COUNT(*) = 0 FROM (
        |         SELECT 1 FROM nation GROUP BY n_nationkey, n_name, n_regionkey
        |         HAVING COUNT(*) > 1)
        |UNION ALL
        |SELECT 'customer_completeness_50pct',
        |       (CAST(SUM(CASE WHEN c_acctbal > 0 AND c_mktsegment IS NOT NULL
        |                      THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) >= 0.5
        |FROM customer
        |UNION ALL
        |SELECT 'avg_orders_per_customer_ge_1',
        |       (CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT o_custkey)) >= 1.0
        |FROM orders""".stripMargin) { (s, dir) =>
      val orders = Tables(s, dir, "orders")
      val nation = Tables(s, dir, "nation")
      val customer = Tables(s, dir, "customer")
      val keyIntegrity = orders.agg(
        lit("orders_key_integrity").as("check_name"),
        (count(lit(1)) - count(col("o_custkey")) === 0).as("pass"))
      val noDups = nation.groupBy(nation.columns.toIndexedSeq.map(col): _*)
        .agg(count(lit(1)).as("cnt")).filter(col("cnt") > 1)
        .agg(lit("nation_no_dup_rows").as("check_name"), (count(lit(1)) === 0).as("pass"))
      val completeness = customer.agg(
        lit("customer_completeness_50pct").as("check_name"),
        (sum(when(col("c_acctbal") > 0 && col("c_mktsegment").isNotNull, 1).otherwise(0))
          .cast("double") / count(lit(1)) >= 0.5).as("pass"))
      val coverage = orders.agg(
        lit("avg_orders_per_customer_ge_1").as("check_name"),
        (count(lit(1)).cast("double") / countDistinct(col("o_custkey")) >= 1.0).as("pass"))
      keyIntegrity.unionByName(noDups).unionByName(completeness).unionByName(coverage)
    },

    // T9: date-string parsing (year extraction with try-cast null safety —
    // the MB "YYYY[-MM[-DD]]" → year shape, musicbrainz_helpers.py:260-277).
    Q("q64_year_parse",
      """SELECT EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS ship_year,
        |       COUNT(*) AS n,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy(year(expr("try_cast(l_shipdate AS DATE)")).as("ship_year"))
        .agg(count(lit(1)).as("n"), R.dsum(col("l_extendedprice")).as("revenue"))
    },

    // K1/K6/K7: partitioned parquet sink + read-back validation — the
    // grouped stats are computed FROM THE READ-BACK files, so a lossy or
    // misparitioned write would fail the oracle.
    Q("q53_sink_validated",
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(MIN(o_orderkey) AS BIGINT) AS min_key, CAST(MAX(o_orderkey) AS BIGINT) AS max_key
        |FROM orders GROUP BY o_orderstatus""".stripMargin) { (s, dir) =>
      val path = tmpPath(s"part_orders_${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
      Sinks.writePartitioned(
        Tables(s, dir, "orders").select("o_orderkey", "o_orderstatus"), path, "o_orderstatus")
      s.read.parquet(path)
        .groupBy("o_orderstatus")
        .agg(
          count(lit(1)).as("n"),
          min("o_orderkey").cast("long").as("min_key"),
          max("o_orderkey").cast("long").as("max_key"))
    },

    // Bucketed co-located join: both sides written bucketBy(8) on the
    // join key, then joined WITHOUT any exchange (the bucket layout IS
    // the shuffle, paid once at write time) — the pre-partitioning
    // discipline that amortizes one shuffle across every downstream join
    // at 100 TB. The oracle is the plain join on the raw parquet:
    // bucketing must be invisible in results.
    Q("q105_bucketed_join",
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val sfx = dir.replaceAll("[^a-zA-Z0-9]", "_")
      // the warehouse DIRECTORY outlives the session's in-memory catalog:
      // a fresh session can't overwrite a table it doesn't know whose
      // location survived a prior run — drop catalog entry and orphan dir
      // (centralized: location resolved from the catalog, never guessed)
      graft.sinks.ManagedTables.dropTableAndLocation(s, s"graft_bkt_li_$sfx")
      graft.sinks.ManagedTables.dropTableAndLocation(s, s"graft_bkt_ord_$sfx")
      Tables(s, dir, "lineitem").select("l_orderkey", "l_extendedprice")
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"graft_bkt_li_$sfx")
      Tables(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
        .write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable(s"graft_bkt_ord_$sfx")
      s.table(s"graft_bkt_li_$sfx")
        .hint("merge") // force SMJ so the bucket layout (not a broadcast) carries the join
        .join(s.table(s"graft_bkt_ord_$sfx"), "l_orderkey")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), R.dsum(col("l_extendedprice")).as("revenue"))
    },

    // SCD Type-2 dimension-history build (gaps-and-islands): each user's
    // event_type stream collapses into versioned validity intervals
    // [valid_from, valid_to) with valid_to = next version's start (null
    // while current) — the lakehouse dimension-history materialization.
    // All interval arithmetic in exact integer micros.
    Q("q96_scd2",
      """WITH t AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |      AS prev_attr
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, event_type, us, event_id,
        |    CASE WHEN prev_attr IS NULL OR prev_attr <> event_type THEN 1 ELSE 0 END AS chg
        |  FROM t),
        |v AS (
        |  SELECT user_id, event_type, us,
        |    CAST(SUM(chg) OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS version
        |  FROM flagged),
        |islands AS (
        |  SELECT user_id, CAST(version AS INT) AS version,
        |    MIN(event_type) AS event_type, MIN(us) AS valid_from_us,
        |    COUNT(*) AS n_events
        |  FROM v GROUP BY user_id, version)
        |SELECT user_id, version, event_type, valid_from_us,
        |  lead(valid_from_us) OVER (PARTITION BY user_id ORDER BY version)
        |    AS valid_to_us,
        |  n_events
        |FROM islands""".stripMargin) { (s, dir) =>
      R.scd2(Tables(s, dir, "events"), "user_id", "event_type", "ts", "event_id")
    },

    // Ordered-funnel report (view → click → purchase, 24h completion
    // window): per step, how many users' EARLIEST funnel reaches it.
    // All time math in exact integer micros; the oracle replays the
    // same greedy-earliest recurrence step by step.
    Q("q120_event_funnel",
      """WITH e AS (SELECT user_id AS u, event_type AS et, epoch_us(ts) AS tm FROM events),
        |s1 AS (SELECT u, MIN(tm) AS t1 FROM e WHERE et = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, MIN(s1.t1) AS t1, MIN(e.tm) AS tp
        |       FROM e JOIN s1 ON e.u = s1.u
        |       WHERE e.et = 'click' AND e.tm > s1.t1
        |         AND e.tm <= s1.t1 + 86400000000
        |       GROUP BY e.u),
        |s3 AS (SELECT e.u FROM e JOIN s2 ON e.u = s2.u
        |       WHERE e.et = 'purchase' AND e.tm > s2.tp
        |         AND e.tm <= s2.t1 + 86400000000
        |       GROUP BY e.u)
        |SELECT 1 AS step, 'view' AS event_type,
        |       (SELECT COUNT(*) FROM s1) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)""".stripMargin) {
      (s, dir) =>
      graft.operators.EventAnalytics.funnelReport(
        Tables(s, dir, "events"), "user_id", "event_type", "ts",
        steps = Seq("view", "click", "purchase"), windowSec = 86400L)
    },

    // Cohort retention matrix: users cohorted by first-active UTC day;
    // each (cohort_day, week_offset) cell counts that cohort's distinct
    // users active in that week.
    Q("q121_cohort_retention",
      """WITH a AS (SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS d FROM events),
        |c AS (SELECT u, MIN(d) AS cohort_day FROM a GROUP BY u)
        |SELECT c.cohort_day,
        |       CAST((a.d - c.cohort_day) // 7 AS BIGINT) AS week_offset,
        |       COUNT(DISTINCT a.u) AS n_active
        |FROM a JOIN c ON a.u = c.u
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      graft.operators.EventAnalytics.cohortRetention(
        Tables(s, dir, "events"), "user_id", "ts")
    },

    // Z-order (Morton) clustering key over (part, supplier) — the
    // multi-dimensional layout key for file-level data skipping (see
    // Sinks.writeZOrdered). Pure 64-bit shift/mask arithmetic; the
    // oracle SQL is GENERATED from the same spread constants.
    Q("q124_zorder_key",
      s"""SELECT l_partkey, l_suppkey,
         |  ${graft.functions.ZOrder.zValueSql("l_partkey", "l_suppkey")} AS z
         |FROM lineitem
         |ORDER BY z, l_partkey, l_suppkey LIMIT 200""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          graft.functions.ZOrder.zValue(col("l_partkey"), col("l_suppkey")).as("z"))
        .orderBy(col("z"), col("l_partkey"), col("l_suppkey"))
        .limit(200)
    },

    // Per-type daily counts with a trailing 7-day moving sum (RANGE
    // frame over day numbers — calendar gaps need no scaffold table).
    Q("q122_daily_moving",
      """WITH daily AS (
        |  SELECT event_type AS et, CAST(ts AS DATE) AS d, COUNT(*) AS n,
        |         (CAST(ts AS DATE) - DATE '1970-01-01') AS dnum
        |  FROM events GROUP BY 1, 2, 4)
        |SELECT et, d, n,
        |  CAST(SUM(n) OVER (PARTITION BY et ORDER BY dnum
        |       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_7d
        |FROM daily""".stripMargin) { (s, dir) =>
      graft.operators.EventAnalytics.dailyTypeCounts(
        Tables(s, dir, "events"), "event_type", "ts")
    },
  )
}
