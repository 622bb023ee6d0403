package graft.queries

import graft.{Q, Tables}
import graft.operators.{Checks, Relational => R}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational-core queries (SURVEY §2.2-2.8) bound to the synthetic tables.
  * Each query has a DuckDB oracle; aggregate doubles go through
  * DECIMAL(18,2) (see Relational.dsum) so both engines produce bit-identical
  * values regardless of partial-aggregation order.
  */
object RelationalQueries {

  val all: Seq[Q] = Seq(

    // A2/A5-style grouped pricing summary (the reference's group-agg shape,
    // ingest_graph_db.py:103-107 / checks.py aggregates).
    Q("q01_pricing_summary",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order,
        |  ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          R.dsum(col("l_quantity")).as("sum_qty"),
          R.dsum(col("l_extendedprice")).as("sum_base_price"),
          // computed product: cast FACTORS to decimal (exact 2-decimal
          // inputs), multiply exactly — never round a computed double
          // (Java shortest-repr vs binary rounding diverge on ties).
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .withColumn("avg_qty", R.ratio(col("sum_qty"), col("count_order")))
    },

    // P2/P4-style conjunctive filter + projection; predicate and column set
    // must reach the parquet scan (PushedFilters / ReadSchema).
    Q("q02_filter_pushdown",
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |WHERE CAST(l_shipdate AS DATE) < DATE '1996-01-01' AND l_quantity > 30""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .filter(to_date(col("l_shipdate")) < lit("1996-01-01").cast("date") && col("l_quantity") > 30)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    },

    // FLAGSHIP (SURVEY §3.2/§7.3): scan → window rank (W1) → project →
    // ordered group-concat (A1) → left join (J1). Mirrors the reference's
    // release-tracklist plan (ingest_graph_db.py:90-115).
    Q("q03_order_tracklist",
      """WITH ranked AS (
        |  SELECT l_orderkey,
        |         row_number() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_linenumber, l_partkey, l_suppkey) AS pos,
        |         l_partkey
        |  FROM lineitem),
        |entries AS (
        |  SELECT l_orderkey,
        |         string_agg(pos || '. ' || l_partkey, '; ' ORDER BY pos) AS items
        |  FROM ranked GROUP BY l_orderkey)
        |SELECT o.o_orderkey, o.o_orderstatus, e.items
        |FROM orders o LEFT JOIN entries e ON o.o_orderkey = e.l_orderkey""".stripMargin) { (s, dir) =>
      val grouped = R.orderedGroupConcat(
        Tables(s, dir, "lineitem"),
        groupCol = "l_orderkey",
        // (orderkey, linenumber) is NOT unique in the synthetic data —
        // row_number needs a total order or ranks are nondeterministic.
        orderCols = Seq("l_linenumber", "l_partkey", "l_suppkey"),
        entry = pos => concat(pos, lit(". "), col("l_partkey")),
        sep = "; ")
      val orders = Tables(s, dir, "orders")
      orders
        .join(grouped, orders("o_orderkey") === grouped("l_orderkey"), "left")
        .select(col("o_orderkey"), col("o_orderstatus"), col("items"))
    },

    // J1/J3: dim joins — nation and region are small, broadcast them
    // explicitly (the reference's driver-side dict lookups,
    // extract_artists_articles.py:77-97).
    Q("q04_customer_geo_rollup",
      """SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        |FROM customer c
        |JOIN nation n ON c.c_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name, n.n_name""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer")
      val n = broadcast(Tables(s, dir, "nation"))
      val r = broadcast(Tables(s, dir, "region"))
      c.join(n, c("c_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_customers"), R.dsum(col("c_acctbal")).as("sum_bal"))
    },

    // W1/A9: best row per group by total order (top order per customer).
    Q("q05_top_order_per_customer",
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin) { (s, dir) =>
      // k=1 → hash-agg argmax fast path (no window sort); the negated
      // orderkey encodes the ascending tiebreak
      R.argmaxPerGroup(
        Tables(s, dir, "orders"),
        groupCols = Seq("o_custkey"),
        sortKey = Seq(col("o_totalprice"), -col("o_orderkey")),
        payload = Seq("o_orderkey", "o_totalprice"))
        .select("o_custkey", "o_orderkey", "o_totalprice")
    },

    // W2: chained dedup-by-priority (data_transformation_helpers.py:89-120):
    // earliest order per customer, then earliest of those per status.
    Q("q06_dedup_priority",
      """WITH first_per_cust AS (
        |  SELECT * FROM (
        |    SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |      row_number() OVER (PARTITION BY o_custkey
        |                         ORDER BY o_orderdate, o_orderkey) AS rn
        |    FROM orders) WHERE rn = 1)
        |SELECT o_custkey, o_orderkey, o_orderstatus,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderstatus, o_orderdate,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |                       ORDER BY o_orderdate, o_orderkey) AS rn2
        |  FROM first_per_cust) WHERE rn2 = 1""".stripMargin) { (s, dir) =>
      R.dedupByPriority(
        Tables(s, dir, "orders"),
        keys = Seq("o_custkey", "o_orderstatus"),
        priority = Seq(col("o_orderdate").asc, col("o_orderkey").asc))
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    },

    // O1/O3: global top-k — Spark plans TakeOrderedAndProject (no full sort).
    Q("q07_global_topk",
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    },

    // O2/O5: deterministic offset+limit pagination (slice(offset, n),
    // extract_artists.py:298-303).
    Q("q08_pagination",
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
        |FROM orders ORDER BY o_orderdate, o_orderkey LIMIT 50 OFFSET 100""".stripMargin) { (s, dir) =>
      R.paginate(Tables(s, dir, "orders"), Seq(col("o_orderdate").asc, col("o_orderkey").asc), 100, 50)
        .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    },

    // U1: schema-relaxed union (merge_wikipedia_articles.py:56) — suppliers
    // lack mktsegment, filled with null by unionByName(allowMissing).
    Q("q09_union_relaxed",
      """SELECT c_custkey AS id, c_name AS name, c_acctbal AS acctbal,
        |       c_mktsegment AS segment, 'customer' AS side
        |FROM customer
        |UNION ALL
        |SELECT s_suppkey AS id, s_name AS name, s_acctbal AS acctbal,
        |       NULL AS segment, 'supplier' AS side
        |FROM supplier""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer").select(
        col("c_custkey").as("id"), col("c_name").as("name"),
        col("c_acctbal").as("acctbal"), col("c_mktsegment").as("segment"),
        lit("customer").as("side"))
      val sup = Tables(s, dir, "supplier").select(
        col("s_suppkey").as("id"), col("s_name").as("name"),
        col("s_acctbal").as("acctbal"), lit("supplier").as("side"))
      R.unionRelaxed(c, sup)
    },

    // J6/U3: anti join — customers with no orders (left_anti = NOT EXISTS).
    Q("q10_anti_join",
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin) { (s, dir) =>
      Tables(s, dir, "customer")
        .join(Tables(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    },

    // J7: semi join — parts that appear in some lineitem (EXISTS).
    Q("q11_semi_join",
      """SELECT p_partkey, p_name FROM part p
        |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)""".stripMargin) { (s, dir) =>
      Tables(s, dir, "part")
        .join(Tables(s, dir, "lineitem"), col("p_partkey") === col("l_partkey"), "left_semi")
        .select("p_partkey", "p_name")
    },

    // N1/U4: explode a tokenized list column then count distinct values
    // (extract_genres.py:52-60 explode+unique).
    Q("q12_explode_distinct",
      """SELECT token, COUNT(*) AS cnt FROM (
        |  SELECT unnest(string_split(p_type, ' ')) AS token FROM part)
        |GROUP BY token""".stripMargin) { (s, dir) =>
      Tables(s, dir, "part")
        .select(explode(split(col("p_type"), " ")).as("token"))
        .groupBy("token")
        .agg(count(lit(1)).as("cnt"))
    },

    // A7: top-N most frequent list values per group (the single-groupBy
    // rewrite of detect_communities.py:100-117's per-community loop).
    Q("q13_topn_per_group",
      """SELECT p_brand, token, cnt, rn FROM (
        |  SELECT p_brand, token, cnt,
        |    row_number() OVER (PARTITION BY p_brand ORDER BY cnt DESC, token) AS rn
        |  FROM (
        |    SELECT p_brand, token, COUNT(*) AS cnt FROM (
        |      SELECT p_brand, unnest(string_split(p_type, ' ')) AS token FROM part)
        |    GROUP BY p_brand, token
        |  )) WHERE rn <= 3""".stripMargin) { (s, dir) =>
      R.topNFrequent(
        Tables(s, dir, "part").select(col("p_brand"), explode(split(col("p_type"), " ")).as("token")),
        group = Seq("p_brand"), valueCol = "token", n = 3)
        .select("p_brand", "token", "cnt", "rn")
    },

    // A3: per-column null counts (checks.py:27-30).
    Q("q14_null_counts",
      """SELECT COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT(o_custkey) AS nulls_o_custkey,
        |  COUNT(*) - COUNT(o_orderstatus) AS nulls_o_orderstatus,
        |  COUNT(*) - COUNT(o_totalprice) AS nulls_o_totalprice
        |FROM orders""".stripMargin) { (s, dir) =>
      Checks.nullCounts(Tables(s, dir, "orders"), Seq("o_custkey", "o_orderstatus", "o_totalprice"))
    },

    // A4: full-row duplicate detection (checks.py:33-41).
    Q("q15_duplicate_stats",
      """SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS dup_rows, COUNT(*) AS dup_groups FROM (
        |  SELECT COUNT(*) AS cnt FROM nation
        |  GROUP BY n_nationkey, n_name, n_regionkey HAVING COUNT(*) > 1)""".stripMargin) { (s, dir) =>
      Checks.duplicateStats(Tables(s, dir, "nation"))
    },

    // A5: completeness ratio from exact integer counts (checks.py:68-86).
    Q("q16_completeness_ratio",
      """SELECT CAST(SUM(CASE WHEN c_acctbal > 0 AND c_mktsegment IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_complete,
        |  COUNT(*) AS n_rows,
        |  ROUND(CAST(SUM(CASE WHEN c_acctbal > 0 AND c_mktsegment IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |        / COUNT(*), 6) AS ratio
        |FROM customer""".stripMargin) { (s, dir) =>
      Checks.completenessRatio(
        Tables(s, dir, "customer"),
        col("c_acctbal") > 0 && col("c_mktsegment").isNotNull)
    },

    // A6: count-distinct ratio (checks.py:100-115 avg releases/artist).
    Q("q17_count_distinct",
      """SELECT COUNT(DISTINCT o_custkey) AS n_customers, COUNT(*) AS n_orders,
        |  ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT o_custkey), 6) AS orders_per_customer
        |FROM orders""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .agg(countDistinct(col("o_custkey")).as("n_customers"), count(lit(1)).as("n_orders"))
        .withColumn("orders_per_customer", R.ratio(col("n_orders"), col("n_customers")))
    },

    // A11: group-size histogram stats (neo4j_helpers.py:271-290).
    Q("q18_group_size_stats",
      """SELECT COUNT(*) AS n_groups, MAX(sz) AS largest, MIN(sz) AS smallest,
        |  ROUND(AVG(sz), 6) AS mean_size
        |FROM (SELECT COUNT(*) AS sz FROM orders GROUP BY o_custkey)""".stripMargin) { (s, dir) =>
      Checks.groupSizeStats(Tables(s, dir, "orders"), "o_custkey")
    },

    // Key-skew pre-flight report: exact per-key count percentiles via
    // count-of-counts (the percentile window runs over the bounded
    // distinct-size domain, never a key-space sort), max/mean skew
    // factor, top-5 heavy keys — the diagnostic that decides whether a
    // join on this key needs salting/AQE skew handling at scale.
    Q("q133_skew_report",
      """WITH counts AS (
        |  SELECT CAST(o_custkey AS VARCHAR) AS k, COUNT(*) AS cnt
        |  FROM orders GROUP BY 1),
        |hist AS (SELECT cnt, COUNT(*) AS nk FROM counts GROUP BY cnt),
        |cum AS (SELECT cnt, SUM(nk) OVER (ORDER BY cnt ROWS UNBOUNDED PRECEDING) AS cum
        |        FROM hist),
        |tot AS (SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
        |               MAX(cnt) AS max_cnt FROM counts),
        |st AS (
        |  SELECT tot.n_keys, tot.n_rows, tot.max_cnt,
        |    MIN(CASE WHEN cum.cum * 100 >= tot.n_keys * 50 THEN cum.cnt END) AS p50_cnt,
        |    MIN(CASE WHEN cum.cum * 100 >= tot.n_keys * 90 THEN cum.cnt END) AS p90_cnt,
        |    MIN(CASE WHEN cum.cum * 100 >= tot.n_keys * 99 THEN cum.cnt END) AS p99_cnt
        |  FROM cum CROSS JOIN tot GROUP BY tot.n_keys, tot.n_rows, tot.max_cnt),
        |top AS (
        |  SELECT string_agg(k || ':' || CAST(cnt AS VARCHAR), ', '
        |                    ORDER BY cnt DESC, k) AS top_keys
        |  FROM (SELECT k, cnt FROM counts ORDER BY cnt DESC, k LIMIT 5))
        |SELECT n_keys, n_rows, max_cnt, p50_cnt, p90_cnt, p99_cnt,
        |  ROUND(CAST(n_rows AS DOUBLE) / n_keys, 6) AS mean_cnt,
        |  ROUND(CAST(max_cnt AS DOUBLE) * n_keys / n_rows, 6) AS skew_factor,
        |  top_keys
        |FROM st CROSS JOIN top""".stripMargin) { (s, dir) =>
      Checks.skewReport(Tables(s, dir, "orders"), "o_custkey", topN = 5)
    },

    // O4: multi-key priority "best release" (musicbrainz_helpers.py:280-308):
    // prefer status 'F', then earliest date, deterministic tiebreak.
    Q("q19_best_per_group",
      """SELECT o_custkey, o_orderkey, o_orderstatus,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date FROM (
        |  SELECT *, row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY CASE WHEN o_orderstatus = 'F' THEN 0 ELSE 1 END,
        |             o_orderdate, o_orderkey) AS rn
        |  FROM orders) WHERE rn = 1""".stripMargin) { (s, dir) =>
      R.topKPerGroup(
        Tables(s, dir, "orders"),
        partCols = Seq("o_custkey"),
        order = Seq(
          when(col("o_orderstatus") === "F", 0).otherwise(1).asc,
          col("o_orderdate").asc, col("o_orderkey").asc),
        k = 1)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderstatus"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"))
    },

    // J5: theta join (match on key1 OR key2) as a union of equi-joins —
    // keeps both paths hash-joinable (ingest_graph_db.py:236-243).
    Q("q20_equi_union_join",
      """SELECT s_suppkey, COUNT(*) AS n_matches FROM (
        |  SELECT DISTINCT s.s_suppkey, c.c_custkey FROM supplier s JOIN customer c
        |    ON s.s_nationkey = c.c_nationkey
        |  UNION
        |  SELECT DISTINCT s.s_suppkey, c.c_custkey FROM supplier s JOIN customer c
        |    ON ROUND(s.s_acctbal / 1000) = ROUND(c.c_acctbal / 1000)
        |) GROUP BY s_suppkey""".stripMargin) { (s, dir) =>
      val sup = Tables(s, dir, "supplier")
        .withColumn("bal_bucket", round(col("s_acctbal") / 1000))
      val cust = Tables(s, dir, "customer")
        .withColumn("c_bal_bucket", round(col("c_acctbal") / 1000))
      R.equiUnionJoin(
        sup.select(col("s_suppkey"), col("s_nationkey"), col("bal_bucket")),
        cust.select(col("c_custkey"), col("c_nationkey"), col("c_bal_bucket")),
        conds = Seq(("s_nationkey", "c_nationkey"), ("bal_bucket", "c_bal_bucket")))
        .select("s_suppkey", "c_custkey")
        .distinct()
        .groupBy("s_suppkey")
        .agg(count(lit(1)).as("n_matches"))
    },

    // Skew-resistant salted aggregation: identical results to the direct
    // GROUP BY (associative decimal sums), different physical shape — the
    // hot 6-key aggregation spreads over 16 sub-groups before finalizing.
    Q("q59_salted_agg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      R.saltedSumCount(Tables(s, dir, "lineitem"),
        keys = Seq("l_returnflag"), valueCol = "l_extendedprice", buckets = 16)
    },

    // Window frames beyond the reference (SURVEY §2.5 "absent" row):
    // running decimal-exact sum (rows frame), lag, and a 30-day RANGE
    // frame over integer day numbers (value-based, tie-safe).
    Q("q68_window_frames",
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
        |  lag(o_orderkey) OVER (PARTITION BY o_custkey
        |       ORDER BY o_orderdate, o_orderkey) AS prev_order,
        |  CAST(COUNT(*) OVER (PARTITION BY o_custkey
        |       ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
        |       RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS BIGINT) AS orders_30d
        |FROM orders""".stripMargin) { (s, dir) =>
      val byCust = Window.partitionBy("o_custkey")
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val byDay = Window.partitionBy("o_custkey")
        .orderBy(unix_date(col("o_orderdate").cast("date")))
        .rangeBetween(-30, Window.currentRow)
      Tables(s, dir, "orders").select(
        col("o_custkey"), col("o_orderkey"),
        sum(col("o_totalprice").cast(DecimalType(18, 2)))
          .over(byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"),
        lag(col("o_orderkey"), 1).over(byCust).as("prev_order"),
        count(lit(1)).over(byDay).as("orders_30d"))
    },

    // Distribution statistics beyond the reference's count/avg checks:
    // exact interpolated percentiles (both engines use the standard
    // (n-1)·p linear interpolation) + sample stddev.
    Q("q69_percentiles",
      """SELECT source,
        |  ROUND(quantile_cont(n_chars, 0.5), 6) AS p50,
        |  ROUND(quantile_cont(n_chars, 0.9), 6) AS p90,
        |  ROUND(AVG(n_chars), 6) AS mean,
        |  ROUND(stddev_samp(n_chars), 6) AS sd
        |FROM documents GROUP BY source""".stripMargin) { (s, dir) =>
      Tables(s, dir, "documents")
        .groupBy("source")
        .agg(
          round(percentile(col("n_chars"), lit(0.5)), 6).as("p50"),
          round(percentile(col("n_chars"), lit(0.9)), 6).as("p90"),
          round(avg(col("n_chars")), 6).as("mean"),
          round(stddev_samp(col("n_chars")), 6).as("sd"))
    },

    // Cube subtotals (all grouping combinations) — the rollup sibling.
    Q("q70_cube",
      """SELECT n_regionkey, n_nationkey, COUNT(*) AS n
        |FROM nation GROUP BY CUBE (n_regionkey, n_nationkey)""".stripMargin) { (s, dir) =>
      Tables(s, dir, "nation")
        .cube(col("n_regionkey"), col("n_nationkey"))
        .agg(count(lit(1)).as("n"))
    },

    // Unpivot/melt (wide → long reshaping) + per-measure aggregate.
    Q("q71_unpivot",
      """SELECT measure, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        |FROM (
        |  SELECT l_orderkey, measure, value
        |  FROM lineitem UNPIVOT (value FOR measure IN (l_quantity, l_discount, l_tax)))
        |GROUP BY measure""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .unpivot(
          ids = Array(col("l_orderkey")),
          values = Array(col("l_quantity"), col("l_discount"), col("l_tax")),
          variableColumnName = "measure", valueColumnName = "value")
        .groupBy("measure")
        .agg(count(lit(1)).as("n"), R.dsum(col("value")).as("total"))
    },

    // Pivot (long → wide): order counts per ship-year by status column.
    Q("q72_pivot",
      """SELECT EXTRACT(YEAR FROM o_orderdate) AS order_year,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
        |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
        |FROM orders GROUP BY 1""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .groupBy(year(col("o_orderdate")).as("order_year"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        // a status absent for some year pivots to null; the oracle's
        // conditional sums yield 0 — normalize
        .select(col("order_year"),
          coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"),
          coalesce(col("P"), lit(0L)).as("P"))
    },

    // O1: multi-key global sort + limit.
    Q("q21_multi_sort",
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |ORDER BY o_orderstatus, o_totalprice DESC, o_orderkey LIMIT 200""".stripMargin) { (s, dir) =>
      Tables(s, dir, "orders")
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(200)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },

    // Mergeable quantile sketch (GK summaries) validated against the
    // exact interpolated percentile in the same plan — the q56 pattern:
    // the sketch value is engine-specific, so the oracle-checked surface
    // is the exact values plus within-tolerance booleans. accuracy=10000
    // bounds rank error at N/10000, far inside the 1% value tolerance on
    // this distribution; sketches are what survive at 100 TB where a
    // single-pass exact percentile would need a global sort.
    Q("q84_approx_quantiles",
      """SELECT ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5), 6) AS p50_exact,
        |       ROUND(quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.99), 6) AS p99_exact,
        |       TRUE AS p50_ok, TRUE AS p99_ok
        |FROM lineitem""".stripMargin) { (s, dir) =>
      Tables(s, dir, "lineitem")
        .select(col("l_extendedprice").cast("double").as("v"))
        .agg(
          round(percentile(col("v"), lit(0.5)), 6).as("p50_exact"),
          round(percentile(col("v"), lit(0.99)), 6).as("p99_exact"),
          percentile_approx(col("v"), lit(0.5), lit(10000)).as("a50"),
          percentile_approx(col("v"), lit(0.99), lit(10000)).as("a99"))
        .select(col("p50_exact"), col("p99_exact"),
          (abs(col("a50") - col("p50_exact")) <= col("p50_exact") * 0.01).as("p50_ok"),
          (abs(col("a99") - col("p99_exact")) <= col("p99_exact") * 0.01).as("p99_ok"))
    },

    // Skew-resistant salted equi-join (the join-side complement of q59's
    // salted aggregation): lineitem salted into 8 sub-keys per orderkey,
    // orders replicated 8×, joined on (key, salt) — one hot key spreads
    // over 8 reducers. The oracle is the PLAIN join: salting must be
    // invisible in the result.
    Q("q99_salted_join",
      """SELECT o_orderpriority, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_extendedprice"))
      val ord = Tables(s, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_orderpriority"))
      R.saltedJoin(li, ord, "k", salts = 8)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), R.dsum(col("l_extendedprice")).as("revenue"))
    },

    // Group-wise z-score standardization (ML feature prep): per-flag
    // mean/σ from decimal-exact Σx / Σx², row-level z, then order-free
    // per-group extremes and a |z|>2 outlier count.
    Q("q100_zscore",
      """WITH st AS (
        |  -- COUNT(l_quantity), not COUNT(*): the engine counts VALUES so
        |  -- null rows can't bias mu/sigma (identical here — no nulls)
        |  SELECT l_returnflag, COUNT(l_quantity) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))
        |             * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS s2
        |  FROM lineitem GROUP BY l_returnflag),
        |sg AS (
        |  SELECT l_returnflag, s1 / n AS mu,
        |    sqrt(greatest(s2 / n - (s1 / n) * (s1 / n), 0.0)) AS sigma
        |  FROM st),
        |z AS (
        |  -- σ=0 group → NULL z, mirroring the engine's when(σ>0)
        |  -- convention (round-5 advice: a bare divide would give ±inf/NaN
        |  -- here but NULL in Spark — a latent cross-engine divergence)
        |  SELECT l.l_returnflag,
        |    CASE WHEN sg.sigma > 0
        |         THEN (l.l_quantity - sg.mu) / sg.sigma END AS z
        |  FROM lineitem l JOIN sg USING (l_returnflag))
        |SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  ROUND(MIN(z), 6) AS min_z, ROUND(MAX(z), 6) AS max_z,
        |  CAST(SUM(CASE WHEN abs(z) > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM z GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      R.zscore(Tables(s, dir, "lineitem"), Seq("l_returnflag"), "l_quantity", "z")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(min("z"), 6).as("min_z"), round(max("z"), 6).as("max_z"),
          coalesce(sum(when(abs(col("z")) > 2, 1)), lit(0)).cast("long")
            .as("n_outliers"))
    },

    // Decile bucketing (ntile) of order value within each priority class
    // — equal-frequency binning for feature discretization; bucket
    // boundaries from a total (price, key) order so the cut is exact.
    Q("q101_ntile",
      """WITH t AS (
        |  SELECT o_orderpriority, o_totalprice,
        |    ntile(10) OVER (PARTITION BY o_orderpriority
        |                    ORDER BY o_totalprice, o_orderkey) AS decile
        |  FROM orders)
        |SELECT o_orderpriority, decile, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
        |FROM t GROUP BY o_orderpriority, decile""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders")
        .withColumn("decile", ntile(10).over(w))
        .groupBy("o_orderpriority", "decile")
        .agg(count(lit(1)).as("n"),
          min("o_totalprice").as("lo"), max("o_totalprice").as("hi"))
    },

    // Full-outer join (absent from the reference; Catalyst built-in):
    // per-nation customer vs supplier presence, null-preserving on both
    // sides — the reconciliation-report join shape.
    Q("q103_full_outer",
      """WITH c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_cust FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT COALESCE(c.nk, s.nk) AS nationkey,
        |  CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
        |  CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp,
        |  (c.nk IS NOT NULL AND s.nk IS NOT NULL) AS both_sides
        |FROM c FULL OUTER JOIN s ON c.nk = s.nk""".stripMargin) { (s, dir) =>
      val c = Tables(s, dir, "customer")
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val su = Tables(s, dir, "supplier")
        .groupBy(col("s_nationkey").as("snk")).agg(count(lit(1)).as("n_supp"))
      c.join(su, col("nk") === col("snk"), "full_outer")
        .select(coalesce(col("nk"), col("snk")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"),
          (col("nk").isNotNull && col("snk").isNotNull).as("both_sides"))
    },

    // Rank-statistics windows (percent_rank / cume_dist) — the relative
    // standing of each order inside its priority class; quantile features
    // computed distributively with no global sort.
    Q("q104_rank_stats",
      """SELECT o_orderkey, o_orderpriority,
        |  ROUND(percent_rank() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice, o_orderkey), 6) AS pr,
        |  ROUND(cume_dist() OVER (PARTITION BY o_orderpriority
        |        ORDER BY o_totalprice, o_orderkey), 6) AS cd
        |FROM orders""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables(s, dir, "orders").select(
        col("o_orderkey"), col("o_orderpriority"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
    },

    // Mergeable aggregation states: build per-batch (n, decimal-sum,
    // min, max) states from a parity SPLIT of lineitem, merge them, and
    // finish — the oracle is the FULL single-pass aggregation, proving
    // state merge ≡ recompute exactly (the incremental-pipeline
    // contract: process each new partition once, merge O(keys) states,
    // never recompute history).
    Q("q125_incremental_merge",
      """SELECT l_returnflag,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |  MIN(l_quantity) AS mn, MAX(l_quantity) AS mx
        |FROM lineitem GROUP BY l_returnflag""".stripMargin) { (s, dir) =>
      val li = Tables(s, dir, "lineitem")
      val even = R.aggState(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 0), "l_returnflag", "l_quantity")
      val odd = R.aggState(
        li.filter(pmod(col("l_orderkey"), lit(2)) === 1), "l_returnflag", "l_quantity")
      R.finishAggState(
        R.mergeAggStates(even, odd, "l_returnflag"), "l_returnflag")
    },

    // Dataset-version diff: classify every key added / removed /
    // changed / unchanged between two snapshots by md5 row fingerprint
    // — the ingest-to-ingest audit a versioned pipeline runs. Both
    // versions derive deterministically from orders (old drops
    // key%1000=7, new drops %1000=13 and rewrites priority on %500=21),
    // so the counts replay exactly; the join ships only (key,
    // fingerprint) however wide the table.
    Q("q161_dataset_diff",
      """WITH o AS (SELECT o_orderkey AS k, o_custkey, o_orderstatus, o_orderpriority
        |           FROM orders),
        |old AS (SELECT k, md5(concat_ws(chr(1),
        |          COALESCE(CAST(o_custkey AS VARCHAR), chr(0)),
        |          COALESCE(o_orderstatus, chr(0)),
        |          COALESCE(o_orderpriority, chr(0)))) AS h
        |        FROM o WHERE k % 1000 <> 7),
        |new AS (SELECT k, md5(concat_ws(chr(1),
        |          COALESCE(CAST(o_custkey AS VARCHAR), chr(0)),
        |          COALESCE(o_orderstatus, chr(0)),
        |          COALESCE(CASE WHEN k % 500 = 21 THEN '9-CHANGED'
        |                        ELSE o_orderpriority END, chr(0)))) AS h
        |        FROM o WHERE k % 1000 <> 13),
        |j AS (SELECT CASE WHEN old.h IS NULL THEN 'added'
        |                  WHEN new.h IS NULL THEN 'removed'
        |                  WHEN old.h <> new.h THEN 'changed'
        |                  ELSE 'unchanged' END AS status
        |      FROM old FULL OUTER JOIN new USING (k))
        |SELECT status, CAST(COUNT(*) AS BIGINT) AS n FROM j GROUP BY status""".stripMargin) { (s, dir) =>
      val o = Tables(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_custkey"), col("o_orderstatus"), col("o_orderpriority"))
      val vOld = o.filter(col("k") % 1000 =!= 7)
      val vNew = o.filter(col("k") % 1000 =!= 13)
        .withColumn("o_orderpriority",
          when(col("k") % 500 === 21, "9-CHANGED").otherwise(col("o_orderpriority")))
      R.datasetDiff(vOld, vNew, keyCols = Seq("k"),
        compareCols = Seq("o_custkey", "o_orderstatus", "o_orderpriority"))
    },

    // Column profile in one scan — the first op run on a new data drop:
    // per column nulls / distinct / min / max (engine-stable string
    // casts). One agg, one Expand for the multi-distinct, one explode
    // pivot to rows.
    Q("q164_column_profile", {
      val cols = Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate")
      val sels = cols.map { c =>
        s"""SELECT '$c' AS col_name, n.n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(MIN($c) AS VARCHAR) AS min_value,
           |  CAST(MAX($c) AS VARCHAR) AS max_value
           |FROM orders, n GROUP BY n.n_rows""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)
         |$sels""".stripMargin
    }) { (s, dir) =>
      graft.operators.Checks.profileColumns(Tables(s, dir, "orders"),
        Seq("o_custkey", "o_orderstatus", "o_orderpriority", "o_orderdate"))
    },

    // Length-distribution QA: per-source ECDF of n_chars at fixed probe
    // points — the deterministic dual of a quantile table (probe-point
    // count ratios replay exactly; interpolated percentiles don't).
    Q("q166_length_ecdf", {
      val points = Seq(200L, 500L, 1000L, 2000L)
      val cells = points.map(x =>
        s"ROUND(CAST(SUM(CASE WHEN n_chars <= $x THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS p_le_$x")
        .mkString(",\n        |  ")
      s"""SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |  $cells
        |FROM documents GROUP BY source""".stripMargin
    }) { (s, dir) =>
      graft.operators.Checks.ecdfAt(Tables(s, dir, "documents"),
        "source", "n_chars", points = Seq(200L, 500L, 1000L, 2000L))
    },

    // AUTO-salted skewed join (r14 verdict stretch 8 — q99's sibling,
    // now exercising saltedJoinAuto end-to-end): the key space is melted
    // deliberately (every orderkey % 5 == 0 collapses to key 0 — ~20% of
    // lineitem rows on ONE reducer unsalted), the dim side is grouped to
    // one row per key, and adaptiveSalts measures the hot key and sizes
    // the replication (targetRowsPerSalt=1000 → a genuine multi-salt
    // spread at every test SF). The oracle is the PLAIN join: salting —
    // manual or measured — must be invisible in the result.
    Q("q181_salted_join_auto",
      """WITH li AS (
        |  SELECT CASE WHEN l_orderkey % 5 = 0 THEN 0 ELSE l_orderkey END AS k,
        |         l_extendedprice
        |  FROM lineitem),
        |dim AS (
        |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN 0 ELSE o_orderkey END AS k,
        |         MIN(o_orderpriority) AS pri
        |  FROM orders GROUP BY 1)
        |SELECT pri, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM li JOIN dim USING (k) GROUP BY pri""".stripMargin) { (s, dir) =>
      val melt = (c: org.apache.spark.sql.Column) =>
        when(c % 5 === 0, lit(0L)).otherwise(c)
      val li = Tables(s, dir, "lineitem")
        .select(melt(col("l_orderkey")).as("k"), col("l_extendedprice"))
      val dim = Tables(s, dir, "orders")
        .select(melt(col("o_orderkey")).as("k"), col("o_orderpriority"))
        .groupBy("k").agg(min(col("o_orderpriority")).as("pri"))
      // maxSalts=16 bounds the DEMO's replication at big SFs (the 1000-
      // row target that guarantees a multi-salt spread at sf0.01 would
      // otherwise cap out at 64 salts on sf1's 1.2M-row hot key — a 64x
      // dim replication that costs ~60 s for no extra coverage; the
      // result is identical for ANY salts >= 1, which is the point)
      R.saltedJoinAuto(li, dim, "k", targetRowsPerSalt = 1000L, maxSalts = 16)
        .groupBy("pri")
        .agg(count(lit(1)).as("n"), R.dsum(col("l_extendedprice")).as("revenue"))
    },
  )
}
