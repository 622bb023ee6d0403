package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational operator library (SURVEY §2.2-2.8). Every function is a pure
  * `DataFrame => DataFrame` transformation; plans stay lazy so Catalyst can
  * push filters/projections into the scan and pick join strategies. Nothing
  * here collects to the driver.
  */
object Relational {

  /** Exact-by-decimal sum for hash-compared outputs. Double summation is
    * order-dependent (and Spark's partial aggregation order is
    * nondeterministic across partitionings), so money-ish sums are done in
    * DECIMAL(18,2) — exact and associative — then cast to double at the end
    * (a single deterministic conversion). Oracle side mirrors with
    * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast(DoubleType)

  /** Deterministic ratio: integer/decimal numerator and denominator, one
    * double division, rounded. */
  def ratio(num: Column, den: Column, scale: Int = 6): Column =
    round(num.cast(DoubleType) / den.cast(DoubleType), scale)

  /** W1 + A1: ordinal rank within a group, then ordered group-concat.
    * Mirrors the reference's track-list build (ingest_graph_db.py:90-115):
    * `with_row_index` + `rank("ordinal").over(album_id)` + group_by + agg.
    * Spark has no "file order", so the ordinal is anchored to an explicit
    * `orderCols` key; `collect_list` alone is order-nondeterministic, so we
    * sort structs inside the group before joining to a string.
    *
    * Scale: one shuffle on `groupCol` shared by the window and the
    * aggregation (same partitioning → Catalyst reuses the exchange).
    */
  def orderedGroupConcat(
      fact: DataFrame,
      groupCol: String,
      orderCols: Seq[String],
      entry: Column => Column, // pos => entry expression
      sep: String): DataFrame = {
    val w = Window.partitionBy(groupCol).orderBy(orderCols.map(col): _*)
    fact
      .withColumn("pos", row_number().over(w))
      .withColumn("entry", entry(col("pos")))
      .groupBy(groupCol)
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("pos"), col("entry")))),
            s => s.getField("entry")),
          sep).as("items"))
  }

  /** W2: dedup-by-priority (data_transformation_helpers.py:89-120) —
    * "sort then keep first per key", for a chain of keys. Polars'
    * `maintain_order=True` has no Spark analog, so priority is encoded
    * entirely in `priority` sort expressions (caller must make the order
    * total, e.g. by appending a unique tiebreaker).
    * One window (= one shuffle) per dedup key.
    */
  def dedupByPriority(df: DataFrame, keys: Seq[String], priority: Seq[Column]): DataFrame =
    keys.foldLeft(df) { (d, k) =>
      d.withColumn("__rn", row_number().over(Window.partitionBy(k).orderBy(priority: _*)))
        .filter(col("__rn") === 1)
        .drop("__rn")
    }

  /** W4/A9/O4: top-K rows per group under a total order (priority sort +
    * head(k), detect_communities.py:138-165; best-release selection
    * musicbrainz_helpers.py:280-308). */
  def topKPerGroup(df: DataFrame, partCols: Seq[String], order: Seq[Column], k: Int): DataFrame =
    df.withColumn("__rn", row_number().over(Window.partitionBy(partCols.map(col): _*).orderBy(order: _*)))
      .filter(col("__rn") <= k)
      .drop("__rn")

  /** A7/A8: top-N most frequent values per group — the single-pass rewrite
    * of the reference's per-community Python loops
    * (detect_communities.py:100-135). `valueCol` may be an exploded list
    * column (A7) or a scalar (A8).
    * Two shuffles: count groupBy, then window on `group`; at scale the
    * second reuses the first's hash partitioning on the group prefix.
    */
  def topNFrequent(df: DataFrame, group: Seq[String], valueCol: String, n: Int): DataFrame = {
    val counted = df.groupBy((group :+ valueCol).map(col): _*).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(group.map(col): _*).orderBy(col("cnt").desc, col(valueCol).asc)
    counted.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** Best-row-per-group as a hash-agg argmax — the k=1 fast path of
    * `topKPerGroup`: `max(struct(sortKey, payload))` needs no
    * per-partition sort (measured ~5× over row_number windows on large
    * groups). `sortKey` columns must encode the full desired order with
    * larger-is-better semantics (negate numerics for ascending); ties
    * fall through to payload comparison, so make the key total (append a
    * unique tiebreaker) exactly like the window form requires. */
  def argmaxPerGroup(
      df: DataFrame, groupCols: Seq[String],
      sortKey: Seq[Column], payload: Seq[String]): DataFrame = {
    val fields = sortKey.zipWithIndex.map { case (c, i) => c.as(s"__k$i") } ++
      payload.map(col)
    df.groupBy(groupCols.map(col): _*)
      .agg(max(struct(fields: _*)).as("__best"))
      .select(groupCols.map(col) ++ payload.map(p => col(s"__best.$p").as(p)): _*)
  }

  /** O2: deterministic offset/limit pagination (extract_artists.py:298-303
    * `slice(offset, n)`); requires a total sort order. */
  def paginate(df: DataFrame, order: Seq[Column], offset: Int, limit: Int): DataFrame =
    df.orderBy(order: _*).offset(offset).limit(limit)

  /** U1: schema-relaxed union (merge_wikipedia_articles.py:56
    * `pl.concat(how="vertical_relaxed")`). `unionByName` reconciles column
    * supersets; type relaxation is the caller's explicit cast. */
  def unionRelaxed(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** As-of join (the canonical "operator Spark lacks", composed from
    * built-ins per the (a)-first preference): for every left row, the
    * latest right row with `right.time <= left.time` on the same keys.
    *
    * Shape: union both sides tagged, ONE shuffle on the keys, and a
    * running `last(<right payload>, ignoreNulls)` window — right rows
    * sort before left rows at equal timestamps, so "at-or-before" holds.
    * This is the scalable form: a naive `l.t >= r.t` range join explodes
    * quadratically per key; the union-window form is linear in
    * |L| + |R| and never builds the cross product. Callers must ensure
    * at most one right row per (keys, time) — dedupe first (topKPerGroup)
    * — so tie-breaks are well-defined across engines.
    *
    * `leftTime`/`rightTime` must be the same comparable type (e.g. micros
    * longs); the matched right payload comes back as struct column
    * `asof_match` (null when no prior right row exists). */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keys: Seq[String], timeCol: String,
      rightPayload: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__is_r", lit(0))
      .withColumn("__payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType)))))
    val rTagged = right
      .select((keys :+ timeCol).map(col) :+
        struct(rightPayload.map(col): _*).as("__payload"): _*)
      .withColumn("__is_r", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(timeCol).asc, col("__is_r").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof_match",
        last(when(col("__is_r") === 1, col("__payload")), ignoreNulls = true).over(w))
      .filter(col("__is_r") === 0)
      .drop("__is_r", "__payload")
  }

  /** Range (interval) join: points matched to enclosing [lo, hi]
    * intervals on shared keys — bucketized so it stays an EQUI-join: the
    * point joins on its time bucket, the interval is exploded to every
    * bucket it overlaps, and the exact `between` filter runs after the
    * hash join. A naive `pt BETWEEN lo AND hi` theta join degenerates to
    * a per-key cross product; bucketization bounds the join fan-out by
    * interval-length / bucketWidth, which is the standard scalable form.
    * Pick `bucketWidth` near the typical interval length. */
  def bucketRangeJoin(
      points: DataFrame, intervals: DataFrame,
      keys: Seq[String], ptCol: String, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    // floor, not cast-truncation: truncation rounds toward zero, which
    // misbuckets negative time domains
    def bkt(c: Column): Column = floor(c / bucketWidth).cast("long")
    val pts = points.withColumn("__bkt", bkt(col(ptCol)))
    val ivs = intervals.withColumn("__bkt",
      explode(sequence(bkt(col(loCol)), bkt(col(hiCol)))))
    pts.join(ivs, keys :+ "__bkt")
      .filter(col(ptCol).between(col(loCol), col(hiCol)))
      .drop("__bkt")
  }

  /** Skew-resistant two-phase aggregation: rows are salted into `buckets`
    * sub-groups, partially aggregated per (key, salt), then finalized per
    * key. With few hot keys (the 6-group pricing summary over a 100 TB
    * lineitem is the canonical case), the first exchange spreads each hot
    * key over `buckets` reducers instead of one. Results are identical to
    * the direct groupBy because the decimal sums/counts are associative —
    * which is also what makes it oracle-checkable against plain GROUP BY.
    * (AQE's skew handling covers joins; aggregation salting is still
    * manual.) */
  def saltedSumCount(
      df: DataFrame, keys: Seq[String], valueCol: String, buckets: Int = 16): DataFrame =
    df.withColumn("__salt", pmod(hash(col(valueCol)), lit(buckets)))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol).cast(DecimalType(18, 2))).as("__s"),
        count(lit(1)).as("__c"))
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__s")).cast(DoubleType).as("sum_value"),
        sum(col("__c")).as("n_rows"))

  /** J5: theta join (`a = x OR x IN a_list`) decomposed into a union of
    * equi-joins so both sides stay hash-joinable (ingest_graph_db.py:236-243
    * SIMILAR_TO edges). A naive OR-predicate join would force a nested-loop
    * cross product — O(n^2) at scale.
    */
  def equiUnionJoin(
      left: DataFrame,
      right: DataFrame,
      conds: Seq[(String, String)]): DataFrame =
    conds
      .map { case (lc, rc) => left.join(right, left(lc) === right(rc), "inner") }
      .reduce(_ unionByName _)
      .distinct()

  /** Skew-resistant equi-join by key salting (the join-side complement of
    * [[saltedSumCount]]): the large/skewed left side tags each row with a
    * deterministic salt in [0, salts); the smaller right side replicates
    * every row across all salts; the join runs on (key, salt), so one hot
    * key spreads over `salts` reducers instead of melting one. Each left
    * row meets each right row exactly once → result ≡ the plain
    * equi-join (the oracle property). AQE re-splits skewed sort-merge
    * joins at runtime; explicit salting is the plan-stable form that also
    * covers what AQE can't re-split, at the cost of a `salts`× right-side
    * blowup — use with a dimension-sized right side. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      salts: Int = 16): DataFrame = {
    val l = left.withColumn("__salt",
      pmod(xxhash64(left.columns.map(col).toIndexedSeq: _*), lit(salts)).cast("int"))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)))) // int elements already
    // merge hint: the replicated right side must NEVER be broadcast —
    // size estimates don't see the explode's salts× inflation, so the
    // optimizer happily plans a "small" broadcast that materializes at
    // salts× (measured round 15: q181 at sf1, salts=64 → a 9.9 GiB
    // broadcast attempt over the 8 GiB ceiling, hard error). Broadcast
    // would also defeat the operator: salting spreads a hot REDUCER key,
    // and a broadcast join has no reducer to melt. Sort-merge keeps the
    // join a shuffle on (key, salt) — exactly the skew-spreading shape —
    // with sort-spill instead of an unbounded hash build on the
    // salts×-replicated side.
    l.join(r.hint("merge"), Seq(key, "__salt")).drop("__salt")
  }

  /** Sizing rule for [[saltedJoin]]'s `salts` (round-13 verdict item 6):
    * the benefit caps at the skew — spreading a hot key over more
    * reducers than it has rows-per-target buys nothing — while the COST
    * is the `salts`× right-side replication, whose shuffle volume and
    * per-task build memory scale as |right| · salts / shufflePartitions.
    * So: salts = ceil(hottestKeyRows / targetRowsPerSalt), clamped to
    * [1, maxSalts]. `hottestKeyRows` comes from one probe aggregation
    * over the left side's key column (cheap next to the join itself; at
    * 100 TB, probe a fixed-seed sample and scale, accepting a ±few-%
    * salt estimate — the result is identical for ANY salts ≥ 1). */
  def adaptiveSalts(
      left: DataFrame, key: String,
      targetRowsPerSalt: Long = 1L << 20, maxSalts: Int = 64): Int = {
    require(targetRowsPerSalt > 0 && maxSalts >= 1)
    // 1-row scalar probe (the deg.count() discipline): hottest key count
    val hot = left.groupBy(col(key)).agg(count(lit(1)).as("__c"))
      .agg(max(col("__c"))).limit(1).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long]))
      .getOrElse(0L)
    math.max(1, math.min(maxSalts.toLong,
      (hot + targetRowsPerSalt - 1) / targetRowsPerSalt)).toInt
  }

  /** [[saltedJoin]] with the salt factor measured from the data: pays
    * one probe aggregation to size the replication to the ACTUAL skew
    * instead of a guessed constant — uniform keys degenerate to salts=1
    * (the plain join, zero replication), and a melted-reducer key gets
    * exactly the spread it needs. Result ≡ the plain equi-join for any
    * salts (RelationalSpec pins both). */
  def saltedJoinAuto(
      left: DataFrame, right: DataFrame, key: String,
      targetRowsPerSalt: Long = 1L << 20, maxSalts: Int = 64): DataFrame =
    saltedJoin(left, right, key,
      salts = adaptiveSalts(left, key, targetRowsPerSalt, maxSalts))

  /** Group-wise z-score standardization of a numeric column (the feature
    * normalization step of ML data prep), deterministic under any
    * aggregation order: mean/variance come from DECIMAL-exact Σx and Σx²
    * (associative), each cast to double ONCE, then
    * σ = √(Σx²/n − μ²) — a fixed chain of IEEE scalar ops. Adds `zCol`
    * (null when the group is constant, σ = 0) in one group-stats hash agg
    * + one broadcast-joinable stats frame (group-cardinality-sized) —
    * the input is scanned once, never window-sorted. */
  def zscore(
      df: DataFrame, groupCols: Seq[String], valueCol: String,
      zCol: String): DataFrame = {
    // factors cast to decimal BEFORE squaring: decimal(18,4)² = (37,8)
    // stays exact inside precision 38 in both engines, while casting a
    // COMPUTED double to decimal diverges (shortest-repr vs binary
    // rounding — the dsum discipline applies to inputs only)
    val xd = col(valueCol).cast(DecimalType(18, 4))
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(
        // count the VALUES, not the rows: sum() skips nulls, so a
        // count(lit(1)) denominator silently biases μ/σ downward the
        // moment the column has nulls (round-10 null audit; null rows
        // still get a null z via the value−μ subtraction)
        count(xd).as("__n"),
        sum(xd).cast(DoubleType).as("__s1"),
        sum(xd * xd).cast(DoubleType).as("__s2"))
      .withColumn("__mean", col("__s1") / col("__n"))
      .withColumn("__std",
        sqrt(greatest(col("__s2") / col("__n") - col("__mean") * col("__mean"),
          lit(0.0))))
    df.join(broadcast(stats), groupCols)
      .withColumn(zCol,
        (col(valueCol) - col("__mean")) / when(col("__std") > 0, col("__std")))
      .drop("__n", "__s1", "__s2", "__mean", "__std")
  }

  /** SCD Type-2 history build (gaps-and-islands): collapse a per-key
    * attribute stream into versioned validity intervals
    * [valid_from_us, valid_to_us) — valid_to is the NEXT version's start,
    * null while current — the standard dimension-history materialization
    * of a lakehouse pipeline. Event order within a key is
    * (tsCol, ordCol) — a total order, since Spark has no file order (the
    * SURVEY §7.5 risk-1 discipline). Consecutive equal attribute values
    * merge into one version; n_events counts the merged rows.
    *
    * Scale shape: everything runs key-partition-parallel — two windows
    * over the same (key, ts, ord) shuffle ordering (lag + running sum,
    * one Exchange since the partitioning is shared), one hash agg to
    * islands, one lead over the islands frame. Timestamps become exact
    * integer micros before any arithmetic. */
  def scd2(
      df: DataFrame, keyCol: String, attrCol: String,
      tsCol: String, ordCol: String): DataFrame = {
    // micros are a monotone image of the timestamp, so ordering by
    // ("us", ordCol) is the same total order as (tsCol, ordCol)
    val wOrd = Window.partitionBy(keyCol).orderBy(col("us"), col(ordCol))
    val prev = lag(col(attrCol), 1).over(wOrd)
    val flagged = df
      .select(col(keyCol), col(attrCol), unix_micros(col(tsCol)).as("us"),
        col(ordCol))
      .withColumn("chg",
        when(prev.isNull || prev =!= col(attrCol), 1).otherwise(0))
      .withColumn("version",
        sum("chg").over(wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val islands = flagged.groupBy(col(keyCol), col("version"))
      .agg(min(col(attrCol)).as(attrCol), // constant within an island
        min(col("us")).as("valid_from_us"),
        count(lit(1)).as("n_events"))
    val wNext = Window.partitionBy(keyCol).orderBy("version")
    islands
      .withColumn("valid_to_us", lead(col("valid_from_us"), 1).over(wNext))
      .select(col(keyCol), col("version").cast("int").as("version"),
        col(attrCol), col("valid_from_us"), col("valid_to_us"),
        col("n_events"))
  }

  /** MERGEABLE aggregation state — the incremental-pipeline foundation:
    * per key, (n, s, mn, mx) where the sum is held in exact
    * DECIMAL(18,2) so states from ANY batch split merge associatively
    * to exactly the full recompute (double partials would drift with
    * the split). `aggState` builds a state from one batch;
    * `mergeAggStates` folds two states (count-sum, decimal sum-sum,
    * min/max-of-min/max); `finishAggState` converts to the reporting
    * row (double sum, the dsum convention). This is the batch analog of
    * a streaming partial-agg checkpoint: process each new partition of
    * a 100 TB table once, merge O(keys)-sized states, never recompute
    * history.
    *
    * Null semantics (explicit, round-10 audit): `n` counts ROWS — null
    * `valueCol` rows included — while `s`/`mn`/`mx` aggregate the
    * non-null values (SQL agg semantics). s/n is therefore NOT a
    * null-excluding mean on nullable columns; add a `count(valueCol)`
    * field to the state if that mean is needed. */
  def aggState(df: DataFrame, keyCol: String, valueCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("s"),
        min(col(valueCol)).as("mn"), max(col(valueCol)).as("mx"))

  def mergeAggStates(a: DataFrame, b: DataFrame, keyCol: String): DataFrame =
    a.unionByName(b).groupBy(col(keyCol))
      .agg(sum(col("n")).as("n"), sum(col("s")).cast(DecimalType(18, 2)).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  def finishAggState(state: DataFrame, keyCol: String): DataFrame =
    state.select(col(keyCol), col("n"), col("s").cast(DoubleType).as("s"),
      col("mn"), col("mx"))

  /** Snapshot diff between two versions of a keyed table — the dataset-
    * versioning audit a pipeline runs between ingests: every key is
    * classified added / removed / changed / unchanged by comparing an
    * md5 row fingerprint over `compareCols` (null-safe: each column
    * coalesces to a U+0000 sentinel before the U+0001-separated concat,
    * so NULL ≠ '' and column boundaries can't alias). One full outer
    * hash join on the keys; both sides project only keys + fingerprint,
    * so the shuffle carries two thin columns however wide the table —
    * the 100 TB version-diff shape. Callers pick `compareCols` with
    * engine-stable string casts (ints/strings/dates) when the result
    * must replay in SQL. Keys join NULL-SAFELY (`<=>`): a row whose
    * key is null matches its counterpart instead of double-counting
    * as one "added" plus one "removed" (plain equality never matches
    * null). Returns (status, n). */
  def datasetDiff(
      oldDf: DataFrame, newDf: DataFrame,
      keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    def fp(df: DataFrame, pfx: String, as: String): DataFrame =
      df.select(keyCols.map(c => col(c).as(s"$pfx$c")) :+
        md5(concat_ws("\u0001",
          compareCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*))
          .as(as): _*)
    val cond = keyCols.map(c => col(s"__o_$c") <=> col(s"__n_$c")).reduce(_ && _)
    fp(oldDf, "__o_", "h_old").join(fp(newDf, "__n_", "h_new"), cond, "full_outer")
      .select(
        when(col("h_old").isNull, "added")
          .when(col("h_new").isNull, "removed")
          .when(col("h_old") =!= col("h_new"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
  }
}
