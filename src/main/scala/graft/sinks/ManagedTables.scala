package graft.sinks

import org.apache.spark.sql.SparkSession

/** Lifecycle helpers for MANAGED index tables (the bucketed band / PQ
  * indexes persist as `saveAsTable` tables so their layout survives
  * sessions — see graft.dedup.BandIndex, graft.vector.IvfPqIndex).
  *
  * The one shared hazard: a warehouse DIRECTORY can outlive the
  * in-memory catalog. A fresh session's catalog does not know a
  * previous session's managed tables, so `DROP TABLE IF EXISTS` alone
  * no-ops there while the stale directory makes the subsequent
  * `saveAsTable` fail with LOCATION_ALREADY_EXISTS (the round-13
  * q141/q152 regression). Rebuild paths therefore need the location
  * gone too — but resolved CORRECTLY, not guessed:
  *
  *   - catalog knows the table as MANAGED → plain `DROP TABLE` deletes
  *     its directory, wherever it really lives (non-default database,
  *     custom db location). No manual delete: the old guessed-path
  *     `fs.delete` could destroy external data DROP meant to keep.
  *   - catalog knows it as EXTERNAL → DROP preserves its data at its
  *     own location (by contract), then the db-default managed path is
  *     swept for a PREVIOUS session's orphan directory, which would
  *     otherwise still fail the rebuild.
  *   - catalog does NOT know the table (the orphan case) → delete the
  *     managed layout `<databaseLocation>/<table>`, with the database
  *     location resolved from the catalog (guessing
  *     `<warehouse>/<table>` silently no-ops for qualified names and
  *     non-default current databases — round-13 advice).
  */
object ManagedTables {

  /** Drop `table`'s catalog entry and make its managed location
    * writable for a fresh `saveAsTable`, per the rules above. Accepts
    * `tbl` or `db.tbl`. */
  def dropTableAndLocation(spark: SparkSession, table: String): Unit = {
    val (dbOpt, tbl) = table.split('.') match {
      case Array(t) if t.nonEmpty              => (None, t)
      case Array(d, t) if d.nonEmpty && t.nonEmpty => (Some(d), t)
      case _ => throw new IllegalArgumentException(
        s"dropTableAndLocation: expected 'tbl' or 'db.tbl', got '$table'")
    }
    val known = spark.catalog.tableExists(table)
    // EXTERNAL tables keep their data across DROP by contract — record
    // the type BEFORE dropping so the orphan sweep below can still run
    // for them (their data lives at their own location; the managed
    // default path is a separate directory a previous session may have
    // left behind). MANAGED tables need no sweep: DROP deletes theirs.
    val wasManaged = known &&
      spark.catalog.getTable(table).tableType == "MANAGED"
    // An EXTERNAL table's own location must ALSO be captured before the
    // DROP (round-14 ADVICE): if it happens to BE the db-default managed
    // path, the orphan sweep below would destroy the very data DROP just
    // promised to keep. DESCRIBE FORMATTED is the public surface; the
    // read is bounded metadata, not a data collect.
    val extLoc: Option[org.apache.hadoop.fs.Path] =
      if (known && !wasManaged)
        spark.sql(s"DESCRIBE FORMATTED $table").collect().collectFirst {
          case r if r.getString(0) != null &&
              r.getString(0).trim == "Location" &&
              r.getString(1) != null && r.getString(1).trim.nonEmpty =>
            new org.apache.hadoop.fs.Path(r.getString(1).trim)
        }
      else None
    if (known) spark.sql(s"DROP TABLE IF EXISTS $table")
    if (!wasManaged) {
      val db = dbOpt.getOrElse(spark.catalog.currentDatabase)
      // a db that doesn't exist has no orphan directory to clean — the
      // subsequent saveAsTable will surface the real error if any
      if (spark.catalog.databaseExists(db)) {
        val dbLoc = spark.catalog.getDatabase(db).locationUri
        // Locale.ROOT: catalog identifiers lowercase locale-invariantly
        // (a tr-TR default locale would dotless-ı 'I' into a path the
        // catalog never wrote)
        val p = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(dbLoc),
          tbl.toLowerCase(java.util.Locale.ROOT))
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        // An EXTERNAL table deliberately LOCATED at the db-default
        // managed path is NOT swept (round-14 ADVICE — the old code
        // deleted it here, silently destroying data DROP had just
        // preserved by contract): the sweep exists only for a PREVIOUS
        // session's orphan directory. Skipping means the caller's
        // saveAsTable fails loudly with LOCATION_ALREADY_EXISTS — a
        // human decides between the parked data and the rebuild, rather
        // than the library deciding destructively.
        if (extLoc.exists(l => fs.makeQualified(l) == fs.makeQualified(p)))
          System.err.println(
            s"graft.sinks.ManagedTables: NOT sweeping ${fs.makeQualified(p)} — " +
              s"the dropped EXTERNAL table $table's own data lives there " +
              "(preserved by DROP's contract); a subsequent saveAsTable to " +
              "this name will fail with LOCATION_ALREADY_EXISTS until the " +
              "directory is moved or removed deliberately")
        else if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }

  /** COMPACT a bucketed managed table: rewrite its content as one fresh
    * bucketed layout and swap it in. Every `mode("append")` saveAsTable
    * adds `buckets` new files, so a maintained index (band index, PQ
    * index) fragments linearly in append count — after N daily batches a
    * serving scan opens N·buckets files. Compaction rewrites to exactly
    * `buckets` files (one per bucket) while preserving the bucket spec,
    * so downstream joins still plan zero index-side exchange.
    *
    * Protocol — never a driver-side materialization, crash-safe at every
    * boundary:
    *   1. write the table's content to `<table>__compacting` with the
    *      SAME bucketBy/sortBy (read from the catalog, never guessed);
    *   2. DROP the serving table;
    *   3. RENAME the compacted table into the serving name.
    * A crash before (2) leaves the serving table untouched (stale tmp is
    * swept on the next run); a crash between (2) and (3) leaves the data
    * safe under the tmp name — re-running compact() detects the
    * half-swap (serving name gone, tmp present) and completes the
    * rename without re-reading anything. Readers in other sessions go
    * through the guarded read paths (BandIndex.open / IvfPqIndex.read),
    * which refresh their relation cache before planning.
    *
    * Returns the number of data files after compaction (the spec's
    * shrink assertion reads it). */
  def compactBucketedTable(spark: SparkSession, table: String): Long = {
    val tmp = s"${table}__compacting"
    if (!spark.catalog.tableExists(table)) {
      require(spark.catalog.tableExists(tmp),
        s"compactBucketedTable: neither $table nor $tmp exists")
      // interrupted swap: the previous compact crashed between DROP and
      // RENAME — the compacted data is complete under tmp; finish it.
      spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
      spark.catalog.refreshTable(table)
      return dataFileCount(spark, table)
    }
    // bucket spec from DESCRIBE EXTENDED (public SQL surface): rows
    // ("Num Buckets", "8"), ("Bucket Columns", "[`band_key`]"),
    // ("Sort Columns", "[`band_key`]")
    val desc = spark.sql(s"DESCRIBE EXTENDED $table")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    def cols(key: String): Seq[String] = desc.get(key) match {
      case Some(v) if v.trim.nonEmpty =>
        v.trim.stripPrefix("[").stripSuffix("]").split(",")
          .map(_.trim.stripPrefix("`").stripSuffix("`")).filter(_.nonEmpty).toSeq
      case _ => Seq.empty
    }
    val bucketCols = cols("Bucket Columns")
    val sortCols = cols("Sort Columns")
    val nBuckets = desc.get("Num Buckets").map(_.trim.toInt).getOrElse(
      throw new IllegalArgumentException(
        s"compactBucketedTable: $table is not bucketed"))
    require(bucketCols.nonEmpty,
      s"compactBucketedTable: $table has no bucket columns")
    dropTableAndLocation(spark, tmp) // a prior run's stale tmp
    // Layout control — subtle, probed (round 14): a bucketed write emits
    // one file per bucket PER WRITE TASK, so the rewrite must arrive in
    // exactly one task per bucket. A plain repartition(nBuckets, cols)
    // does NOT achieve that here: the source scan's bucket layout
    // already satisfies the requested HashPartitioning, so the exchange
    // is elided — and then DisableUnnecessaryBucketedScan un-buckets the
    // scan (the V1 write's layout need is invisible to it), leaving
    // arbitrary file-split partitions that fragment the output
    // (task×bucket files). Forcing the bucketed scan for the window
    // makes the rewrite a pure per-bucket file MERGE: partitions == the
    // source buckets, ZERO shuffle, one file per bucket out. The
    // repartition stays as a no-op safety net (elided when the scan
    // already satisfies it; enforces the layout if it ever doesn't).
    val scanKey = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    // Conf isolation (round-14 ADVICE): two compactions running
    // concurrently on ONE session (IvfPqIndex.compact rewrites codes and
    // cells in parallel) would interleave a set/restore window on the
    // shared SQLConf — B could capture A's "false" as its prior (leaving
    // the session permanently un-bucketed-scan), and A's restore could
    // re-enable auto-bucketed-scan while B was still planning, silently
    // fragmenting B's output to task×bucket files. A CHILD session owns a
    // private SQLConf while sharing the SparkContext and the external
    // catalog, so the flip is invisible to every sibling and needs no
    // restore — the child is discarded. (newSession() seeds its conf from
    // the SparkContext's SparkConf, so builder-time settings like
    // shuffle.partitions carry over; the explicit repartition below pins
    // the layout regardless.)
    val writer = spark.newSession()
    writer.conf.set(scanKey, "false")
    // A child session's catalog starts at 'default' — it does NOT
    // inherit the parent's currentDatabase. Without this, an unqualified
    // `table`/`tmp` would resolve in the wrong database: loud failure at
    // best, compact-then-DROP of the wrong table at worst (breaking the
    // crash-safe swap). Pin the child to the caller's database.
    writer.catalog.setCurrentDatabase(spark.catalog.currentDatabase)
    val one = writer.table(table).repartition(nBuckets,
      bucketCols.map(org.apache.spark.sql.functions.col): _*)
    val w0 = one.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCols.head, bucketCols.tail: _*)
    val w = if (sortCols.nonEmpty) w0.sortBy(sortCols.head, sortCols.tail: _*)
            else w0
    w.saveAsTable(tmp)
    spark.sql(s"DROP TABLE $table")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $table")
    spark.catalog.refreshTable(table)
    dataFileCount(spark, table)
  }

  /** Distinct data files currently backing `table` — via
    * input_file_name(), the public surface (no catalog-internal file
    * listing). One small distributed agg; never collects rows. */
  def dataFileCount(spark: SparkSession, table: String): Long =
    spark.table(table)
      .select(org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().count()
}
