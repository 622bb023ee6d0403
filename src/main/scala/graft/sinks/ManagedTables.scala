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
        // Caveat, documented: an EXTERNAL table deliberately LOCATED at
        // the db-default managed path will lose its directory here —
        // that name is about to be overwritten as a managed index, and
        // the rebuild contract wins over a table parked in the managed
        // namespace.
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }
}
