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
  *   - catalog KNOWS the table → plain `DROP TABLE` already deletes a
  *     managed table's directory, wherever it really lives (non-default
  *     database, custom db location), and deliberately PRESERVES an
  *     external table's data. No manual delete: the old guessed-path
  *     `fs.delete` could destroy external data DROP meant to keep.
  *   - catalog does NOT know the table (the orphan case) → only then
  *     delete the managed layout `<databaseLocation>/<table>`, with the
  *     database location resolved from the catalog (guessing
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
    if (spark.catalog.tableExists(table)) {
      spark.sql(s"DROP TABLE IF EXISTS $table")
    } else {
      val db = dbOpt.getOrElse(spark.catalog.currentDatabase)
      // a db that doesn't exist has no orphan directory to clean — the
      // subsequent saveAsTable will surface the real error if any
      if (spark.catalog.databaseExists(db)) {
        val dbLoc = spark.catalog.getDatabase(db).locationUri
        val p = new org.apache.hadoop.fs.Path(
          new org.apache.hadoop.fs.Path(dbLoc), tbl.toLowerCase)
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.delete(p, true)
      }
    }
  }
}
