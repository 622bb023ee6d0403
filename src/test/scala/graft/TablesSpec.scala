package graft

import org.apache.spark.sql.functions.{col, unix_micros}
import org.apache.spark.sql.types.TimestampType

/** The events.ts loader must absorb every encoding the testdata has shipped
  * with — TIMESTAMP(NANOS), TIMESTAMP_MICROS/NTZ, TIMESTAMP_MICROS/UTC —
  * and hand downstream operators one canonical TimestampType column whose
  * `unix_micros` values are identical across encodings (DuckDB's reader
  * truncates ns→us the same way, so oracles keep hash-matching).
  */
class TablesSpec extends SparkSpec {

  private val fixtureDir = "src/test/resources/fixtures/events_ts"
  private val encodings  = Seq("ts_tz_micros", "ts_ntz_micros", "ts_nanos")

  // Written by the fixture generator: 8 rows starting 2024-03-01T12:00:00Z,
  // stepping 37s + 13us; the nanos file adds a 789ns residue that exact
  // integer truncation must drop.
  private val expectedMicros: Seq[Long] =
    (0 until 8).map(i => 1709294400000000L + i * 37000013L)

  private def microsOf(file: String): Seq[Long] = {
    val df = Tables.readEventsFile(spark, s"$fixtureDir/$file.parquet")
    assert(df.schema("ts").dataType == TimestampType, s"$file not normalized")
    df.orderBy("event_id").select(unix_micros(col("ts"))).collect().map(_.getLong(0)).toSeq
  }

  test("all three ts encodings normalize to identical unix_micros") {
    val results = encodings.map(e => e -> microsOf(e)).toMap
    for ((enc, micros) <- results)
      assert(micros == expectedMicros, s"encoding $enc mismatched")
  }

  test("nanosAsLong conf is restored after an events read") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prior = spark.conf.getOption(key)
    Tables.readEventsFile(spark, s"$fixtureDir/ts_nanos.parquet").count()
    assert(spark.conf.getOption(key) == prior, "session conf leaked")
  }

  test("testdata events table normalizes and supports unix_micros") {
    val df = Tables(spark, "/root/testdata/sf0.001", "events")
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.select(unix_micros(col("ts"))).limit(1).count() == 1L)
  }
}
