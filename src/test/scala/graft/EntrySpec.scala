package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("entry() flagship query returns rows") {
    val df = SparkEntry.entry(SharedSpark.spark)
    assert(df.count() > 0)
  }
  test("Tables.events canonicalizes BOTH shipped ts encodings (nanos-long and NTZ) — VERDICT r10 #7") {
    // The r9 red round came from a silent testdata regeneration flipping
    // events.ts from TIMESTAMP(NANOS) (read as long under nanosAsLong)
    // to µs TIMESTAMP_NTZ. Write each encoding from scratch and pin that
    // the loader emits one canonical TimestampType `ts` with identical
    // microsecond values — this fails if either arm of Tables.events
    // breaks, without waiting for live data to exercise it.
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val spark = SharedSpark.spark
    import spark.implicits._
    val micros = Seq(1600000000000001L, 1600000123456789L, 1599999999999999L)
    val dir = java.nio.file.Files.createTempDirectory("events_enc").toString

    // encoding A: INT64 nanoseconds (what nanosAsLong=true yields on
    // a TIMESTAMP(NANOS) file — the loader sees LongType either way)
    micros.zipWithIndex.map { case (m, i) => (i.toLong, m * 1000L) }
      .toDF("event_id", "ts")
      .write.parquet(s"$dir/nanos/events.parquet")
    val viaNanos = Tables.events(spark, s"$dir/nanos")
    assert(viaNanos.schema("ts").dataType == TimestampType, "nanos arm must emit TimestampType")

    // encoding B: microsecond TIMESTAMP_NTZ (isAdjustedToUTC=false)
    micros.zipWithIndex.map { case (m, i) => (i.toLong, m) }.toDF("event_id", "us")
      .select($"event_id", timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      .write.parquet(s"$dir/ntz/events.parquet")
    val viaNtz = Tables.events(spark, s"$dir/ntz")
    assert(viaNtz.schema("ts").dataType == TimestampType, "NTZ arm must emit TimestampType")

    def values(df: org.apache.spark.sql.DataFrame) =
      df.select($"event_id", unix_micros($"ts")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = micros.zipWithIndex.map { case (m, i) => i.toLong -> m }.toMap
    assert(values(viaNanos) == want, "nanos arm lost microsecond values")
    assert(values(viaNtz) == want, "NTZ arm lost microsecond values")
  }

  test("every declared query has a unique name and total fn") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    // no name lost to map-key collision; oracle SQL is well-formed
    assert(SparkEntry.queries.size == SparkEntry.allQueries.size)
    SparkEntry.oracleSql.values.foreach { q =>
      assert(q.trim.toUpperCase.startsWith("SELECT") || q.trim.toUpperCase.startsWith("WITH"))
      assert(Tables.all.exists(t => q.contains(t)), s"oracle references no known table: $q")
    }
  }
}
