package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet star schema (TESTDATA.md).
  *
  * All queries take a scale-factor directory so the same plan runs at
  * sf0.001 (smoke), sf0.01 (oracle), sf0.1 (bench) — and, unchanged, on a
  * multi-node cluster at 100 TB: parquet scans parallelize per row-group,
  * and Catalyst pushes filters/pruning into the scan.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // every declared query's semantics (date bucketing, timestamp
    // literals, window alignment) and the DuckDB oracle assume UTC;
    // pin it so a caller-provided session with a local TZ can't shift
    // results (defensive, like the nanosAsLong flag below)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped in two parquet encodings across testdata
    * generations: nanosecond-precision INT64 (which Spark 4 refuses to
    * read as a timestamp — sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` and the long nanos
    * normalize here to microseconds, floor division matching DuckDB's
    * ns→µs flooring) and plain microsecond `isAdjustedToUTC=false`
    * (which Spark 4 reads as TIMESTAMP_NTZ — reinterpreted here as
    * TIMESTAMP, exact because the session TZ is pinned UTC above).
    * Either way downstream queries see one canonical TimestampType
    * `ts`. */
  def events(s: SparkSession, d: String): DataFrame = {
    // defensive: a caller-provided session may not have set the flag
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view (for spark.sql entry points);
    * `events` gets the ns→µs-normalized form. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
}
