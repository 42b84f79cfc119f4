package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source constructors (SURVEY §2.1). The Kafka path is configuration
  * over Spark's built-in `kafka` format — this environment has no
  * broker, so it is exercised structurally (options assembled +
  * validated) while tests drive the pipeline through MemoryStream /
  * rate sources behind the same DataFrame shape.
  */
object Sources {

  /** Structured-Streaming Kafka source mirroring the reference's direct
    * stream (KafkaToKuduScala.scala:22-29): subscribe to topics,
    * consumer group, string values surfaced as `value`.
    *
    * The reference's `LocationStrategies.PreferConsistent` has no
    * Structured-Streaming knob — executor-side partition assignment is
    * the built-in behavior. Offsets live in the checkpoint (fixes the
    * reference's missing offset management, SURVEY §2.6 W6).
    */
  def kafkaStream(
      spark: SparkSession,
      bootstrapServers: String,
      topics: Seq[String],
      groupId: String = "graft",
      startingOffsets: String = "latest"): DataFrame = {
    require(bootstrapServers.nonEmpty, "bootstrapServers must be non-empty")
    require(topics.nonEmpty, "at least one topic required")
    spark.readStream
      .format("kafka")
      .options(kafkaOptions(bootstrapServers, topics, groupId, startingOffsets))
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "topic", "partition", "offset", "timestamp")
  }

  /** The option map, exposed for structural tests. */
  def kafkaOptions(
      bootstrapServers: String,
      topics: Seq[String],
      groupId: String,
      startingOffsets: String): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topics.mkString(","),
    "kafka.group.id" -> groupId,
    "startingOffsets" -> startingOffsets)

  /** Kafka SINK configuration (the write-back half of the source
    * above): project (key, value) to the wire, point the writeStream
    * at a topic. Same environment constraint — no broker here, so the
    * builder is exercised structurally; any streaming DataFrame with a
    * `value` column (and optional `key`) is accepted, non-string
    * columns are cast on the way out. Checkpointed like every sink
    * (exactly-once to Kafka is at-least-once + idempotent/ transactional
    * producer downstream — same stance as the upsert sink's ledger). */
  def kafkaSink(
      df: DataFrame,
      bootstrapServers: String,
      topic: String,
      checkpointDir: String): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(bootstrapServers.nonEmpty, "bootstrapServers must be non-empty")
    require(topic.nonEmpty, "topic must be non-empty")
    require(df.columns.contains("value"), "kafka sink requires a 'value' column")
    val projected =
      if (df.columns.contains("key"))
        df.selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value")
      else df.selectExpr("CAST(value AS STRING) AS value")
    projected.writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
  }

  /** Rate-source stand-in for the README's 1-record/s shell producer
    * (`"<epoch_ms>,<0-99>"`, README.md:23) — same wire format, usable
    * for streaming benchmarks without a broker. */
  def syntheticTrafficStream(spark: SparkSession, rowsPerSecond: Int = 1): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream
      .format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString)
      .load()
      .select(concat(
        (unix_timestamp(col("timestamp")) * 1000).cast("string"),
        lit(","),
        pmod(col("value"), lit(100)).cast("string")).as("value"))
  }
}
