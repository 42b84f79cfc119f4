package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** The reference pipeline, rebuilt on Structured Streaming
  * (SURVEY §7.2 M0): CSV lines `"<epoch_ms>,<n_vehicles>"` → parse →
  * event-time sliding window (60 s / 5 s) → aggregate → keyed upsert.
  *
  * Differences from the DStream original, by design (SURVEY §7.3):
  *  - event-time windows + watermark instead of arrival-time
  *    `dstream.window` — deterministic and replayable;
  *  - the upsert key is the window start (deterministic), not
  *    `UNIX_TIMESTAMP()` (reference F1) — a restart/replay updates the
  *    same rows instead of appending new ones;
  *  - checkpointing is first-class (reference W6 had none).
  */
object TrafficPipeline {

  /** Parsed record schema — mirrors KafkaToKuduJava.java:97-99. */
  val parsedColumns: Seq[String] = Seq("measurement_time", "number_of_vehicles")

  /** Parse the raw `value` string column (T1/T3/T4): split on ',',
    * trim trailing whitespace (the reference handles `"7 \n"` —
    * KafkaToKuduJava.java:91), cast. Malformed rows → nulls → dropped.
    */
  def parse(raw: DataFrame): DataFrame = {
    raw
      .withColumn("measurement_time", expr("try_cast(trim(get(split(value, ','), 0)) AS LONG)"))
      .withColumn("number_of_vehicles", expr("try_cast(trim(get(split(value, ','), 1)) AS INT)"))
      .filter(col("measurement_time").isNotNull && col("number_of_vehicles").isNotNull)
      .select("measurement_time", "number_of_vehicles")
  }

  /** The reference's aggregation (SURVEY §2.4) over sliding event-time
    * windows. `as_of_time` = window START epoch ms (deterministic key
    * replacing `UNIX_TIMESTAMP()*1000`). */
  def aggregate(parsed: DataFrame,
                windowLen: String = "60 seconds",
                slide: String = "5 seconds",
                watermark: String = "10 seconds"): DataFrame = {
    val withTs = parsed.withColumn("ts", timestamp_millis(col("measurement_time")))
    val windowed =
      if (parsed.isStreaming) withTs.withWatermark("ts", watermark)
      else withTs
    windowed
      .groupBy(window(col("ts"), windowLen, slide))
      .agg(
        round(avg("number_of_vehicles"), 2).as("avg_num_veh"),
        min("number_of_vehicles").as("min_num_veh"),
        max("number_of_vehicles").as("max_num_veh"),
        min("measurement_time").as("first_meas_time"),
        max("measurement_time").as("last_meas_time"))
      .select(
        (unix_timestamp(col("window.start")) * 1000).as("as_of_time"),
        col("avg_num_veh"), col("min_num_veh"), col("max_num_veh"),
        col("first_meas_time"), col("last_meas_time"))
  }

  /** End-to-end streaming query: source (any streaming DataFrame with a
    * string `value` column — Kafka in production, MemoryStream in
    * tests) → parse → window agg → foreachBatch upsert.
    *
    * Update output mode + keyed upsert ⇒ late data (within the
    * watermark) re-emits its window, which overwrites the same
    * `as_of_time` row — the sink converges to the correct aggregate
    * (idempotent under foreachBatch retries too; SURVEY §7.3 item 3).
    */
  def run(source: DataFrame,
          sink: UpsertSink,
          checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
          windowLen: String = "60 seconds",
          slide: String = "5 seconds",
          watermark: String = "10 seconds"): StreamingQuery = {
    val agg = aggregate(parse(source), windowLen, slide, watermark)
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // persist: isEmpty + the store's read-merge-write each act on
        // the batch; without caching the window agg recomputes per
        // action (the reference's recompute hazard, SURVEY §3)
        batch.persist()
        try { if (!batch.isEmpty) sink.upsert(batch) }
        finally batch.unpersist()
      }
      .start()
  }

  /** Multi-sink fan-out in one batch — the reference writes each batch
    * THREE times and recomputes the aggregation each time (SURVEY §3
    * "recomputation hazard", KafkaToKuduScala.scala:51,56,61). Here the
    * batch is persisted once and fanned out, fixing the 3× recompute
    * while keeping the reference's three-paths-one-row semantics. */
  def runMultiSink(source: DataFrame,
                   sinks: Seq[UpsertSink],
                   checkpointDir: String,
                   trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery = {
    val agg = aggregate(parse(source))
    agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist() // before isEmpty: every action reuses the cache
        try { if (!batch.isEmpty) sinks.foreach(_.upsert(batch)) }
        finally batch.unpersist()
      }
      .start()
  }

  /** Reference-parity appendix (SURVEY §7.3 item 1): the DStream
    * pipeline's PROCESSING-time 60 s window, emulated with a bounded
    * ring of recent micro-batches inside foreachBatch. Kept as the
    * documented compatibility mode — with the original's caveat that
    * replay duplicates rows because the key is the wall clock
    * (here: an injected, testable clock; SURVEY §2.2 footnote). */
  final class ProcessingTimeWindow(
      sink: UpsertSink, clock: () => Long, scratchDir: String,
      batchesPerWindow: Int = 12) extends Serializable {
    // a foreachBatch DataFrame is only valid within its own invocation
    // (holding it across batches is unsupported and can recompute from
    // a gone source), so each batch is spilled to a scratch parquet dir
    // and the window is rebuilt from storage — bounded disk, no
    // retained live plans
    private val ring = scala.collection.mutable.Queue.empty[String]
    private var seq = 0L

    def onBatch(batch: DataFrame, spark: SparkSession): Unit = {
      val dir = s"$scratchDir/b=$seq"
      seq += 1
      batch.write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dir)
      ring.enqueue(dir)
      if (ring.size > batchesPerWindow) {
        val old = new org.apache.hadoop.fs.Path(ring.dequeue())
        old.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(old, true)
      }
      val windowDf = spark.read.parquet(ring.toSeq: _*)
      val out = windowDf.agg(
        round(avg("number_of_vehicles"), 2).as("avg_num_veh"),
        min("number_of_vehicles").as("min_num_veh"),
        max("number_of_vehicles").as("max_num_veh"),
        min("measurement_time").as("first_meas_time"),
        max("measurement_time").as("last_meas_time"))
        .withColumn("as_of_time", lit(clock()))
        .select("as_of_time", "avg_num_veh", "min_num_veh", "max_num_veh",
          "first_meas_time", "last_meas_time")
      if (!windowDf.isEmpty) sink.upsert(out)
    }
  }
}
