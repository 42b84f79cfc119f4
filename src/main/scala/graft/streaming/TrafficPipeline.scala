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

  private def toMillis(s: String): Long = {
    val Array(n, unit) = s.trim.split("\\s+")
    unit.stripSuffix("s") match {
      case "millisecond" => n.toLong
      case "second" => n.toLong * 1000L
      case "minute" => n.toLong * 60000L
      case "hour" => n.toLong * 3600000L
      case u => throw new IllegalArgumentException(s"unsupported duration unit $u")
    }
  }

  /** End-to-end streaming query: source (any streaming DataFrame with a
    * string `value` column — Kafka in production, MemoryStream in
    * tests) → parse → window agg → foreachBatch upsert.
    *
    * Update output mode + keyed upsert ⇒ late data (within the
    * watermark) re-emits its window, which overwrites the same
    * `as_of_time` row — the sink converges to the correct aggregate
    * (idempotent under foreachBatch retries too; SURVEY §7.3 item 3).
    *
    * Execution strategy: TWO-LEVEL aggregation when the window length
    * is a multiple of the slide. Spark's sliding `window()` explodes
    * every input row into windowLen/slide instances BEFORE the shuffle
    * (12× the shuffle input at 60 s/5 s — the round-1 B2 bottleneck),
    * so the streaming agg here reduces rows into TUMBLING slide-width
    * buckets (1 instance/row, partial-aggregated map-side), and
    * foreachBatch re-derives every sliding window touching an updated
    * bucket from the persistent bucket table (sum/count/min/max
    * compose exactly; avg = sum/count). The sink contents are
    * row-for-row identical to the direct sliding aggregation — pinned
    * by the golden-row specs — at ~1/12 the shuffle volume. Buckets
    * older than watermark + window can no longer change any emitted
    * window and are pruned on a fixed cadence, so the bucket table is
    * bounded like any watermarked state.
    */
  def run(source: DataFrame,
          sink: UpsertSink,
          checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds"),
          windowLen: String = "60 seconds",
          slide: String = "5 seconds",
          watermark: String = "10 seconds"): StreamingQuery = {
    val (windowMs, slideMs, watermarkMs) =
      (toMillis(windowLen), toMillis(slide), toMillis(watermark))
    if (windowMs % slideMs != 0) {
      // non-aligned window/slide: direct sliding aggregation
      val agg = aggregate(parse(source), windowLen, slide, watermark)
      return agg.writeStream
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

    val bucketPath = s"$checkpointDir/buckets.tsv"
    val span = windowMs - slideMs
    // The bucket table is metadata-scale — O(window/slide + watermark)
    // entries regardless of ingest volume — so the sliding roll-up runs
    // on a driver-side map (no per-batch store scan, no extra shuffle),
    // snapshotted to ONE driver-written file per batch (atomic tmp +
    // rename, the same discipline as the engine's own offset log — no
    // Spark job) and rehydrated on (re)start. Cumulative bucket values
    // come from the streaming agg's own state, so a replayed batch
    // converges.
    val bucketMap = scala.collection.mutable.Map.empty[Long, (Long, Long, Int, Int, Long, Long)]
    var hydrated = false

    def saveBuckets(spark: SparkSession): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val dst = new org.apache.hadoop.fs.Path(bucketPath)
      val tmp = new org.apache.hadoop.fs.Path(bucketPath + ".tmp")
      val fs = dst.getFileSystem(conf)
      val out = fs.create(tmp, true)
      try {
        val text = bucketMap.iterator.map { case (k, (a, b, c, d, e, f)) =>
          s"$k,$a,$b,$c,$d,$e,$f"
        }.mkString("\n")
        out.write(text.getBytes("UTF-8"))
      } finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(dst.toUri, conf)
        .rename(tmp, dst, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
    def loadBuckets(spark: SparkSession): Unit = {
      val conf = spark.sparkContext.hadoopConfiguration
      val p = new org.apache.hadoop.fs.Path(bucketPath)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) {
        val in = fs.open(p)
        val text = try {
          val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
          in.readFully(0, buf); new String(buf, "UTF-8")
        } finally in.close()
        text.linesIterator.filter(_.nonEmpty).foreach { line =>
          val a = line.split(',')
          bucketMap += a(0).toLong ->
            (a(1).toLong, a(2).toLong, a(3).toInt, a(4).toInt, a(5).toLong, a(6).toLong)
        }
      }
    }
    val buckets = parse(source)
      .withColumn("ts", timestamp_millis(col("measurement_time")))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), slide))
      .agg(
        count(lit(1)).as("cnt"),
        sum("number_of_vehicles").as("sum_veh"),
        min("number_of_vehicles").as("min_veh"),
        max("number_of_vehicles").as("max_veh"),
        min("measurement_time").as("first_t"),
        max("measurement_time").as("last_t"))
      // exact millisecond epoch (unix_timestamp truncates to whole
      // seconds and would merge sub-second buckets; a double round-trip
      // can lose a ulp at epoch-ms magnitudes)
      .select(expr("unix_millis(window.start)").as("bucket_start"),
        col("cnt"), col("sum_veh"), col("min_veh"), col("max_veh"),
        col("first_t"), col("last_t"))

    buckets.writeStream
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // one collect serves the empty-check, the driver map, and both
        // store writes — the batch is keyed-aggregation output, orders
        // of magnitude smaller than the input rows
        val updated = batch.collect()
        if (updated.nonEmpty) {
          val spark = batch.sparkSession
          def entry(r: org.apache.spark.sql.Row) =
            r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getInt(3), r.getInt(4),
              r.getLong(5), r.getLong(6))
          if (!hydrated) { loadBuckets(spark); hydrated = true }
          updated.foreach(r => bucketMap += entry(r))
          val lo = updated.iterator.map(_.getLong(0)).min - span
          val hi = updated.iterator.map(_.getLong(0)).max
          // prune buckets no future window can touch BEFORE the
          // snapshot, so the persisted file stays bounded too
          val horizon = hi - windowMs - watermarkMs
          bucketMap.keys.filter(_ < horizon).toList.foreach(bucketMap.remove)
          saveBuckets(spark)
          val winRows = (lo to hi by slideMs).flatMap { s =>
            val bs = (s to s + span by slideMs).flatMap(bucketMap.get)
            if (bs.isEmpty) None
            else {
              val cnt = bs.iterator.map(_._1).sum
              val avg = BigDecimal(bs.iterator.map(_._2).sum.toDouble / cnt)
                .setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble
              Some((s, avg, bs.iterator.map(_._3).min, bs.iterator.map(_._4).max,
                bs.iterator.map(_._5).min, bs.iterator.map(_._6).max))
            }
          }
          import spark.implicits._
          val winDf = winRows.toDF("as_of_time", "avg_num_veh", "min_num_veh",
            "max_num_veh", "first_meas_time", "last_meas_time")
          // batchId as the transaction id: a replayed batch after a
          // crash is skipped at the sink instead of rewritten (sinks
          // that can't exploit the hints fall back to plain upsert)
          sink.upsertUnique(winDf, txnId = Some(batchId))
        }
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
