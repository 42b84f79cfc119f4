package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming trending-token tracker: event-time windowed token counts
  * over a document stream, reduced to the top-k tokens per window —
  * the "what is the corpus saying right now" feed of an ingest
  * pipeline.
  *
  * Shape: the ONLY unbounded-cardinality aggregation (per-token counts)
  * runs as a watermarked streaming aggregation in APPEND mode, so each
  * (window, token) count is emitted exactly once, fully finalized, when
  * the watermark passes the window end — and all rows of a window
  * finalize in the same micro-batch. The top-k reduction then runs per
  * batch inside foreachBatch (map-side partial heaps, k rows out per
  * window) and upserts by (window_start, rk): a replayed batch
  * overwrites the same keys. State is bounded by the watermark; the
  * heap by k.
  */
object TrendingTokens {

  /** Finalized (window_start_ms, token, n) counts — append mode. */
  def windowedCounts(docs: DataFrame,
                     windowLen: String = "60 seconds",
                     slide: String = "30 seconds",
                     watermark: String = "10 seconds"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"), explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(window(col("ts"), windowLen, slide), col("token"))
      .agg(count(lit(1)).as("n"))
      // exact millisecond epoch (unix_timestamp truncates to seconds;
      // a double round-trip can lose a ulp at epoch-ms magnitudes)
      .select(expr("unix_millis(window.start)").as("window_start"),
        col("token"), col("n"))

  /** Wire to a sink keyed by (window_start, rk). */
  def run(docs: DataFrame, sink: UpsertSink, checkpointDir: String, k: Int = 5,
          windowLen: String = "60 seconds", slide: String = "30 seconds",
          watermark: String = "10 seconds",
          trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    windowedCounts(docs, windowLen, slide, watermark).writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) {
            // rank with a window function (sort-based, spill-safe — no
            // per-group buffering), ties broken (n desc, token asc)
            val w = org.apache.spark.sql.expressions.Window
              .partitionBy("window_start").orderBy(col("n").desc, col("token"))
            val topk = batch
              .withColumn("rk", row_number().over(w).cast("long"))
              .filter(col("rk") <= k)
              .select("window_start", "rk", "token", "n")
            // key-unique by construction; batchId for replay skipping
            sink.upsertUnique(topk, txnId = Some(batchId))
          }
        } finally batch.unpersist()
      }
      .start()

  /** Batch twin over the events-style document table — same transform
    * chain on a static DataFrame (used by the spec as the golden
    * reference for the streaming output). */
  def batchTopK(docs: DataFrame, k: Int = 5,
                windowLen: String = "60 seconds",
                slide: String = "30 seconds"): DataFrame = {
    val counts = docs
      .select(col("ts"), explode(graft.operators.TextAnalysis.tokens(col("text"))).as("token"))
      .groupBy(window(col("ts"), windowLen, slide), col("token"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_millis(window.start)").as("window_start"),
        col("token"), col("n"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("window_start").orderBy(col("n").desc, col("token"))
    counts
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select("window_start", "rk", "token", "n")
  }
}
