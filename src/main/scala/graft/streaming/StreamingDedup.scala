package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact dedup for document ingestion: an at-least-once bus
  * (Kafka replays, producer retries) delivers duplicate documents; this
  * keeps the first arrival per content hash within the watermark
  * horizon. State carries a 32-byte hash per kept doc and expires with
  * the watermark — bounded regardless of ingest volume, which is what
  * makes it viable at 100 TB/day (SURVEY §2.7 distinct + the
  * LLM-pipeline exact-dedup op, streaming form).
  */
object StreamingDedup {

  /** @param docs streaming DataFrame with `text` and an event-time
    *             column `ts` (watermark applied here)
    * @param watermark how long duplicate arrivals can straggle */
  def exactDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
