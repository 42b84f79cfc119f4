package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONTINUOUS DATA SELECTION — the TENTH maintainer: q165's two
  * unigram bag-of-words models (target-domain counts + raw-corpus
  * counts) kept current to the last committed crawl batch, so the
  * importance score that decides whether an arriving document looks
  * target-like is always priced against the FULL corpus seen so far.
  * This is the online form of importance-reweighted selection (the
  * DSIR shape): production pipelines score documents as they arrive,
  * not in a terminal batch pass, and the model the score needs is
  * exactly this vocab-sized (term, raw-count, target-count) table.
  *
  * Store traffic per batch is delta-keyed: the batch is aggregated
  * ALONE (one conditional count for both models — no second pass),
  * left-joined against the stored counts for ONLY the terms it
  * touches, and additively merged. Untouched vocabulary never moves.
  * An additive merge is NOT idempotent, so exactly-once rides the
  * [[UpsertStore.upsert]] txn ledger — a replayed batch is skipped
  * outright before any write (the [[RollupMaintainer]] discipline).
  *
  * [[serve]] replays q165's scoring tail against the COMMITTED counts:
  * smoothing totals ride in as a single-row broadcast, the corpus×vocab
  * term join is AQE-broadcastable whenever the weight table fits, and
  * the per-doc score is a partial+final regroup. Serving the whole
  * corpus after streaming it in batch-by-batch therefore equals the
  * one-shot q165 — the driver's hash compare proves it.
  *
  * Batches carry (`doc_id` long, `lang` string, `text` string).
  */
final class DsirMaintainer(
    spark: SparkSession, storePath: String,
    targetLang: String = "en") extends Serializable {

  private val keys = Seq("term")

  /** Both models out of one pass: per-term raw count `cr` and
    * target-slice count `ct`. */
  private def counts(docs: DataFrame): DataFrame =
    docs
      .select(col("lang"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term")
      .agg(count(lit(1)).as("cr"),
        sum(when(col("lang") === targetLang, 1L).otherwise(0L)).as("ct"))

  /** Seed both models from the historical corpus. */
  def bootstrap(docs: DataFrame): Unit =
    UpsertStore.replace(spark, storePath, counts(docs), keys,
      assumeKeyUnique = true)

  /** Count one batch alone, additively merge into the stored terms it
    * touches; `txnId` (the streaming batchId) makes replays no-ops
    * BEFORE any write. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val delta = counts(batch)
    val merged = UpsertStore.read(spark, storePath) match {
      case None => delta
      case Some(stored) =>
        delta.join(
            stored.select(col("term"), col("cr").as("cr0"), col("ct").as("ct0")),
            keys, "left")
          .select(col("term"),
            (col("cr") + coalesce(col("cr0"), lit(0L))).as("cr"),
            (col("ct") + coalesce(col("ct0"), lit(0L))).as("ct"))
    }
    UpsertStore.upsert(spark, storePath, merged, keys,
      assumeKeyUnique = true, txnId = txnId)
  }

  /** Score `docs` against the committed models — q165's output
    * contract (doc_id, n_tokens, log importance weight, select flag). */
  def serve(docs: DataFrame): DataFrame = {
    val m = UpsertStore.read(spark, storePath).getOrElse(
      sys.error(s"no DSIR count store at $storePath — bootstrap first"))
    val tot = m.agg(sum("cr").as("nr"), sum("ct").as("nt"),
      count(lit(1)).as("v"))
    val weights = m.crossJoin(broadcast(tot))
      .select(col("term"),
        (log((col("ct") + lit(1.0)) / (col("nt") + col("v"))) -
         log((col("cr") + lit(1.0)) / (col("nr") + col("v")))).as("lw"))
    docs
      .select(col("doc_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .filter(col("term") =!= "")
      .join(weights, keys)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lw")), 4).as("log_ir"),
        (round(sum(col("lw")), 4) > 0).as("selected"))
      .orderBy("doc_id")
  }

  /** Wire into a streaming query: every micro-batch of documents folds
    * into both models. */
  def run(docs: DataFrame, checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            ingestBatch(batch.select("doc_id", "lang", "text"), Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}
