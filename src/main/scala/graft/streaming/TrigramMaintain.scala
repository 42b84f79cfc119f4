package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.TrigramIndex

/** CONTINUOUS SUBSTRING INDEXING — the FOURTEENTH maintainer: the
  * character-trigram postings index ([[graft.operators.TrigramIndex]],
  * q174/q179/q181) kept current to the last committed crawl batch, so
  * a LIKE-'%pat%' or regex query always serves from postings that
  * include every ingested document — the substring twin of the BM25
  * postings maintainer (PostingsMaintainer) and the near-dup simhash
  * maintainer (SimhashMaintainer).
  *
  * Store traffic per batch: one trigram explode over the batch, then
  * a keyed postings upsert — idempotent by (gram, doc_id), so a
  * replayed batch rewrites identical rows — and a df refresh that
  * RECOUNTS the touched grams from the just-upserted postings store
  * ([[TrigramIndex.extend]]'s ADVICE-r14 rule), so df is exact under
  * any replay or doc overlap WITHOUT needing the ledger: both stores
  * are idempotent by construction (the gate/postings discipline; the
  * txn ledger is still written for restart bookkeeping, and skips the
  * recount cost on a recognized replay).
  *
  * Batches carry (`doc_id` long, `text` string).
  */
final class TrigramMaintainer(spark: SparkSession, storePath: String)
    extends Serializable {

  /** Seed the index from the historical corpus. */
  def bootstrap(docs: DataFrame): Unit =
    TrigramIndex.build(spark, docs.select("doc_id", "text"), storePath)

  /** Fold one batch in (postings upsert idempotent; df recounted). */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit =
    TrigramIndex.extend(spark, batch.select("doc_id", "text"), storePath, txnId)

  /** q174's contract: literal substring search from the committed
    * index — (query, doc_id) for every doc containing the pattern. */
  def serve(patterns: DataFrame, corpus: DataFrame): DataFrame =
    TrigramIndex.search(spark, storePath, patterns, corpus)

  /** q181's contract: regex search from the committed index. */
  def serveRegex(patterns: Seq[String], corpus: DataFrame): DataFrame =
    TrigramIndex.regexSearch(spark, storePath, patterns, corpus)

  /** Wire into a streaming query: every micro-batch extends the
    * postings + df stores. */
  def run(docs: DataFrame, checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            ingestBatch(batch.select("doc_id", "text"), Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}
