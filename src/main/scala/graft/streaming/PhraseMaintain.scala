package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.PhraseIndex

/** CONTINUOUS PHRASE INDEXING — the SIXTEENTH maintainer: the
  * positional postings store ([[graft.operators.PhraseIndex]], q191)
  * kept current to the last committed crawl batch, so an exact-phrase
  * query always serves from postings that include every ingested
  * document — the positional twin of [[TrigramMaintainer]] (substring)
  * and [[PostingsMaintainer]] (BM25).
  *
  * Store traffic per batch: one tokenize + (term, doc_id) groupBy over
  * the batch, then a keyed upsert. The store is the SIMPLEST of the
  * index-maintainer family to keep consistent: each (term, doc_id)
  * row's position array is a pure function of that document's text,
  * so a replayed or doc-overlapping batch recomputes BYTE-IDENTICAL
  * rows under the same keys — content-idempotent with no recount pass
  * (the trigram df's cost) and no load-bearing ledger (the IVF-PQ
  * fingerprint's constraint). The txn ledger is still written for
  * restart bookkeeping and lets a recognized replay skip entirely.
  *
  * Batches carry (`doc_id` long, `text` string).
  */
final class PhraseMaintainer(spark: SparkSession, storePath: String)
    extends Serializable {

  /** Seed the index from the historical corpus. */
  def bootstrap(docs: DataFrame): Unit =
    PhraseIndex.build(spark, docs.select("doc_id", "text"), storePath)

  /** Fold one batch in (positions recompute idempotently by key). */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit =
    PhraseIndex.extend(spark, batch.select("doc_id", "text"), storePath, txnId)

  /** q191's contract: exact-phrase search from the committed index —
    * (query, doc_id, n_hits), overlap-aware. */
  def serve(phrases: DataFrame): DataFrame =
    PhraseIndex.search(spark, storePath, phrases)

  /** Wire into a streaming query: every micro-batch extends the
    * positional store. */
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
