package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.SimhashIndex

/** CONTINUOUS SIMHASH INDEXING — the THIRTEENTH maintainer: the
  * banded-fingerprint near-dup index ([[graft.operators.SimhashIndex]])
  * kept current to the last committed crawl batch, so an incoming
  * document (or an eval set) can be probed for near-duplication
  * against everything indexed WITHOUT a corpus self-join — the
  * near-dup twin of the contamination gram index (q108/q109's
  * ShingleMaintainer), sitting between the exact-dup gate (byte
  * identity) and the cluster maintainer (full clustering of the
  * ingested corpus).
  *
  * Store traffic per batch: one fingerprint map pass over the batch,
  * then keyed upserts — (doc_id → fp) rows and the batch's DISTINCT
  * fingerprints' 8 chunk-posting rows. Both stores are idempotent by
  * key, so a replayed batch rewrites identical rows — replay-safe
  * with or without the txn ledger (the gate/postings discipline; the
  * ledger is still written for restart bookkeeping).
  *
  * Batches carry (`doc_id` long, `text` string).
  */
final class SimhashMaintainer(spark: SparkSession, storePath: String)
    extends Serializable {

  /** Seed the index from the historical corpus. */
  def bootstrap(docs: DataFrame): Unit =
    SimhashIndex.build(spark, docs.select("doc_id", "text"), storePath)

  /** Fold one batch in (keyed upserts; idempotent on replay). */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit =
    SimhashIndex.extend(spark, batch.select("doc_id", "text"), storePath, txnId)

  /** q176's contract: probe `evalDocs` against the committed index,
    * exact Jaccard ≥ `tau` pairs (test_doc, train_doc, jaccard). */
  def serve(evalDocs: DataFrame, corpus: DataFrame,
            tau: Double = 0.6): DataFrame =
    SimhashIndex.serve(spark, storePath, evalDocs, corpus, tau)

  /** Wire into a streaming query: every micro-batch extends the
    * fingerprint + chunk-posting stores. */
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
