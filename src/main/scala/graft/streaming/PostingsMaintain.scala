package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PostingsIndex

/** CONTINUOUS maintenance of the materialized BM25 postings index —
  * the sparse-retrieval member of the maintainer trio
  * ([[ClusterMaintainer]] for near-dup clusters,
  * [[VectorIndexMaintainer]] for the ANN cells): bootstrap the
  * postings / df / stats tables from the historical corpus once, fold
  * every arriving batch of new documents in with
  * [[PostingsIndex.extend]] (append-only delta postings, delta-term df
  * recount, exact-integer stats advance — the old corpus is never
  * re-tokenized), and serve retrieval requests from the stored index
  * ([[PostingsIndex.search]]) — current to the last committed batch
  * with per-batch cost ∝ |delta|.
  *
  * Replay safety mirrors [[ClusterMaintainer]]: the stats fingerprint
  * advance is associative, not idempotent, so the streaming path
  * ledgers the batchId (committed AFTER the batch's writes) and skips
  * anything at or below it. Beneath it, [[PostingsIndex.extend]]
  * records the txn in its own stats row and self-skips a replayed
  * committed batch; the df recount (count from the store, not an
  * increment) is what makes a crash-retry converge from a
  * half-applied delta. The no-txnId fallback — all batch doc_ids
  * already hold postings rows ⇒ replay — is best-effort only: a
  * zero-token document leaves no postings row (the sketch-less-doc
  * analogue), so the ledger stays the watertight guard.
  *
  * Batches need (`doc_id`, `text`); doc_ids must be new (the
  * [[PostingsIndex.extend]] contract).
  */
final class PostingsMaintainer(
    spark: SparkSession, storePath: String) extends Serializable {

  /** Build the index from the historical corpus (same-corpus calls hit
    * the fingerprint gate). */
  def bootstrap(corpus: DataFrame): Unit =
    PostingsIndex.ensure(spark, corpus, storePath)

  /** Fold one batch of NEW documents into the index. `txnId` (the
    * streaming batchId) is checked against the persisted ledger; with
    * no txnId, a batch whose doc_ids all already hold postings rows is
    * skipped — best-effort (see class doc). */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val txnPath = s"${storePath}__ingest_txn"
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    val replay = txnId.isEmpty && (UpsertStore.read(spark, storePath) match {
      case Some(postings) => batch.select("doc_id")
        .join(postings.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty
      case None => sys.error(
        s"no postings index at $storePath — bootstrap before streaming ingest")
    })
    if (!replay) {
      PostingsIndex.extend(spark, batch, storePath, txnId)
      // ledger commits LAST (crash before this line replays the batch;
      // extend's own recorded txn skips the already-applied half)
      txnId.foreach(t => UpsertStore.replace(spark, txnPath,
        spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
        Seq("meta_id")))
    }
  }

  /** BM25 scores from the index as of the last committed batch;
    * `queries` carries (query_id, term). */
  def search(queries: DataFrame): DataFrame =
    PostingsIndex.search(spark, storePath, queries)

  /** Wire into a streaming query: every micro-batch of new documents
    * extends the index. */
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
            ingestBatch(batch.select("doc_id", "text"), Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}
