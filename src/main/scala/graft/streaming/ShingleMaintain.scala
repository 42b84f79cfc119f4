package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.ShingleIndex

/** CONTINUOUS maintenance of the train-gram contamination index — the
  * fourth member of the maintainer set (clusters, ANN cells, BM25
  * postings, contamination grams): bootstrap from the historical train
  * corpus once, fold every arriving batch of accepted-for-training
  * documents in with [[ShingleIndex.extend]] (delta-gram df recount —
  * the old corpus is never re-shingled), and adjudicate eval sets
  * against the stored grams mid-stream. This is the shape a live
  * training pipeline needs: the decontamination gate has to be current
  * to the last batch that entered the training mix, not to the last
  * nightly rebuild.
  *
  * Replay safety mirrors [[PostingsMaintainer]]: the fingerprint
  * advance is associative, so the ledger (committed AFTER the batch's
  * writes) is the watertight guard and [[ShingleIndex.extend]]'s own
  * recorded txn self-skips the already-applied half of a replay. The
  * no-txnId fallback — all batch doc_ids already hold gram rows —
  * is best-effort only (a document shorter than the gram width leaves
  * no rows).
  *
  * Batches need (`doc_id`, `text`); doc_ids must be new (the
  * [[ShingleIndex.extend]] contract).
  */
final class ShingleMaintainer(
    spark: SparkSession, storePath: String, n: Int = 8) extends Serializable {

  /** Build the index from the historical train corpus (same-corpus
    * calls hit the fingerprint gate). */
  def bootstrap(corpus: DataFrame): Unit =
    ShingleIndex.ensure(spark, corpus, storePath, n)

  /** Fold one batch of NEW train documents into the index. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val txnPath = s"${storePath}__ingest_txn"
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    val replay = txnId.isEmpty && (UpsertStore.read(spark, storePath) match {
      case Some(postings) => batch.select("doc_id")
        .join(postings.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty
      case None => sys.error(
        s"no shingle index at $storePath — bootstrap before streaming ingest")
    })
    if (!replay) {
      ShingleIndex.extend(spark, batch, storePath, n, txnId)
      // ledger commits LAST (crash before this line replays the batch;
      // extend's own recorded txn skips the already-applied half)
      txnId.foreach(t => UpsertStore.replace(spark, txnPath,
        spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
        Seq("meta_id")))
    }
  }

  /** Adjudicate an eval batch against the index as of the last
    * committed train batch; `evalDocs` carries (doc_id, text). */
  def adjudicate(evalDocs: DataFrame, dfCap: Long = 50): DataFrame =
    ShingleIndex.probe(spark, storePath, evalDocs, n, dfCap)

  /** Wire into a streaming query: every micro-batch of accepted train
    * documents extends the index. */
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
