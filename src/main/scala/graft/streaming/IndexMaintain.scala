package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.VectorIndex

/** CONTINUOUS maintenance of the materialized ANN index — the
  * embedding twin of [[ClusterMaintainer]]: bootstrap the IVF cell
  * table from the historical corpus once, fold every arriving batch of
  * new vectors in with [[VectorIndex.extend]] (one delta-sized
  * assignment pass), and serve retrieval requests from the stored
  * cells ([[VectorIndex.searchIndexed]]) — so the index is current to
  * the last committed batch without any per-batch corpus-sized work.
  *
  * Replay safety mirrors [[ClusterMaintainer]]: `extend`'s fingerprint
  * advance is associative, not idempotent, so the streaming path
  * ledgers the batchId (committed AFTER the batch's writes) and skips
  * anything at or below it. For vectors the id guard used by direct
  * callers is actually COMPLETE (every vector gets a cell row — there
  * is no sketch-less-doc analogue), but the ledger stays the cheap
  * outermost streaming guard: one metadata read beats an anti-join
  * against a 100 TB cell table. Beneath it, [[VectorIndex.extend]]
  * records the batchId in its own meta and self-skips a replayed
  * committed batch; a crash INSIDE the extend degrades through the
  * store's dirty-meta rule (gate fails for every corpus, next serve
  * rebuilds) — degraded cost, never stale results.
  *
  * Batches need (`vec_id`, `embedding`); vec_ids must be new (the
  * [[VectorIndex.extend]] contract).
  */
final class VectorIndexMaintainer(
    spark: SparkSession, dataDir: String, storePath: String,
    centroids: Int = 16) extends Serializable {

  /** Seed centroids + cell table from the historical corpus (runs the
    * assignment pass once; same-corpus calls hit the fingerprint
    * gate). */
  def bootstrap(corpus: DataFrame): Unit =
    VectorIndex.index(spark, corpus, dataDir, centroids, Some(storePath)).count()

  /** Fold one batch of NEW vectors into the index. `txnId` (the
    * streaming batchId) is checked against the persisted ledger; with
    * no txnId, a batch whose vec_ids all already hold cell rows is
    * skipped — complete for vectors, but one join more expensive than
    * the ledger. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val txnPath = s"${storePath}__ingest_txn"
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    val replay = txnId.isEmpty && (UpsertStore.read(spark, storePath) match {
      case Some(cells) => batch.select("vec_id")
        .join(cells.select("vec_id"), Seq("vec_id"), "left_anti").isEmpty
      case None => sys.error(
        s"no vector index at $storePath — bootstrap before streaming ingest")
    })
    if (!replay) {
      VectorIndex.extend(spark, batch, dataDir, centroids, Some(storePath), txnId)
      // ledger commits LAST (see class doc for the crash-window story)
      txnId.foreach(t => UpsertStore.replace(spark, txnPath,
        spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
        Seq("meta_id")))
    }
  }

  /** Top-k neighbors from the index as of the last committed batch;
    * `queries` carries (query_id, qe). */
  def search(queries: DataFrame, nProbe: Int = 10, k: Int = 3): DataFrame =
    VectorIndex.searchIndexed(spark, storePath, queries, nProbe, k)

  /** Wire into a streaming query: every micro-batch of new vectors
    * extends the index. */
  def run(vectors: DataFrame, checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            ingestBatch(batch.select("vec_id", "embedding"), Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}
