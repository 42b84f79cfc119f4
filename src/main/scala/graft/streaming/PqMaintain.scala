package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PqIndex

/** CONTINUOUS maintenance of the PRODUCT-QUANTIZATION index — the
  * compressed member of the maintainer set: bootstrap codebooks +
  * packed codes from the historical corpus once, then fold every
  * arriving batch of new vectors in with [[PqIndex.extend]] (one
  * delta-sized encode pass against the PINNED stored codebooks — the
  * old corpus is never re-read, and codebooks never move mid-stream,
  * which is exactly what keeps every previously stored code valid).
  * Retrieval between batches pays only the ADC scan over the 8-byte
  * codes.
  *
  * Replay safety is the [[VectorIndexMaintainer]] story verbatim: the
  * fingerprint advance is associative, so the ledger (committed AFTER
  * the batch's writes) is the outer guard, [[PqIndex.extend]]'s own
  * recorded txn self-skips the already-applied half of a replay, and
  * a crash inside the extend degrades through the dirty-meta rule to
  * a rebuild — degraded cost, never stale codes. The no-txnId
  * fallback (all batch vec_ids already hold code rows) is complete
  * for vectors, just one join dearer than the ledger read.
  *
  * Batches carry (`vec_id`, `emb` double[]); vec_ids must be new (the
  * [[PqIndex.extend]] contract).
  */
final class PqIndexMaintainer(
    spark: SparkSession, storePath: String) extends Serializable {

  /** Train codebooks + encode the historical corpus (same-corpus
    * calls hit the fingerprint gate). */
  def bootstrap(corpus: DataFrame): Unit =
    PqIndex.ensure(spark, corpus, storePath).count()

  /** Encode one batch of NEW vectors against the pinned codebooks. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val txnPath = s"${storePath}__ingest_txn"
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    val replay = txnId.isEmpty && (UpsertStore.read(spark, storePath) match {
      case Some(codes) => batch.select("vec_id")
        .join(codes.select("vec_id"), Seq("vec_id"), "left_anti").isEmpty
      case None => sys.error(
        s"no pq index at $storePath — bootstrap before streaming ingest")
    })
    if (!replay) {
      PqIndex.extend(spark, batch, storePath, txnId)
      txnId.foreach(t => UpsertStore.replace(spark, txnPath,
        spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
        Seq("meta_id")))
    }
  }

  /** ADC + exact-rerank search over the index as of the last committed
    * batch. `emb` supplies raw vectors for queries and rerank (the
    * [[PqIndex.search]] contract). */
  def search(emb: DataFrame, queryPred: org.apache.spark.sql.Column,
             k: Int = 3): DataFrame =
    PqIndex.search(spark, emb, storePath, queryPred, k)

  /** Wire into a streaming query: every micro-batch of new vectors
    * extends the stored codes. */
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
            ingestBatch(batch.select("vec_id", "emb"), Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}
