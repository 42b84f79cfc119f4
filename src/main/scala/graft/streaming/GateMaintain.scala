package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.DedupGate

/** CONTINUOUS exact-dedup at the ingest edge — the streaming shape of
  * q121 and the fifth maintainer (clusters, ANN cells, BM25 postings,
  * contamination grams, dedup gate): every arriving micro-batch of
  * crawled documents is adjudicated against the persisted seen-table +
  * bloom ([[DedupGate]]), its decisions land in a queryable decision
  * store, and its first-occurrences fold into the gate — so the NEXT
  * batch sees this one's content. This is the operator a live crawl
  * needs: duplicates must be flagged against everything ingested so
  * far, not against the last nightly compaction.
  *
  * Replay safety differs from the other maintainers in a pleasant way:
  * [[DedupGate.gate]] is CONVERGENT under replay without a ledger —
  * re-gating a batch whose hashes are already stored resolves every
  * doc to itself as canonical ('new', the same decision the first run
  * produced), the seen-table upsert rewrites identical rows
  * (last-writer-wins), and the bloom OR-merge of a subset is a no-op.
  * Every crash window (after seen-table, after bloom, before the
  * decision write) therefore replays to the SAME decisions and the
  * same store state. The txn ledger here only short-circuits the
  * recompute; correctness never depends on it.
  *
  * Batches carry (`doc_id`, `text`); doc_ids are unique across the
  * stream (the crawl's record id).
  */
final class DedupGateMaintainer(
    spark: SparkSession, storePath: String) extends Serializable {

  private def decisionsPath = s"${storePath}__decisions"
  private def txnPath = s"${storePath}__ingest_txn"

  /** Seed the gate from the historical corpus; decisions for the seed
    * batch are recorded like any other batch's. */
  def bootstrap(corpus: DataFrame): Unit = {
    val decisions = DedupGate.ensure(spark, corpus, storePath)
    UpsertStore.replace(spark, decisionsPath, decisions, Seq("doc_id"),
      assumeKeyUnique = true)
  }

  /** Adjudicate + fold in one batch; returns its decisions. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    val decisions = DedupGate.gate(spark, batch, storePath)
    UpsertStore.upsert(spark, decisionsPath, decisions, Seq("doc_id"),
      assumeKeyUnique = true)
    // ledger commits LAST; a crash before this line replays the batch,
    // which converges to identical decisions (class doc)
    txnId.foreach(t => UpsertStore.replace(spark, txnPath,
      spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
      Seq("meta_id")))
  }

  /** The decision log as of the last committed batch:
    * (doc_id, first_doc_id, status). */
  def decisions(): DataFrame =
    UpsertStore.read(spark, decisionsPath).getOrElse(
      sys.error(s"no decision store at $decisionsPath — bootstrap first"))

  /** Wire into a streaming query: every micro-batch is gated and its
    * decisions recorded. */
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
