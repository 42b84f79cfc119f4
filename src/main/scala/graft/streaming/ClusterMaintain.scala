package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.PairGraph

/** CONTINUOUS cluster maintenance — the streaming face of the
  * materialized pair graph + cluster table ([[graft.operators
  * .PairGraph]]): bootstrap both stores from the historical corpus
  * once, then fold every arriving micro-batch in with `extend` (delta
  * band probe) + `updateClusters` (contracted union-find merge), so
  * downstream consumers (`q89`-shaped cluster reads, removal plans,
  * near-dup audits) always see clusters that are current to the last
  * committed batch — without any per-batch corpus-sized work.
  *
  * Replay safety: `foreachBatch` is at-least-once, and `extend`'s
  * fingerprint advance is ASSOCIATIVE, not idempotent — a double-applied
  * batch would add its count twice and XOR its hash back OUT, leaving
  * the store permanently mismatched. Guards are LAYERED, innermost
  * first: [[PairGraph.extend]] and [[PairGraph.updateClusters]] each
  * record the batchId in their own meta and skip an already-committed
  * txn — so a crash BETWEEN the two calls replays the batch, the
  * extend self-skips, and the cluster update completes instead of
  * tripping the out-of-step guard forever (the round-7 wedge). The
  * `__ingest_txn` ledger here (committed after both writes) remains
  * the cheap outermost skip; direct callers without a txnId get a
  * best-effort guard (all ids already in the sketch index ⇒ replay).
  * Crash windows INSIDE a store mutation degrade through the store's
  * dirty-meta discipline: the gate fails for every corpus and the next
  * full serve rebuilds — degraded cost, never stale data.
  *
  * Batches need (`doc_id`, `text`); doc_ids must be new (the
  * [[PairGraph.extend]] contract).
  */
final class ClusterMaintainer(
    spark: SparkSession, dataDir: String, storePath: String,
    tau: Double = 0.6) extends Serializable {

  /** Seed pair graph + cluster table from the historical corpus (runs
    * the full chain once; subsequent calls with the same corpus hit
    * the fingerprint gate). */
  def bootstrap(corpus: DataFrame): Unit =
    PairGraph.clusters(spark, corpus, dataDir, tau, Some(storePath)).count()

  /** Fold one micro-batch of NEW docs into pairs + clusters. Replay
    * detection is layered: a `txnId` (the streaming batchId) is
    * checked against a persisted ledger — the watertight guard, since
    * ids alone can't identify a replayed batch of sketch-less short
    * docs — and with no txnId, a batch whose ids all already sit in
    * the sketch index is skipped as a best-effort fallback. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val txnPath = s"${storePath}__ingest_txn"
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    val replay = txnId.isEmpty && (UpsertStore.read(spark, s"${storePath}__sigs") match {
      case Some(sigs) => batch.select("doc_id")
        .join(sigs.select("doc_id"), Seq("doc_id"), "left_anti").isEmpty
      case None => sys.error(
        s"no sketch index at $storePath — bootstrap before streaming ingest")
    })
    if (!replay) {
      // one fingerprint scan of the batch feeds BOTH stages (each would
      // otherwise re-derive it — two extra batch scans per micro-batch,
      // pure fixed cost at any batch size)
      val fp = PairGraph.corpusFingerprint(batch)
      PairGraph.extend(spark, batch, dataDir, tau, Some(storePath), txnId,
        deltaFp = Some(fp))
      PairGraph.updateClusters(spark, batch, dataDir, tau, Some(storePath),
        txnId = txnId, deltaFp = Some(fp))
      // ledger commits LAST: a crash before this line replays the batch,
      // and each store's own recorded txn skips its already-applied half
      // — the replay completes whatever the crash interrupted
      txnId.foreach(t => UpsertStore.replace(spark, txnPath,
        spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
        Seq("meta_id")))
    }
  }

  /** RETRACT documents from pairs + clusters (round 17 — the takedown
    * lifecycle): delegates to [[PairGraph.retract]] (incident-pair
    * delete, affected-cluster re-solve with splits and min-member
    * relabeling, XOR fingerprint retreat on both metas, each phase
    * behind its own txn guard). Returns the affected SURVIVING member
    * ids — the manifest refresh scope. `txnId` is REQUIRED and forms
    * its OWN monotonic sequence, recorded in the pair/cluster metas'
    * `rtxn` column — SEPARATE from [[ingestBatch]]'s batch-id ledger
    * (the round-17 rule: retract ids must never make a later stream
    * batch, whose ids Spark's checkpoint assigns, self-skip): the XOR
    * fingerprint retreat is associative, not idempotent, so only the
    * recorded id makes a crash-replay converge. */
  def retract(gone: DataFrame, txnId: Long): DataFrame =
    PairGraph.retract(spark, gone, storePath, txnId)

  /** The cluster table as of the last committed batch (doc_id, label);
    * docs in no cluster are absent (label = self by contract). */
  def current: DataFrame =
    UpsertStore.read(spark, s"${storePath}__clusters").getOrElse(
      sys.error(s"no cluster table at $storePath — bootstrap first"))

  /** Wire into a streaming query: every micro-batch extends the pair
    * graph and folds its merges into the cluster table. */
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
