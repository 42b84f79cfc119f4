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

  /** RETRACT documents from both models (round 18 — VERDICT r17 #2:
    * the additive stores owe an EXACT-SUBTRACTION takedown, not
    * silence). The gone batch is counted alone — the same single pass
    * as [[ingestBatch]] — and subtracted term-by-term; terms whose raw
    * count empties lose their ROW (a from-scratch bootstrap over the
    * remaining corpus has no row for a vanished term; `ct ≤ cr` by
    * construction, so `cr = 0 ⟹ ct = 0`).
    *
    * Crash discipline: a subtraction is NOT idempotent and — unlike
    * the index families' key deletes — cannot be recomputed after the
    * store mutates, so the POST-RETRACTION target values are persisted
    * txn-keyed BEFORE any store write (the `__retract_scope`
    * discipline from the curation maintainer): a replay finds the
    * snapshot and re-applies absolute values (idempotent) instead of
    * re-subtracting. The retraction ledger (separate from the ingest
    * ledger, the round-17 rule) commits LAST; committed snapshots are
    * pruned after the commit. Contract: every retracted doc must have
    * been ingested. */
  def retract(gone: DataFrame, txnId: Long): Unit = {
    if (txnId <= Retraction.committed(spark, storePath)) return
    val pendPath = s"${storePath}__retract_pending"
    val havePending = UpsertStore.read(spark, pendPath)
      .exists(!_.filter(col("txn") === txnId).isEmpty)
    if (!havePending) {
      val stored = UpsertStore.read(spark, storePath).getOrElse(
        sys.error(s"no DSIR count store at $storePath — bootstrap first"))
      // doc_id-keyed dedup: a doc repeated in the takedown batch must
      // subtract ONCE (the counts explode is per row, and subtraction
      // — unlike the index families' keyed deletes — is not idempotent
      // under input duplication; the engine-wide Retraction.dedupBatch
      // guard, spec-pinned in RetractionPolicySpec)
      val target = counts(Retraction.dedupBatch(gone, "doc_id"))
        .join(stored.select(col("term"), col("cr").as("cr0"), col("ct").as("ct0")),
          keys, "inner")
        .select(col("term"),
          (col("cr0") - col("cr")).as("cr"),
          (col("ct0") - col("ct")).as("ct"))
      UpsertStore.upsert(spark, pendPath,
        target.withColumn("txn", lit(txnId)), Seq("txn", "term"),
        assumeKeyUnique = true)
    }
    val pend = UpsertStore.read(spark, pendPath).get
      .filter(col("txn") === txnId).drop("txn")
    UpsertStore.upsert(spark, storePath, pend.filter(col("cr") > 0), keys,
      assumeKeyUnique = true)
    val vanished = pend.filter(col("cr") <= 0).select("term").localCheckpoint()
    if (!vanished.isEmpty) UpsertStore.delete(spark, storePath, vanished, keys)
    Retraction.commit(spark, storePath, txnId)
    // prune the committed snapshot (monotonic ids: everything ≤ txnId
    // is dead; a crash here leaves rows the next retract's prune sweeps)
    val dead = UpsertStore.read(spark, pendPath).get
      .filter(col("txn") <= txnId).select("txn", "term").localCheckpoint()
    if (!dead.isEmpty) UpsertStore.delete(spark, pendPath, dead, Seq("txn", "term"))
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
