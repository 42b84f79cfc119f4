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

  /** RETRACT documents from the gate (round 17 — the takedown
    * lifecycle's exact-dup leg): leaves seen-table + decisions ≡ a
    * from-scratch gate over the remaining corpus. A hash group whose
    * CANONICAL is retracted but that keeps survivors RE-POINTS to the
    * min surviving doc_id (the min-id-wins rule over what remains) —
    * the promoted survivor's decision flips to 'new'; a group with no
    * survivor loses its seen row entirely, so RE-INGESTING retracted
    * content later correctly reads as new. The BLOOM keeps its stale
    * positives (a bloom cannot unlearn): it stays a SUPERSET filter,
    * which is the only property the gate's exactness rests on — a
    * stale positive costs one seen-table probe that now misses, never
    * a wrong decision.
    *
    * Replay convergence without a ledger: the blast radius is keyed
    * by CONTENT HASH (a pure function of the gone rows' text), and
    * group membership is looked up by the CURRENT canonical ∪ the
    * gone ids — so a crash at any write boundary replays to the same
    * survivor set and every write below is idempotent (same keys,
    * same values). Returns the surviving members' UPDATED decisions
    * (doc_id, first_doc_id, status) — the facts-refresh scope.
    * `gone` carries full (doc_id, text) rows of current corpus
    * members. */
  def retract(gone: DataFrame): DataFrame = {
    val goneIds = gone.select("doc_id").localCheckpoint()
    // `hashes` is consumed exactly once (the groups join) — inlined,
    // no checkpoint job of its own (round 19 job-count trim)
    val hashes = gone.select(sha2(col("text"), 256).as("content_hash"))
      .distinct()
    val seen = UpsertStore.read(spark, storePath).getOrElse(
      sys.error(s"no seen-table at $storePath — bootstrap first"))
    val dec = decisions()
    // current canonical per retracted hash (replay-stable via hash)
    val groups = seen.join(hashes, Seq("content_hash")).localCheckpoint()
    // member lookup key set: current canonical ∪ gone ids — covers
    // both the pre-retract state (old canonical may be a gone id) and
    // any partially-retracted replay state (seen already re-pointed)
    val groupKeys = groups.select(col("first_doc_id").as("gk"))
      .unionByName(goneIds.select(col("doc_id").as("gk"))).distinct()
    val memberRows = dec.join(groupKeys,
      dec("first_doc_id") === groupKeys("gk"), "left_semi")
    val survivors = memberRows.join(goneIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val newCanon = survivors.groupBy("first_doc_id")
      .agg(min("doc_id").as("new_first")).localCheckpoint()
    // seen-table: re-point groups with survivors, drop the rest — ONE
    // fused commit (VERDICT r18 #4: the re-pointed and emptied hash
    // sets are disjoint, so the fused rewrite is row-equal to the old
    // upsert-then-delete, with one commit instead of two and no
    // re-pointed-but-not-yet-dropped intermediate state; the replay
    // convergence argument is hash-keyed and order-free either way)
    val repointed = groups
      .join(newCanon, Seq("first_doc_id"))
      .select(col("content_hash"), col("new_first").as("first_doc_id"))
      .localCheckpoint()
    val emptied = groups
      .join(newCanon, Seq("first_doc_id"), "left_anti")
      .select("content_hash").localCheckpoint()
    // decisions: survivors re-pointed (promoted min flips to 'new'),
    // gone rows dropped — ONE fused commit (VERDICT r18 #4: the two
    // key sets are disjoint, so delete-then-upsert and the fused
    // rewrite are row-equal; the fusion halves the store's commit
    // count and closes the dropped-but-not-repointed crash window).
    // Seen and decisions are independent stores, their inputs are all
    // checkpointed above → the two fused commits run CONCURRENTLY
    // (the replay convergence argument is hash-keyed and order-free).
    val updated = survivors.join(newCanon, Seq("first_doc_id"))
      .select(col("doc_id"), col("new_first").as("first_doc_id"),
        when(col("doc_id") === col("new_first"), "new")
          .otherwise("duplicate").as("status"))
      .localCheckpoint()
    val seenSide = graft.Stage.detach {
      if (!repointed.isEmpty || !emptied.isEmpty)
        UpsertStore.deleteUpsert(spark, storePath, emptied, repointed,
          Seq("content_hash"), assumeKeyUnique = true)
    }
    try {
      UpsertStore.deleteUpsert(spark, decisionsPath, goneIds, updated,
        Seq("doc_id"), assumeKeyUnique = true)
      concurrent.Await.result(seenSide, concurrent.duration.Duration.Inf)
    } catch {
      case t: Throwable =>
        scala.util.Try(concurrent.Await.result(seenSide,
          concurrent.duration.Duration.Inf)).failed
          .foreach(s => if (s ne t) t.addSuppressed(s))
        throw t
    }
    updated
  }

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
