package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.IvfPqIndex

/** CONTINUOUS IVF-PQ INDEXING — the FIFTEENTH maintainer: the composed
  * ANN store ([[graft.operators.IvfPqIndex]], q182/q186) kept current
  * to the last committed vector batch, so similarity serves always see
  * every ingested vector at the production price (probed cells' 8-byte
  * codes + bounded re-rank) — the composed-index sibling of the IVF
  * cell maintainer (VectorIndexMaintainer) and the embed maintainer
  * (EmbedMaintainer), for pipelines whose embeddings arrive already
  * computed.
  *
  * Store traffic per batch: one delta×centroids broadcast assignment +
  * one delta×codebooks broadcast encode, then a keyed (vec_id, cell,
  * codes) upsert. Centroids and codebooks NEVER move on ingest (the
  * pinning rule — moving either would invalidate every stored row); a
  * re-train is a bootstrap against the grown corpus, a new build via
  * gate miss. Rows are last-writer-wins by vec_id, so a replayed batch
  * converges on content; the txn ledger additionally makes the replay
  * a version-level no-op and preserves the fingerprint fold (the
  * count-sum term of the fingerprint is NOT idempotent — the ledger is
  * load-bearing here, the MG/DSIR discipline, unlike the
  * simhash/trigram stores).
  *
  * Batches carry (`vec_id` long, `emb` array<double>).
  */
final class IvfPqMaintainer(spark: SparkSession, storePath: String,
                            centroids: Int = 16) extends Serializable {

  /** Seed the index (coarse centroids + PQ codebooks train HERE, on
    * the bootstrap corpus — everything later encodes against them). */
  def bootstrap(emb: DataFrame): Unit =
    IvfPqIndex.ensure(spark, emb.select("vec_id", "emb"), storePath, centroids)

  /** Fold one batch in (assign + encode vs the pinned side tables). */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit =
    IvfPqIndex.extend(spark, batch.select("vec_id", "emb"), storePath, txnId)

  /** q182's contract: IVFADC top-k for member queries from the
    * committed store. `emb` supplies raw vectors (query side + the
    * ≤ C re-rank fetches). `nProbe ≤ 0` resolves to the store-sized
    * [[graft.operators.IvfPqIndex.defaultNProbe]] fraction pin. */
  def serve(emb: DataFrame, queryPred: Column,
            nProbe: Int = -1, k: Int = 3): DataFrame =
    IvfPqIndex.search(spark, emb, storePath, queryPred, nProbe, k)

  /** ADAPTIVE-probe serve from the committed store (round 18): each
    * query stops at its own certified depth
    * ([[graft.operators.IvfPqIndex.searchAdaptive]]'s exact spherical
    * bound over the maintained `__cellstats` radii). Returns
    * (results, per-query certified depths). */
  def serveAdaptive(emb: DataFrame, queryPred: Column,
                    k: Int = 3): (DataFrame, DataFrame) =
    IvfPqIndex.searchAdaptive(spark, emb, storePath, queryPred, k)

  /** EXTERNAL-query serve (round 19 — VERDICT r18 #7): `queries`
    * carries (query_id, qe double[]) from outside the corpus — the
    * production retrieval request shape. No self-exclusion (the query
    * ids are their own namespace); same plan + recall contract as
    * [[serve]]. */
  def serveQueries(emb: DataFrame, queries: DataFrame,
                   nProbe: Int = -1, k: Int = 3): DataFrame =
    IvfPqIndex.searchQueries(spark, emb, storePath, queries, nProbe, k)

  /** [[serveAdaptive]] for EXTERNAL query vectors — the geometric
    * certificate is query-position-only and transfers unchanged. */
  def serveAdaptiveQueries(emb: DataFrame, queries: DataFrame,
                           k: Int = 3): (DataFrame, DataFrame) =
    IvfPqIndex.searchAdaptiveQueries(spark, emb, storePath, queries, k)

  /** Wire into a streaming query: every micro-batch extends the
    * composed store. */
  def run(vectors: DataFrame, checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
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
