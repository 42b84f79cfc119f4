package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Multimodal, VectorIndex}

/** CONTINUOUS embedding production — the NINTH maintainer, closing the
  * multimodal loop: raw asset batches (crawled images/audio/text
  * payloads) flow through the per-partition BATCHED encoder seam
  * ([[Multimodal.embedAssets]] — one model session per partition, one
  * `embed` call per batch group) and the produced vectors fold into
  * the stored IVF index ([[VectorIndex.extend]] — one delta-sized
  * assignment pass against the FROZEN centroids), so similarity serves
  * are current to the last committed batch while the encoder only ever
  * touches new assets. This is the production shape of an embedding
  * pipeline at 100 TB: encode is map-side and incremental by
  * construction; nothing corpus-sized happens after bootstrap.
  *
  * Composition vs [[VectorIndexMaintainer]]: that maintainer ingests
  * READY vectors; this one OWNS the encode step, so the replay story
  * must cover it too — and does for free, because the encoder is a
  * pure function of the asset payload ([[Multimodal.AssetEmbedder]]
  * contract): a replayed batch re-encodes to identical vectors and
  * the ledgered extend beneath self-skips. Ledger commits LAST, the
  * shared maintainer discipline.
  *
  * Serving uses [[VectorIndex.searchMembers]] (gateless store read —
  * this maintainer's ledger owns freshness); `nProbe = centroids`
  * makes the serve exact, which is how q163 shares q162's brute-force
  * oracle.
  *
  * Batches carry [[Multimodal.Asset]] rows (`doc_id`, `content`,
  * `mime`); doc_ids must be new (the [[VectorIndex.extend]] contract).
  */
final class AssetEmbedMaintainer(
    spark: SparkSession, dataDir: String, storePath: String,
    embedder: Multimodal.AssetEmbedder = Multimodal.HashProjectionEmbedder,
    centroids: Int = 4, batchSize: Int = 64) extends Serializable {

  private def txnPath = s"${storePath}__ingest_txn"

  private def embed(assets: Dataset[Multimodal.Asset]): DataFrame =
    Multimodal.embedAssets(assets, embedder, batchSize).toDF()
      .select(col("vec_id"), col("emb").as("embedding"))

  /** Encode the historical corpus once and seed centroids + cells. */
  def bootstrap(corpus: Dataset[Multimodal.Asset]): Unit =
    VectorIndex.index(spark, embed(corpus), dataDir, centroids,
      Some(storePath)).count()

  /** Encode + fold one micro-batch of NEW assets into the index. */
  def ingestBatch(batch: Dataset[Multimodal.Asset],
                  txnId: Option[Long] = None): Unit = {
    val committed = UpsertStore.read(spark, txnPath)
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    if (txnId.exists(_ <= committed)) return
    VectorIndex.extend(spark, embed(batch), dataDir, centroids,
      Some(storePath), txnId)
    // ledger LAST: a replayed batch re-encodes deterministically and
    // the extend's own recorded txn skips the already-applied write
    txnId.foreach(t => UpsertStore.replace(spark, txnPath,
      spark.range(1).select(lit(1L).as("meta_id"), lit(t).as("txn")),
      Seq("meta_id")))
  }

  /** Top-k neighbors among the PRODUCED embeddings for member queries
    * selected by predicate, as of the last committed batch; exact when
    * `nProbe = centroids`. */
  def searchMembers(queryPred: org.apache.spark.sql.Column,
                    nProbe: Int, k: Int = 3): DataFrame =
    VectorIndex.searchMembers(spark, storePath, queryPred, nProbe, k)

  /** Wire into a streaming query: every micro-batch of assets is
    * encoded and folded into the index. */
  def run(assets: DataFrame, checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import spark.implicits._
    assets.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            ingestBatch(batch.select("doc_id", "content", "mime")
              .as[Multimodal.Asset], Some(batchId))
        } finally batch.unpersist()
      }
      .start()
  }
}
