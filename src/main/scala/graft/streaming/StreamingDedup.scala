package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming dedup for document ingestion — exact and NEAR-dup forms.
  *
  * Exact: an at-least-once bus (Kafka replays, producer retries)
  * delivers duplicate documents; keep the first arrival per content
  * hash within the watermark horizon. State carries a 32-byte hash per
  * kept doc and expires with the watermark — bounded regardless of
  * ingest volume, which is what makes it viable at 100 TB/day
  * (SURVEY §2.7 distinct + the LLM-pipeline exact-dedup op,
  * streaming form).
  *
  * Near-dup: [[StreamingNearDup]] — MinHash banding against a
  * persistent, retention-bounded band index (see its doc).
  */
object StreamingDedup {

  /** @param docs streaming DataFrame with `text` and an event-time
    *             column `ts` (watermark applied here)
    * @param watermark how long duplicate arrivals can straggle */
  def exactDedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("content_hash", sha2(col("text"), 256))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}

/** Streaming NEAR-duplicate suppression: per micro-batch MinHash
  * banding probed against a persistent band index.
  *
  * Within a batch, docs that band-collide with an earlier (smaller
  * doc_id) doc and match at ≥ tau are dropped; survivors are checked
  * the same way against the index of previously-kept docs, then added
  * to it. Two decision modes:
  *
  *  - `exactVerify = false` (default): the MinHash ESTIMATE decides
  *    (k=32 ⇒ stderr ≈ 0.09 at tau=0.6) — the smallest state
  *    footprint; the batch pipeline remains ground truth for backfills.
  *  - `exactVerify = true`: band candidates are verified by EXACT
  *    Jaccard over the HASHED shingle sets (`hsh`, array<long> — the
  *    q47 cache discipline: ~8 B/shingle persisted and stored, never
  *    the ~25 B/shingle strings; set identity over xxhash64'd shingles
  *    equals string-set identity up to a 64-bit collision, the same
  *    argument as the batch chain) — streaming decisions then EQUAL
  *    the batch pipeline's on the same corpus (spec-pinned). Costs:
  *    hashed sets ride along in the signature store (state per kept
  *    doc grows from k longs to k + |shingles| longs) and candidate
  *    pairs join them at verify time. Choose per table; a store
  *    written in one mode (or the pre-r7 string-shingle schema) must
  *    be rebuilt to be probed in the other.
  *
  * Built on `foreachBatch` + [[UpsertStore]] rather than a second
  * stateful operator so the band index shares the sink's atomic-commit
  * machinery and is queryable between batches; the exact-dedup stage
  * ([[StreamingDedup.exactDedupStream]]) can run upstream in the same
  * query, mirroring the batch pipeline's dedup-first composition.
  *
  * State is BOUNDED: band entries and signatures carry their event
  * time, and every `pruneEvery` batches entries older than
  * `retentionMs` behind the newest seen event time are dropped (the
  * watermark analogue) — so index size tracks the retention window,
  * not stream history. A near-dup arriving after retention is kept:
  * same contract as `dropDuplicatesWithinWatermark`.
  *
  * @param bandsPath band index store: (band, band_hash) → doc_id, ts_ms
  * @param sigsPath  signature store: doc_id → sig, ts_ms
  */
final class StreamingNearDup(
    spark: SparkSession, bandsPath: String, sigsPath: String,
    tau: Double = 0.6, retentionMs: Long = 3600L * 1000,
    k: Int = 32, bands: Int = 16, pruneEvery: Int = 8,
    exactVerify: Boolean = false) extends Serializable {
  private val rows = k / bands
  private var batchCount = 0L

  private def est(sigA: String, sigB: String) =
    expr(s"aggregate(zip_with($sigA, $sigB, (x, y) -> IF(x = y, 1, 0)), 0, " +
      s"(acc, v) -> acc + v) / CAST($k AS DOUBLE)")

  private def exactJac(shA: String, shB: String) =
    size(array_intersect(col(shA), col(shB))).cast("double") /
      size(array_union(col(shA), col(shB))).cast("double")

  /** Columns persisted per kept doc (exact mode adds the HASHED
    * shingle set — longs only, the q47 cache discipline). */
  private def sigCols: Seq[String] =
    if (exactVerify) Seq("doc_id", "sig", "hsh", "ts_ms")
    else Seq("doc_id", "sig", "ts_ms")

  private def banded(sigs: DataFrame): DataFrame =
    sigs.select(
      col("doc_id"), col("ts_ms"),
      posexplode(graft.operators.Dedup.bandHashes(bands, rows)))
      .select(col("doc_id"), col("ts_ms"), col("pos").as("band"), col("col").as("band_hash"))

  /** Seed the band/signature index from a BATCH corpus — the
    * backfill→streaming migration path (VERDICT r6 #2's "streaming
    * near-dup bootstrap"): dedupe the historical corpus with the batch
    * pipeline once, bootstrap the index from the kept docs, then let
    * the stream dedupe incrementally against that history. Uses the
    * same sketch projection and commit order as [[dedupeBatch]] step 3
    * (sigs first — bands are the probe entry point), and composes with
    * [[graft.operators.PairGraph]]: bootstrap from the corpus the pair
    * graph was built on and streaming decisions continue exactly where
    * the batch graph left off.
    *
    * `docs` needs (`doc_id`, `text`, `ts`); the index treats every
    * bootstrapped doc as kept (dedupe the corpus FIRST — this seeds,
    * it does not re-decide). */
  def bootstrap(docs: DataFrame): Unit = {
    val sigs = graft.operators.Dedup.shingleArrayNonEmpty(docs)
      .select(
        Seq(col("doc_id"), expr("unix_millis(ts)").as("ts_ms"),
          TextFunctions.minhash_signature(col("shingles"), k, seed = 42L).as("sig")) ++
          (if (exactVerify)
            Seq(graft.operators.Dedup.hashedShingleCols.as("hsh")) else Nil): _*)
      .localCheckpoint()
    UpsertStore.insertIgnore(spark, sigsPath,
      sigs.select(sigCols.map(col): _*), Seq("doc_id"))
    UpsertStore.insertIgnore(spark, bandsPath,
      banded(sigs).select("band", "band_hash", "doc_id", "ts_ms"),
      Seq("band", "band_hash"))
  }

  /** Process one micro-batch (`doc_id`, `text`, `ts`); returns the
    * near-dup survivors and folds them into the index. */
  def dedupeBatch(batch: DataFrame): DataFrame = {
    batchCount += 1
    // ONE projection derives both downstream forms of the shingle set
    // (hashed set for the exact verify, MinHash signature for banding),
    // so the persist holds long arrays only — never shingle strings
    val sigs = graft.operators.Dedup.shingleArrayNonEmpty(batch)
      .select(
        Seq(col("doc_id"), expr("unix_millis(ts)").as("ts_ms"),
          TextFunctions.minhash_signature(col("shingles"), k, seed = 42L).as("sig")) ++
          (if (exactVerify)
            Seq(graft.operators.Dedup.hashedShingleCols.as("hsh")) else Nil): _*)
      .persist()
    val b = banded(sigs)

    // 1. within-batch: drop docs near-dup of an earlier doc in the batch
    val inBatchCand = b.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(b.select(col("band"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val inBatch = (
      if (exactVerify)
        inBatchCand
          .join(sigs.select(col("doc_id").as("doc_a"), col("hsh").as("sh_a")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("hsh").as("sh_b")), "doc_b")
          .filter(exactJac("sh_a", "sh_b") >= tau)
      else
        inBatchCand
          .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
          .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
          .filter(est("sig_a", "sig_b") >= tau)
      ).select(col("doc_b").as("doc_id")).distinct()

    // 2. vs the index of previously-kept docs. The doc_id =!= rep_id
    // guard makes a REPLAYED batch (foreachBatch is at-least-once, and
    // the index commits before the caller's output write) re-emit its
    // docs instead of dropping them against their own index entries —
    // at-least-once output, never data loss. Both stores read via the
    // same defensive path (a crash can leave one store a step behind).
    val vsIndex = (UpsertStore.read(spark, bandsPath), UpsertStore.read(spark, sigsPath)) match {
      case (Some(idx), Some(sigStore)) =>
        val cand = b.join(idx.select(col("band"), col("band_hash"), col("doc_id").as("rep_id")),
            Seq("band", "band_hash"))
          .filter(col("doc_id") =!= col("rep_id"))
          .select("doc_id", "rep_id").distinct()
        (if (exactVerify)
          cand
            .join(sigs.select(col("doc_id"), col("hsh")), "doc_id")
            .join(sigStore.select(col("doc_id").as("rep_id"),
              col("hsh").as("rep_hsh")), "rep_id")
            .filter(exactJac("hsh", "rep_hsh") >= tau)
        else
          cand
            .join(sigs.select(col("doc_id"), col("sig")), "doc_id")
            .join(sigStore.select(col("doc_id").as("rep_id"), col("sig").as("rep_sig")), "rep_id")
            .filter(est("sig", "rep_sig") >= tau)
          ).select("doc_id").distinct()
      case _ => inBatch.limit(0)
    }

    val dropped = inBatch.unionByName(vsIndex).distinct()
    // eager + lineage-truncating: the decision must be materialized
    // BEFORE the index commits below — store GC retires the parquet
    // versions this plan is reading, so a lazy `kept` would fail later
    val kept = batch.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint()

    // 3. index the kept docs (first writer wins on a band); same
    // materialize-before-commit rule as `kept`. Sigs commit FIRST:
    // bands are the probe entry point, so a crash between the two
    // commits leaves orphan sigs (harmless, pruned later) rather than
    // bands referencing missing signatures
    val keptSigs = sigs.join(dropped, Seq("doc_id"), "left_anti").localCheckpoint()
    UpsertStore.insertIgnore(spark, sigsPath,
      keptSigs.select(sigCols.map(col): _*), Seq("doc_id"))
    UpsertStore.insertIgnore(spark, bandsPath,
      banded(keptSigs).select("band", "band_hash", "doc_id", "ts_ms"),
      Seq("band", "band_hash"))

    // 4. retention pruning (amortized): expire index entries older than
    // the horizon so state stays bounded by the retention window
    if (batchCount % pruneEvery == 0) {
      val maxTs = sigs.agg(max("ts_ms")).head()
      if (!maxTs.isNullAt(0)) {
        val horizon = maxTs.getLong(0) - retentionMs
        Seq(bandsPath, sigsPath).foreach { p =>
          UpsertStore.read(spark, p).foreach { s =>
            UpsertStore.replace(spark, p, s.filter(col("ts_ms") >= horizon),
              if (p == bandsPath) Seq("band", "band_hash") else Seq("doc_id"))
          }
        }
      }
    }
    sigs.unpersist()
    kept
  }

  /** Wire into a streaming query: kept docs append to `outPath`. */
  def run(docs: DataFrame, outPath: String, checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            dedupeBatch(batch).write
              .mode(org.apache.spark.sql.SaveMode.Append).parquet(outPath)
        } finally batch.unpersist()
      }
      .start()
}
