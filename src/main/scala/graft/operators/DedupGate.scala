package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions
import graft.streaming.UpsertStore

/** Incremental EXACT-DEDUP INGEST GATE — the production shape of q45:
  * a persistent `(content_hash → first_doc_id)` seen-table
  * ([[UpsertStore]]) plus a persisted BLOOM of the seen hashes, so
  * each arriving batch adjudicates new-vs-duplicate by
  *
  *   1. probing the bloom MAP-SIDE (no shuffle, no store read for the
  *      overwhelmingly-common "never seen" case),
  *   2. joining ONLY the bloom-positive residue against the seen-table
  *      (exact — bloom false positives die here),
  *   3. folding the batch's first-occurrences back in: seen-table
  *      upsert + bloom OR-merge (the bloom is a union homomorphism, so
  *      the stored filter advances WITHOUT rescanning the corpus).
  *
  * At 100 TB the seen-table is corpus-hash-sized, but a batch's store
  * traffic is |bloom positives| ≈ |true duplicates| + ε — the gate
  * never exchanges the seen-table against a full batch. Decision
  * semantics are global min-doc_id-wins, proven against the oracle's
  * window recompute (reference anchor: the sink-read-back idiom,
  * KafkaToKuduScala.scala:60-61 — state lives in a re-readable store,
  * not in the job).
  */
object DedupGate {

  private val ExpectedItems = 1L << 20
  private val NumBits = 1L << 23

  private def withHash(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), sha2(col("text"), 256).as("content_hash"))
      .withColumn("bk", xxhash64(col("content_hash")))

  /** Per-hash first occurrence inside one batch. */
  private def firstOccurrences(hashed: DataFrame): DataFrame =
    hashed.groupBy("content_hash")
      .agg(min(col("doc_id")).as("first_doc_id"), first(col("bk")).as("bk"))

  /** Build the seen-table + bloom from the base corpus. Returns the
    * per-doc decisions for the base batch (first occurrence per hash →
    * 'new', the rest → 'duplicate'). */
  def ensure(spark: SparkSession, baseDocs: DataFrame, path: String): DataFrame = {
    val hashed = withHash(baseDocs)
    val firsts = firstOccurrences(hashed)
    UpsertStore.replace(spark, path,
      firsts.select("content_hash", "first_doc_id"), Seq("content_hash"),
      assumeKeyUnique = true)
    val bloom = firsts.agg(
      BloomFunctions.bloom_agg(col("bk"), ExpectedItems, NumBits).as("bloom"))
    UpsertStore.replace(spark, s"${path}__bloom",
      bloom.select(lit(1L).as("meta_id"), col("bloom")), Seq("meta_id"),
      assumeKeyUnique = true)
    decide(hashed, firsts.select("content_hash", "first_doc_id"))
  }

  /** Adjudicate a new batch against the gate, then fold its first
    * occurrences in (seen-table upsert + bloom OR-merge). */
  def gate(spark: SparkSession, newDocs: DataFrame, path: String): DataFrame = {
    val hashed = withHash(newDocs).cache()
    try {
      val storedBloom = UpsertStore.read(spark, s"${path}__bloom")
        .getOrElse(sys.error(s"no dedup gate at $path — run ensure first"))
        .select("bloom")
      // map-side prune: only bloom-positive hashes ever touch the store
      val candidates = hashed.filter(BloomFunctions.might_contain(storedBloom, col("bk")))
      val seen = UpsertStore.read(spark, path)
        .getOrElse(sys.error(s"no seen-table at $path"))
      // seenHits and novel are DUPLICATE-sized (tiny) but each feeds
      // several downstream actions (seen-table upsert, bloom advance,
      // the decision join) — without materialization every action
      // re-runs the bloom probe and re-merges the seen store
      // (~3 store merges per batch, pure fixed cost: the round-14
      // q159 profile). localCheckpoint pins each after ONE pass.
      val seenHits = candidates.select("content_hash").distinct()
        .join(seen, Seq("content_hash"))
        .select(col("content_hash"), col("first_doc_id"))
        .localCheckpoint()
      // batch-internal first occurrences for hashes the store has not
      // seen become the new canonical rows
      val batchFirsts = firstOccurrences(hashed)
      val novel = batchFirsts
        .join(seenHits.select("content_hash"), Seq("content_hash"), "left_anti")
        .localCheckpoint()
      UpsertStore.upsert(spark, path,
        novel.select("content_hash", "first_doc_id"), Seq("content_hash"),
        assumeKeyUnique = true)
      // bloom advance: OR the delta filter into the stored one — two
      // bounded binaries on the driver, never a corpus rescan
      val deltaBytes = novel.agg(
        BloomFunctions.bloom_agg(col("bk"), ExpectedItems, NumBits))
        .head().getAs[Array[Byte]](0)
      if (deltaBytes != null) { // null ⇔ no novel hashes: bloom already covers
        val storedBytes = storedBloom.head().getAs[Array[Byte]](0)
        val merged = orMerge(storedBytes, deltaBytes)
        UpsertStore.replace(spark, s"${path}__bloom",
          spark.range(1).select(lit(1L).as("meta_id"), lit(merged).as("bloom")),
          Seq("meta_id"), assumeKeyUnique = true)
      }
      val canon = seenHits.union(novel.select("content_hash", "first_doc_id"))
      decide(hashed, canon)
    } finally hashed.unpersist(blocking = false)
  }

  /** The aggregate's wire format is a plain
    * `org.apache.spark.util.sketch.BloomFilter` stream; OR-merge is
    * that class's own `mergeInPlace` (bit-or of the two bitmaps). */
  private[operators] def orMerge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val fa = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(a))
    val fb = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(b))
    fa.mergeInPlace(fb)
    val out = new java.io.ByteArrayOutputStream()
    fa.writeTo(out)
    out.toByteArray
  }

  private def decide(hashed: DataFrame, canon: DataFrame): DataFrame =
    hashed.join(canon, Seq("content_hash"))
      .select(col("doc_id"), col("first_doc_id"),
        when(col("doc_id") === col("first_doc_id"), "new")
          .otherwise("duplicate").as("status"))
}
