package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.streaming.{Retraction, UpsertStore}

/** STORED banded-SimHash near-dup index — q48's candidate machinery
  * (Charikar 2002 fingerprints; 8×8-bit chunk banding; Hamming ≤ 16
  * prefilter; exact-Jaccard verify) turned into a derived store, so
  * "which indexed documents is this batch near-duplicating?" is a
  * bucket-probe against committed postings instead of a corpus-wide
  * self-join. This is the contamination-shaped near-dup SERVE: the
  * cluster maintainer (q95) answers "what clusters exist among
  * everything ingested"; this index answers "does THIS eval/incoming
  * document collide with the indexed corpus" without touching
  * non-colliding buckets.
  *
  * Stores: `fps` (doc_id → simhash, keyed doc_id) and `chunks`
  * postings over DISTINCT fingerprints (chunk, chunk_val, simhash) —
  * the q48 lesson that exact-copy clusters must collapse to one
  * fingerprint BEFORE the quadratic bucket join. Both stores are
  * idempotent by key, so a replayed extend upserts identical rows —
  * replay-safe with or without the txn ledger (the gate/postings
  * discipline, unlike the additive MG/DSIR folds).
  *
  * Serve cost: eval-side fingerprints (one map pass), bucket-matched
  * chunk postings (only buckets the eval set touches shuffle), Hamming
  * survivors expand to doc pairs, and ONLY candidates pay the exact
  * shingle-set verify — recomputed from text for candidate docs alone,
  * never stored (storing shingle arrays would duplicate the corpus).
  *
  * RECALL BOUND (pigeonhole, ADVICE r14): 8 disjoint 8-bit chunks
  * guarantee a shared chunk — and therefore a bucket collision — only
  * for fingerprint pairs at Hamming distance ≤ 7 (8 differing bits
  * can land one per chunk). The serve's default `hamming = 16` filter
  * is therefore a PREfilter on candidates the banding happens to
  * surface, not a completeness contract: a pair at distance 8–16
  * whose differing bits spread across all 8 chunks is never bucketed
  * and is silently missed. On near-dup corpora this is immaterial —
  * J ≥ 0.6 text pairs fingerprint within a few bits (q176's oracle
  * passes at sf0.01 AND sf0.1) — but adversarial or weakly-similar
  * pairs in the 8–16 band are corpus-dependent, the same shape as the
  * q48 one-shot. Guaranteed completeness at Hamming ≤ d needs ≥ d+1
  * disjoint chunks (d differing bits cannot touch all d+1), so a
  * caller needing the full ≤ 16 contract should band into 17 chunks
  * of ⌊64/17⌋ bits (or overlapping chunks) and accept the bucket
  * fan-in that buys.
  */
object SimhashIndex {

  private[graft] def fps(docs: DataFrame): DataFrame =
    // parallelized: the shingle+simhash map is the lifecycle's hot
    // stage and a bench-SF parquet table is one input split — without
    // the guard repartition it runs single-core (the q90/Distributed
    // rationale; at warehouse scale file splits do this for free).
    // Degenerate docs drop via Dedup.shingleArrayNonEmpty's raw-text
    // predicate (NOT size(shingles) > 0 — the q80 pushdown tax).
    Dedup.shingleArrayNonEmpty(Distributed.parallelized(docs))
      .select(col("doc_id"),
        TextFunctions.simhash64(col("shingles")).as("simhash"))

  def build(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    // the fingerprint pass (shingle + simhash64 over every doc) is the
    // expensive map stage; both store writes read it, so it persists
    // for exactly this scope (the PqIndex input-caching discipline)
    val f = fps(docs).persist()
    try {
      UpsertStore.replace(spark, s"$path", f,
        Seq("doc_id"), assumeKeyUnique = true)
      UpsertStore.replace(spark, s"${path}__chunks", chunks(f),
        Seq("chunk", "chunk_val", "simhash"), assumeKeyUnique = true)
    } finally f.unpersist()
  }

  def extend(spark: SparkSession, docs: DataFrame, path: String,
             txnId: Option[Long] = None): Unit = {
    val f = fps(docs).persist()
    try {
      UpsertStore.upsert(spark, s"$path", f,
        Seq("doc_id"), assumeKeyUnique = true, txnId = txnId)
      UpsertStore.upsert(spark, s"${path}__chunks", chunks(f),
        Seq("chunk", "chunk_val", "simhash"), assumeKeyUnique = true, txnId = txnId)
    } finally f.unpersist()
  }

  /** RETRACT documents from both stores (round 17 — the takedown
    * lifecycle): gone fingerprints recompute from the gone rows' text
    * (pure function → replay-idempotent keyed deletes). A chunk
    * posting row belongs to a DISTINCT fingerprint, so it is deleted
    * only when NO surviving doc still carries that fingerprint — the
    * from-scratch rule (`chunks(distinct fps of remaining)`)
    * preserved incrementally; an exact-copy cluster that loses one
    * member keeps its bucket rows. The catalog meta (when present)
    * advances by the XOR-retract rule behind a txn guard. Contract:
    * retracted rows must currently be indexed. */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "doc_id")
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head())
    val metaTxn = meta.map(Retraction.fromMeta).getOrElse(-1L)
    if (meta.isDefined && txnId.exists(_ <= metaTxn)) return
    val goneFps = fps(gone).localCheckpoint()
    UpsertStore.delete(spark, path, goneFps, Seq("doc_id"))
    val survivors = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"simhash store at $path unreadable after delete"))
    val orphaned = goneFps.select("simhash").distinct()
      .join(survivors.select("simhash"), Seq("simhash"), "left_anti")
      .localCheckpoint()
    if (!orphaned.isEmpty)
      UpsertStore.delete(spark, s"${path}__chunks", chunks(orphaned),
        Seq("chunk", "chunk_val", "simhash"))
    meta.foreach { m =>
      val (dn, dh) = PairGraph.corpusFingerprint(gone)
      UpsertStore.replace(spark, metaPath,
        spark.range(1).select(lit(1L).as("meta_id"),
          lit(m.getAs[Long]("corpus_n") - dn).as("corpus_n"),
          lit(m.getAs[Long]("corpus_h") ^ dh).as("corpus_h"),
          lit(txnId.getOrElse(metaTxn)).as("rtxn")),
        Seq("meta_id"), assumeKeyUnique = true)
    }
  }

  private def chunks(fp: DataFrame): DataFrame =
    fp.select("simhash").distinct()
      .select(col("simhash"),
        posexplode(expr(
          "transform(sequence(0, 7), c -> (simhash >> (c * 8)) & 255)")))
      .select(col("pos").as("chunk"), col("col").as("chunk_val"), col("simhash"))

  /** Register the simhash near-dup index under the `graft` catalog
    * (the q106/q160/q175 idiom — VERDICT r14 #3): build-or-gate-serve
    * AT the warehouse path, then `<catalog>.<name>` reads the live
    * doc→fingerprint table and `<catalog>.<name>__chunks` the banded
    * chunk postings, so the whole near-dup probe (q180) is one SQL
    * text by table name (the `simhash64` expression is SQL-registered
    * via [[graft.GraftFunctions]]). Fingerprint gate + meta-last crash
    * rule as [[TrigramIndex.registerCatalog]]. Returns the store path
    * for [[extend]]/[[serve]] against the registered tables. */
  def registerCatalog(spark: SparkSession, name: String, docs: DataFrame,
                      catalog: String = "graft"): String = {
    // the by-name probe SQL needs `simhash64` in the session registry
    // (the ThetaMaintainer.registerCatalog precedent)
    graft.GraftFunctions.register(spark)
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    val (n, h) = PairGraph.corpusFingerprint(docs)
    val fresh = UpsertStore.read(spark, s"${path}__meta").exists(
      _.filter(col("corpus_n") === n && col("corpus_h") === h).count() == 1)
    if (!fresh) {
      build(spark, docs, path)
      UpsertStore.replace(spark, s"${path}__meta",
        spark.range(1).select(lit(1L).as("meta_id"),
          lit(n).as("corpus_n"), lit(h).as("corpus_h")),
        Seq("meta_id"), assumeKeyUnique = true)
    }
    PairGraph.ensureTable(spark, catalog, name, path, Seq("doc_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__chunks", s"${path}__chunks",
      Seq("chunk", "chunk_val", "simhash"))
    path
  }

  /** Near-dup probe of `evalDocs` against the stored index: pairs
    * (test_doc, train_doc, jaccard) with exact Jaccard ≥ `tau`.
    * `corpus` is the doc relation the verify reads indexed text from
    * (only candidate train docs are re-shingled). */
  def serve(spark: SparkSession, path: String, evalDocs: DataFrame,
            corpus: DataFrame, tau: Double = 0.6, hamming: Int = 16): DataFrame = {
    val storedFps = UpsertStore.read(spark, s"$path").getOrElse(
      sys.error(s"no simhash index at $path — build first"))
    val storedChunks = UpsertStore.read(spark, s"${path}__chunks").getOrElse(
      sys.error(s"no simhash chunk postings at $path — build first"))
    // eval-side shingle+fingerprint pass feeds the bucket probe AND
    // the verify. localCheckpoint, not persist (ADVICE r14): serve()
    // returns a lazy plan, so a persist here has no unpersist site and
    // leaks a cached block per serve in a long-lived session; a local
    // checkpoint materializes the (eval-batch-sized) pass eagerly and
    // the ContextCleaner frees its blocks as soon as the caller drops
    // the returned DataFrame — cache lifetime ≡ result lifetime.
    val esh = Dedup.shingleArrayNonEmpty(Distributed.parallelized(evalDocs))
      .select(col("doc_id"), Dedup.hashedShingleCols.as("hsh"),
        TextFunctions.simhash64(col("shingles")).as("simhash"))
      .localCheckpoint()
    val efp = esh.select(col("doc_id"), col("simhash"))
    val echunks = chunks(efp)
      .select(col("chunk"), col("chunk_val"), col("simhash").as("fp_e"))
    val fpPairs = echunks
      .join(storedChunks.select(col("chunk"), col("chunk_val"),
        col("simhash").as("fp_i")), Seq("chunk", "chunk_val"))
      .filter(expr("bit_count(fp_e ^ fp_i)") <= hamming)
      .select("fp_e", "fp_i").distinct()
    val cand = fpPairs
      .join(efp.select(col("simhash").as("fp_e"), col("doc_id").as("test_doc")), "fp_e")
      .join(storedFps.select(col("simhash").as("fp_i"), col("doc_id").as("train_doc")), "fp_i")
      .select("test_doc", "train_doc")
    // exact verify on candidates only; train-side shingles recomputed
    // for candidate docs alone
    val tsh = Dedup.shingleArrayNonEmpty(Distributed.parallelized(
        corpus.join(cand.select(col("train_doc").as("doc_id")).distinct(), "doc_id")))
      .select(col("doc_id"), Dedup.hashedShingleCols.as("hsh"))
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    cand
      .join(esh.select(col("doc_id").as("test_doc"), col("hsh").as("sh_a")), "test_doc")
      .join(tsh.select(col("doc_id").as("train_doc"), col("hsh").as("sh_b")), "train_doc")
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= tau)
      .select(col("test_doc"), col("train_doc"), round(col("jaccard"), 4).as("jaccard"))
  }
}
