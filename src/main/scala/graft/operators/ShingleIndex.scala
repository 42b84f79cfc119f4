package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Retraction, UpsertStore}

/** Materialized train-side n-gram (shingle) index for contamination
  * adjudication — the decontamination twin of the BM25 postings store
  * ([[PostingsIndex]]): q61 re-tokenizes and re-shingles the ENTIRE
  * train corpus on every eval-leakage scan, but a production pipeline
  * adjudicates every new eval set (and every eval-set revision)
  * against the same slowly-growing train corpus. The 100 TB shape is:
  * shingle the train side ONCE into keyed [[UpsertStore]] tables, and
  * let every eval probe join against the stored grams.
  *
  * Layout (all under one root):
  *   `<path>`        gram postings, keyed (g, doc_id) — g is the
  *                   xxhash64 of the space-joined n-gram (8 B/gram
  *                   shuffled, never the ~50-byte strings; a 64-bit
  *                   collision would fail the exact oracle, so the
  *                   gate guards it — q61's own discipline)
  *   `<path>__df`    gram document frequency, keyed (g)
  *   `<path>__meta`  single row: corpus fingerprint, dirty marker, txn
  *
  * The stop-gram cap is applied at PROBE time from the stored df table
  * (boilerplate grams — licenses, headers — are "common in train"),
  * so changing the cap never forces a rebuild. Staleness and crash
  * discipline follow [[PairGraph]]/[[PostingsIndex]] exactly:
  * fingerprint-gated reuse, dirty-meta before any data write, clean
  * meta last, txn-ledgered extends that self-skip replays.
  */
object ShingleIndex {

  private def root: String =
    sys.env.getOrElse("GRAFT_SHINGLE_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-${System.getProperty("user.name", "anon")}/shingle")

  private[graft] def storePath(dataDir: String): String =
    s"$root/idx_${PairGraph.dirKey64(dataDir)}"

  private def metaRow(spark: SparkSession, n: Long, h: Long,
                      dirty: Boolean, txn: Long, rtxn: Long = -1L): DataFrame =
    spark.range(1).select(
      lit(1L).as("meta_id"), lit(n).as("corpus_n"), lit(h).as("corpus_h"),
      lit(dirty).as("dirty"), lit(txn).as("txn"), lit(rtxn).as("rtxn"))

  /** Retraction high-water mark — PRESERVED by every meta rewrite
    * (the round-18 engine-wide rule: dropping it would let a late
    * replayed retract re-apply its non-idempotent fingerprint
    * retreat; takedown ids outlive store epochs). */
  private def metaRtxn(m: org.apache.spark.sql.Row): Long =
    Retraction.fromMeta(m)

  private def gateOk(m: DataFrame, n: Long, h: Long): Boolean =
    m.filter(col("corpus_n") === n && col("corpus_h") === h && !col("dirty"))
      .count() == 1

  /** DISTINCT hashed n-grams per document — the same single-explode
    * staging as q61: the hash is computed BEFORE the gram leaves the
    * row, so the index build shuffles 8 B per gram. */
  private[operators] def grams(docs: DataFrame, n: Int): DataFrame =
    docs.withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(toks) - ${n - 1}), " +
          s"i -> xxhash64(concat_ws(' ', slice(toks, i, $n)))))")).as("g"))

  /** Build (or fingerprint-gate-serve) the train-gram index at `path`.
    * One shingle pass (the only job that touches the text column); the
    * df table derives from the just-written postings via a
    * column-pruned re-read, the [[PostingsIndex.ensure]] discipline. */
  def ensure(spark: SparkSession, trainDocs: DataFrame, path: String,
             n: Int = 8, fp: Option[(Long, Long)] = None): Unit = {
    val metaPath = s"${path}__meta"
    val (cn, ch) = fp.getOrElse(PairGraph.corpusFingerprint(trainDocs))
    val prev = UpsertStore.read(spark, metaPath)
    if (prev.exists(m => gateOk(m, cn, ch))) return
    val prevTxn = prev.map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    val prevRtxn = prev.map(m => metaRtxn(m.head())).getOrElse(-1L)
    if (prev.isDefined) UpsertStore.replace(spark, metaPath,
      metaRow(spark, -1L, 0L, dirty = true, prevTxn, prevRtxn), Seq("meta_id"),
      assumeKeyUnique = true)
    UpsertStore.replace(spark, path, grams(trainDocs, n), Seq("g", "doc_id"),
      assumeKeyUnique = true)
    val stored = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"gram postings at $path unreadable after build"))
    UpsertStore.replace(spark, s"${path}__df",
      stored.groupBy("g").agg(count(lit(1)).as("dfreq")), Seq("g"),
      assumeKeyUnique = true)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, cn, ch, dirty = false, prevTxn, prevRtxn), Seq("meta_id"),
      assumeKeyUnique = true)
  }

  /** Fold a batch of NEW train documents in without re-shingling the
    * old corpus — the [[PostingsIndex.extend]] contract: delta gram
    * postings append (doc_ids new ⇒ key-unique), df for exactly the
    * delta's grams RECOUNTED from the store (replay-exact where an
    * increment would double-count; the semi-join is unhinted, so the
    * planner broadcasts a small delta gram set and shuffles a huge
    * one), fingerprint advanced associatively, dirty → data → clean
    * bracket with a txn ledger that self-skips replayed batches. */
  def extend(spark: SparkSession, delta: DataFrame, path: String,
             n: Int = 8, txnId: Option[Long] = None,
             deltaFp: Option[(Long, Long)] = None): Unit = {
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no shingle index at $path to extend — run ensure first"))
    val mTxn = meta.getAs[Long]("txn")
    if (txnId.exists(_ <= mTxn)) return // replay of a committed extend
    require(!(meta.getAs[Boolean]("dirty") && meta.getAs[Long]("corpus_n") < 0),
      s"shingle index at $path was left dirty by an interrupted REBUILD — " +
        "there is no base state to extend from; rerun ensure")
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    val mRtxn = metaRtxn(meta)
    val deltaGrams = grams(delta, n).cache()
    try {
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, baseN, baseH, dirty = true, mTxn, mRtxn), Seq("meta_id"),
        assumeKeyUnique = true)
      UpsertStore.upsert(spark, path, deltaGrams, Seq("g", "doc_id"),
        assumeKeyUnique = true)
      val postings = UpsertStore.read(spark, path).getOrElse(
        sys.error(s"gram postings at $path unreadable"))
      val refreshed = postings
        .join(deltaGrams.select("g").distinct(), Seq("g"), "left_semi")
        .groupBy("g").agg(count(lit(1)).as("dfreq"))
      UpsertStore.upsert(spark, s"${path}__df", refreshed, Seq("g"),
        assumeKeyUnique = true)
      val (dn, dh) = deltaFp.getOrElse(PairGraph.corpusFingerprint(delta))
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, baseN + dn, baseH ^ dh, dirty = false,
          txnId.getOrElse(mTxn), mRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
    } finally deltaGrams.unpersist()
  }

  /** RETRACT train documents from the gram index (round 18 — VERDICT
    * r17 #1, the one serving family the round-17 takedown wave
    * skipped, and the one with compliance teeth: a retracted TRAIN
    * document must stop adjudicating eval documents as contaminated).
    * The exact inverse of [[extend]], mirroring
    * [[PostingsIndex.retract]]'s calculus piece for piece:
    *  - deleted gram KEYS recomputed from the gone docs' text (pure
    *    function → a crash-replay derives the same keys; the keyed
    *    (g, doc_id) deletes are idempotent);
    *  - df for exactly the gone docs' grams RECOUNTED from the
    *    post-delete store; grams whose posting list empties lose
    *    their df ROW (a rebuilt index has no row for a vanished gram
    *    — and the PROBE-time stop-gram cap reads df, so a boilerplate
    *    gram whose df falls back under the cap resumes matching,
    *    exactly as a from-scratch build would);
    *  - the corpus fingerprint retreats by the XOR rule (n − Δn,
    *    h ⊕ Δh), so a later `ensure(remaining)` gate-serves instead
    *    of rebuilding.
    * Crash discipline: dirty meta (preserving the pre-retract
    * fingerprint) before any data write, clean meta LAST with `txnId`
    * recorded in the `rtxn` RETRACTION ledger — separate from the
    * extend ledger (`txn`), the engine-wide round-17 rule: retract ids
    * form their own monotonic sequence, so a takedown id can never
    * make a later streamed extend self-skip. The fingerprint retreat
    * is associative, not idempotent — only the recorded id makes a
    * replay converge; the data deletes/recounts below it converge
    * without the ledger. Cost ∝ the gone docs' grams' posting lists.
    * Contract: every retracted doc must currently be indexed. */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              n: Int = 8, txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "doc_id")
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no shingle index at $path to retract from — run ensure first"))
    val mTxn = meta.getAs[Long]("txn")
    val mRtxn = metaRtxn(meta)
    if (txnId.exists(_ <= mRtxn)) return
    require(!(meta.getAs[Boolean]("dirty") && meta.getAs[Long]("corpus_n") < 0),
      s"shingle index at $path was left dirty by an interrupted REBUILD — " +
        "rerun ensure before retracting")
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    val goneGrams = grams(gone, n).cache()
    try {
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, baseN, baseH, dirty = true, mTxn, mRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
      UpsertStore.delete(spark, path, goneGrams, Seq("g", "doc_id"))
      val touched = goneGrams.select("g").distinct()
      val postings = UpsertStore.read(spark, path).getOrElse(
        sys.error(s"gram postings at $path unreadable"))
      val remaining = postings.join(broadcast(touched), Seq("g"), "left_semi")
        .groupBy("g").agg(count(lit(1)).as("dfreq"))
      UpsertStore.upsert(spark, s"${path}__df", remaining, Seq("g"),
        assumeKeyUnique = true)
      val vanished = touched.join(remaining.select("g"), Seq("g"), "left_anti")
        .localCheckpoint()
      if (!vanished.isEmpty)
        UpsertStore.delete(spark, s"${path}__df", vanished, Seq("g"))
      val (dn, dh) = PairGraph.corpusFingerprint(gone)
      // the extend ledger (txn) is preserved — only rtxn advances
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, baseN - dn, baseH ^ dh, dirty = false, mTxn,
          txnId.getOrElse(mRtxn)),
        Seq("meta_id"), assumeKeyUnique = true)
    } finally goneGrams.unpersist()
  }

  /** Register the index under the `graft` catalog (the q99/q100/q106
    * idiom): build or gate-serve AT the warehouse path, then
    * `<catalog>.<name>` reads the live gram postings and
    * `<catalog>.<name>__df` the gram frequencies — an auditor can
    * adjudicate a suspect eval document in plain SQL. Returns the
    * store path. */
  def registerCatalog(spark: SparkSession, name: String, trainDocs: DataFrame,
                      catalog: String = "graft"): String = {
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    ensure(spark, trainDocs, path)
    PairGraph.ensureTable(spark, catalog, name, path, Seq("g", "doc_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__df", s"${path}__df", Seq("g"))
    path
  }

  /** Per-(eval, train) shared-gram counts FROM the stored index — the
    * adjudication's PAIR stage, exposed for flows that need the
    * matched SOURCES (the q200 takedown selects its
    * right-to-be-forgotten set from exactly these rows). Shingles only
    * the eval batch, drops train-side stop grams (df > `dfCap`, an
    * anti-join against the few high-df grams), joins the stored
    * postings — only matched grams shuffle. Refuses a dirty or missing
    * index. */
  def probePairs(spark: SparkSession, path: String, evalDocs: DataFrame,
                 n: Int = 8, dfCap: Long = 50): DataFrame = {
    val meta = UpsertStore.read(spark, s"${path}__meta").getOrElse(
      sys.error(s"no shingle index at $path — run ensure first")).head()
    require(!meta.getAs[Boolean]("dirty"),
      s"shingle index at $path was left dirty by an interrupted rebuild — " +
        "re-run ensure before probing")
    val postings = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"gram postings at $path unreadable"))
    val dft = UpsertStore.read(spark, s"${path}__df").getOrElse(
      sys.error(s"df table at ${path}__df unreadable"))
    val stop = dft.filter(col("dfreq") > dfCap).select("g")
    val prunedTrain = postings.join(broadcast(stop), Seq("g"), "left_anti")
      .select(col("g"), col("doc_id").as("train_doc"))
    grams(evalDocs, n).select(col("doc_id").as("test_doc"), col("g"))
      .join(prunedTrain, "g")
      .groupBy("test_doc", "train_doc").agg(count(lit(1)).as("shared"))
  }

  /** Contamination probe FROM the stored index: [[probePairs]] rolled
    * up to per-eval-doc counts (test_doc, n_train_docs, max_shared),
    * q61's output contract. */
  def probe(spark: SparkSession, path: String, evalDocs: DataFrame,
            n: Int = 8, dfCap: Long = 50): DataFrame =
    probePairs(spark, path, evalDocs, n, dfCap)
      .groupBy("test_doc")
      .agg(count(lit(1)).as("n_train_docs"), max("shared").cast("long").as("max_shared"))
      .orderBy("test_doc")
}
