package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Retraction, UpsertStore}

/** Materialized BM25 postings index — the sparse-retrieval analogue of
  * the pair-graph store (q93) and the vector-index store (q96): the
  * tokenize → tf → df → corpus-stats chain is one full corpus pass,
  * and a pipeline that adjudicates contamination or slices the corpus
  * by probe document runs MANY query batches against the same corpus.
  * Recomputing the index per batch is the pattern a 100 TB pipeline
  * cannot afford; the production shape is: build the index ONCE into
  * keyed [[UpsertStore]] tables, and let every query batch read it.
  *
  * Layout (all under one root):
  *   `<path>`         postings, keyed (term, doc_id), columns (tf, dl)
  *   `<path>__df`     document frequency, keyed (term)
  *   `<path>__stats`  single meta row: N, avgdl, corpus fingerprint,
  *                    dirty marker — the staleness gate
  *
  * Staleness and crash discipline follow [[PairGraph]] exactly: reuse
  * is gated on the corpus fingerprint recorded at build time (one
  * cheap scan per gated ensure), and every rebuild brackets its data
  * writes dirty-stats → postings + df → clean-stats, so a crash
  * mid-rebuild forces a recompute for every corpus — never a stale
  * serve. All writes are key-unique by construction (groupBy outputs,
  * one meta row), so the store-side dedup shuffle is skipped.
  *
  * [[search]] and the from-scratch [[Retrieval.bm25Scores]] share ONE
  * scoring expression tree ([[Retrieval.bm25Contrib]]), so serve ≡
  * recompute bit-for-bit — q104 runs against q101's oracle to prove
  * it, the same hash-proven discipline as q93/q96.
  */
object PostingsIndex {

  /** Default store root — same per-user-tmpdir convention (and
    * collision-safe dir key) as [[PairGraph.storePath]]. */
  private def root: String =
    sys.env.getOrElse("GRAFT_POSTINGS_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-${System.getProperty("user.name", "anon")}/postings")

  private[graft] def storePath(dataDir: String): String =
    s"$root/idx_${PairGraph.dirKey64(dataDir)}"

  private def gateOk(m: DataFrame, n: Long, h: Long): Boolean = {
    val dirtyCol = if (m.columns.contains("dirty")) col("dirty") else lit(false)
    m.filter(col("corpus_n") === n && col("corpus_h") === h && !dirtyCol).count() == 1
  }

  /** `total_dl` is carried as an EXACT long so [[extend]] can advance
    * `avgdl` bit-identically to a from-scratch rebuild: Spark's
    * `avg(long)` is an exact-integer sum (order-independent below
    * 2^53) divided by the count, and `(base_total + delta_total)
    * .toDouble / n'` reproduces that division exactly — a stored
    * rounded average multiplied back would drift an ulp and break the
    * serve ≡ recompute hash. */
  private def statsRow(spark: SparkSession, nDocs: Long, totalDl: Long,
                       n: Long, h: Long, dirty: Boolean, txn: Long = -1L,
                       rtxn: Long = -1L): DataFrame =
    spark.range(1).select(
      lit(1L).as("meta_id"), lit(nDocs).as("n"), lit(totalDl).as("total_dl"),
      lit(if (nDocs > 0) totalDl.toDouble / nDocs else -1.0).as("avgdl"),
      lit(n).as("corpus_n"), lit(h).as("corpus_h"), lit(dirty).as("dirty"),
      lit(txn).as("txn"), lit(rtxn).as("rtxn"))

  private def statsTxn(m: org.apache.spark.sql.Row): Long =
    if (m.schema.fieldNames.contains("txn")) m.getAs[Long]("txn") else -1L

  /** Retraction high-water mark — PRESERVED by every stats rewrite
    * (round 18: extend/ensure used to drop the column, so an extend
    * after a takedown forgot the retraction ledger and a late replayed
    * retract re-applied its non-idempotent stats retreat — wrong BM25
    * scores until the next rebuild). Takedown ids are assigned by the
    * compliance system, not Spark's checkpoint, so their sequence
    * outlives store epochs. */
  private def statsRtxn(m: org.apache.spark.sql.Row): Long =
    Retraction.fromMeta(m)

  /** (docs with ≥1 token, exact total token count), derived from the
    * POSTINGS relation rather than a second tokenize pass: a doc has
    * ≥1 token iff it has ≥1 posting, and the total token count is
    * exactly `Σ tf` (every exploded token lands in one (doc, term)
    * group). Both are exact longs, so `avgdl` reproduces the naive
    * per-doc aggregation bit-for-bit — and the corpus is tokenized
    * ONCE per build instead of three times. */
  private def statsFromTf(tf: DataFrame): (Long, Long) = {
    val r = tf.agg(count_distinct(col("doc_id")).as("n"),
      coalesce(sum(col("tf")), lit(0L)).as("t")).head()
    (r.getLong(0), r.getLong(1))
  }

  /** Build (or gate-serve) the index for `docs` at `path`: when the
    * recorded corpus fingerprint matches, the stored index is already
    * current and nothing is touched; otherwise the full chain runs
    * once and replaces all three tables (dirty → data → clean). */
  def ensure(spark: SparkSession, docs: DataFrame, path: String,
             fp: Option[(Long, Long)] = None): Unit = {
    val statsPath = s"${path}__stats"
    val (n, h) = fp.getOrElse(PairGraph.corpusFingerprint(docs))
    val prev = UpsertStore.read(spark, statsPath)
    if (prev.exists(m => gateOk(m, n, h))) return
    val prevTxn = prev.map(m => statsTxn(m.head())).getOrElse(-1L)
    val prevRtxn = prev.map(m => statsRtxn(m.head())).getOrElse(-1L)
    if (prev.isDefined) UpsertStore.replace(spark, statsPath,
      statsRow(spark, -1L, -1L, -1L, 0L, dirty = true, prevTxn, prevRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
    // ONE tokenize pass: the postings write is the only job that
    // touches the (heavy) text column; vocabulary and stats then
    // derive from the just-written store — a column-pruned parquet
    // re-read (term / doc_id+tf), far cheaper than re-tokenizing the
    // corpus per derived table (was: three corpus scans per build).
    // (Round-19 note: a persist-and-parallel-write variant was tried
    // and reverted — it trades the pruned re-read for a corpus-sized
    // cache, the wrong trade at 100 TB, for ≈0 local win.)
    UpsertStore.replace(spark, path, Retrieval.postings(docs),
      Seq("term", "doc_id"), assumeKeyUnique = true)
    val stored = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"postings table at $path unreadable after build"))
    UpsertStore.replace(spark, s"${path}__df",
      stored.groupBy("term").agg(count(lit(1)).as("df")), Seq("term"),
      assumeKeyUnique = true)
    val (nDocs, totalDl) = statsFromTf(stored)
    UpsertStore.replace(spark, statsPath,
      statsRow(spark, nDocs, totalDl, n, h, dirty = false, prevTxn, prevRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
  }

  /** INCREMENTAL maintenance — the continuous-ingest shape shared with
    * [[PairGraph.extend]] and [[VectorIndex.extend]]: fold a batch of
    * NEW documents in without touching the old corpus. Delta postings
    * upsert as new keys (delta doc_ids are new by contract, so
    * last-writer-wins merge is pure append); document frequency for
    * the delta's terms is RECOMPUTED from the postings store rather
    * than incremented — `df(term) = count(postings where term)` is
    * exact against any partially-applied prior state, which is what
    * makes a crash-retry converge where a read-modify-write increment
    * would double-count. Corpus stats advance by exact integer
    * arithmetic (see [[statsRow]]); the fingerprint advances
    * associatively (count adds, XOR composes) — no old-corpus scan
    * anywhere. Cost ∝ |delta| + (delta-term posting lists).
    *
    * Crash discipline (the PairGraph rules): dirty stats — preserving
    * the PRE-extend fingerprint and totals — before any data write;
    * clean stats commit last. `txnId` recorded in the clean stats row
    * makes replays of a committed batch self-skip. */
  def extend(spark: SparkSession, delta: DataFrame, path: String,
             txnId: Option[Long] = None,
             deltaFp: Option[(Long, Long)] = None): Unit = {
    val statsPath = s"${path}__stats"
    val stats = UpsertStore.read(spark, statsPath).map(_.head()).getOrElse(
      sys.error(s"no postings index at $path to extend — run ensure first"))
    val sTxn = statsTxn(stats)
    if (txnId.exists(_ <= sTxn)) return // replay of a committed extend
    val dirty = stats.schema.fieldNames.contains("dirty") && stats.getAs[Boolean]("dirty")
    require(!(dirty && stats.getAs[Long]("corpus_n") < 0),
      s"postings index at $path was left dirty by an interrupted REBUILD — " +
        "there is no base state to extend from; rerun ensure")
    require(stats.schema.fieldNames.contains("total_dl"),
      s"postings index at $path predates incremental stats (no total_dl) — " +
        "rebuild with ensure before extending")
    val (baseN, baseH) = (stats.getAs[Long]("corpus_n"), stats.getAs[Long]("corpus_h"))
    val (baseDocs, baseTotal) = (stats.getAs[Long]("n"), stats.getAs[Long]("total_dl"))
    val sRtxn = statsRtxn(stats)
    val deltaTf = Retrieval.postings(delta).cache()
    try {
      // dirty FIRST (pre-extend state preserved for the retry path)
      UpsertStore.replace(spark, statsPath,
        statsRow(spark, baseDocs, baseTotal, baseN, baseH, dirty = true, sTxn,
          sRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
      UpsertStore.upsert(spark, path, deltaTf, Seq("term", "doc_id"),
        assumeKeyUnique = true)
      // df for EXACTLY the delta's terms, recounted from the store —
      // delta-term-sized work, replay-exact (see scaladoc). term is a
      // merge-key column, so Catalyst's PushDownLeftSemiAntiJoin
      // already prunes the merge shuffle below this semi-join (round-19
      // measured note: an explicit pre-merge scope only added AQE
      // stage-jobs and was reverted).
      val deltaTerms = deltaTf.select("term").distinct()
      val postings = UpsertStore.read(spark, path).getOrElse(
        sys.error(s"postings table at $path unreadable"))
      val refreshed = postings.join(broadcast(deltaTerms), Seq("term"), "left_semi")
        .groupBy("term").agg(count(lit(1)).as("df"))
      UpsertStore.upsert(spark, s"${path}__df", refreshed, Seq("term"),
        assumeKeyUnique = true)
      val (dDocs, dTotal) = statsFromTf(deltaTf)
      val (dn, dh) = deltaFp.getOrElse(PairGraph.corpusFingerprint(delta))
      UpsertStore.replace(spark, statsPath,
        statsRow(spark, baseDocs + dDocs, baseTotal + dTotal, baseN + dn, baseH ^ dh,
          dirty = false, txnId.getOrElse(sTxn), sRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
    } finally deltaTf.unpersist()
  }

  /** RETRACT documents from the index (round 17 — the takedown
    * lifecycle, VERDICT r16 #1): the exact inverse of [[extend]], so
    * `retract(gone)` after any build/extend history leaves the three
    * tables bit-identical to a from-scratch [[ensure]] on the
    * remaining corpus — which is what lets a post-takedown [[search]]
    * hash-match the DuckDB replay over `documents MINUS gone`. The
    * pieces, each exact:
    *  - deleted posting KEYS recomputed from the gone docs' text
    *    (pure function → a crash-replay derives the same keys; the
    *    keyed deletes are idempotent);
    *  - df for exactly the gone docs' terms RECOUNTED from the
    *    post-delete store (the extend rule, inverted); terms whose
    *    posting list empties lose their df ROW — a rebuilt index has
    *    no row for a vanished term;
    *  - corpus stats retreat by exact integer arithmetic
    *    (n − Δdocs, total_dl − Δtf) and the fingerprint by the XOR
    *    rule (n − Δn, h ⊕ Δh) — both associative, so the gate keeps
    *    matching the live corpus and a later `ensure(remaining)`
    *    gate-serves instead of rebuilding.
    * Crash discipline: dirty stats (preserving pre-retract totals)
    * before any data write, clean stats LAST with `txnId` recorded —
    * the stats advance is not idempotent, so a replay at or below the
    * committed id self-skips; the data deletes/recounts below it
    * converge without the ledger. Cost ∝ the gone docs' terms'
    * posting lists. Contract: every retracted row must currently be
    * indexed. */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              txnId: Option[Long] = None): Unit = {
    // duplicate-batch guard (VERDICT r18 #1): the tf deletes are
    // idempotent but the avgdl/N stats retreat and the fingerprint
    // retreat below are NOT — dedup before any arithmetic sees it
    val gone = Retraction.dedupBatch(gone0, "doc_id")
    val statsPath = s"${path}__stats"
    val stats = UpsertStore.read(spark, statsPath).map(_.head()).getOrElse(
      sys.error(s"no postings index at $path to retract from — run ensure first"))
    val sTxn = statsTxn(stats)
    // RETRACTION ledger: a separate column from the extend ledger —
    // retract ids form their own monotonic sequence, independent of
    // streaming batch ids (sharing one field would let a takedown's
    // high-water mark make every later ingest self-skip)
    val sRtxn = statsRtxn(stats)
    if (txnId.exists(_ <= sRtxn)) return
    require(!(stats.schema.fieldNames.contains("dirty") &&
        stats.getAs[Boolean]("dirty") && stats.getAs[Long]("corpus_n") < 0),
      s"postings index at $path was left dirty by an interrupted REBUILD — " +
        "rerun ensure before retracting")
    val (baseN, baseH) = (stats.getAs[Long]("corpus_n"), stats.getAs[Long]("corpus_h"))
    val (baseDocs, baseTotal) = (stats.getAs[Long]("n"), stats.getAs[Long]("total_dl"))
    val goneTf = Retrieval.postings(gone).cache()
    try {
      UpsertStore.replace(spark, statsPath,
        statsRow(spark, baseDocs, baseTotal, baseN, baseH, dirty = true, sTxn,
          sRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
      UpsertStore.delete(spark, path, goneTf, Seq("term", "doc_id"))
      val touched = goneTf.select("term").distinct()
      val postings = UpsertStore.read(spark, path).getOrElse(
        sys.error(s"postings table at $path unreadable"))
      val remaining = postings.join(broadcast(touched), Seq("term"), "left_semi")
        .groupBy("term").agg(count(lit(1)).as("df"))
      UpsertStore.upsert(spark, s"${path}__df", remaining, Seq("term"),
        assumeKeyUnique = true)
      val vanished = touched.join(remaining.select("term"), Seq("term"), "left_anti")
        .localCheckpoint()
      if (!vanished.isEmpty)
        UpsertStore.delete(spark, s"${path}__df", vanished, Seq("term"))
      val (dDocs, dTotal) = statsFromTf(goneTf)
      val (dn, dh) = PairGraph.corpusFingerprint(gone)
      // the extend ledger (txn) is preserved — only rtxn advances
      UpsertStore.replace(spark, statsPath,
        statsRow(spark, baseDocs - dDocs, baseTotal - dTotal, baseN - dn,
          baseH ^ dh, dirty = false, sTxn, txnId.getOrElse(sRtxn)),
        Seq("meta_id"), assumeKeyUnique = true)
    } finally goneTf.unpersist()
  }

  /** BM25 scores served FROM the stored index: broadcast the query
    * term set against the postings table (posting-list pruning via the
    * broadcast hash join — only matched postings shuffle). The stored
    * df table is VOCABULARY-sized, so it is semi-joined against the
    * (tiny) query term set before the broadcast — the semi-join's term
    * filter pushes into the df-table scan, and the broadcast relation
    * is |query terms|-sized at any corpus size (an unpruned
    * broadcast(df) grows with the vocabulary and OOMs at 100 TB); the
    * single stats row rides as literals. Returns
    * (query_id, doc_id, score), same contract as
    * [[Retrieval.bm25Scores]] — identical expression tree, identical
    * rounding. Refuses a dirty or missing index (an interrupted
    * rebuild must never serve partial postings). */
  def search(spark: SparkSession, path: String, queries: DataFrame): DataFrame = {
    val stats = UpsertStore.read(spark, s"${path}__stats").getOrElse(
      sys.error(s"no postings index at $path — run ensure first")).head()
    require(!(stats.schema.fieldNames.contains("dirty") && stats.getAs[Boolean]("dirty")),
      s"postings index at $path was left dirty by an interrupted rebuild — " +
        "re-run ensure before serving")
    val tf = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"postings table at $path unreadable"))
    val dft = UpsertStore.read(spark, s"${path}__df").getOrElse(
      sys.error(s"df table at ${path}__df unreadable"))
    val qTerms = queries.select("term").distinct()
    val dftQ = dft.join(broadcast(qTerms), Seq("term"), "left_semi")
    broadcast(queries)
      .join(tf, Seq("term"))
      .join(broadcast(dftQ), Seq("term"))
      .withColumn("c", Retrieval.bm25Contrib(col("tf"), col("df"), col("dl"),
        lit(stats.getAs[Long]("n")), lit(stats.getAs[Double]("avgdl"))))
      .groupBy("query_id", "doc_id")
      .agg(round(sum(col("c")), 6).as("score"))
  }

  /** Per-document TF-IDF top-k keywords served FROM the stored index —
    * the second scorer over the same persistence (q139's formula:
    * tf·ln((N+1)/(df+1)), top-k by score desc then term asc). Unlike
    * [[search]] there is no query set to prune by — every document is
    * scored — so the vocabulary-sized df table joins the postings with
    * a plain shuffle join on the term key (both sides ∝ their own
    * size; never broadcast, the VERDICT r11 #1 rule), and the single
    * stats row rides as a literal. Zero re-tokenization: tf, df, and N
    * all come off the store, so the whole plan is store-scan → one
    * term-keyed join → one doc-keyed window. Refuses a dirty index,
    * same as search. */
  def tfidfTopK(spark: SparkSession, path: String, k: Int): DataFrame = {
    val stats = UpsertStore.read(spark, s"${path}__stats").getOrElse(
      sys.error(s"no postings index at $path — run ensure first")).head()
    require(!(stats.schema.fieldNames.contains("dirty") && stats.getAs[Boolean]("dirty")),
      s"postings index at $path was left dirty by an interrupted rebuild — " +
        "re-run ensure before serving")
    val tf = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"postings table at $path unreadable"))
    val dft = UpsertStore.read(spark, s"${path}__df").getOrElse(
      sys.error(s"df table at ${path}__df unreadable"))
    val n = stats.getAs[Long]("n")
    val scored = tf.join(dft, Seq("term"))
      .withColumn("score",
        round(col("tf") * log((lit(n) + lit(1.0)) / (col("df") + lit(1.0))), 4))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("score").desc, col("term"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term").as("token"), col("score"), col("rk"))
      .orderBy("doc_id", "rk")
  }

  /** Register the index under the `graft` catalog (the q99/q100
    * idiom): builds or gate-serves AT the warehouse path — store
    * location is table identity — then `SELECT … FROM
    * <catalog>.<name>` reads the live postings,
    * `<catalog>.<name>__df` the vocabulary, and
    * `<catalog>.<name>__stats` the single corpus-stats row (N, avgdl)
    * a SQL scorer cross-joins. Returns the store path. */
  def registerCatalog(spark: SparkSession, name: String, docs: DataFrame,
                      catalog: String = "graft"): String = {
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    ensure(spark, docs, path)
    PairGraph.ensureTable(spark, catalog, name, path, Seq("term", "doc_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__df", s"${path}__df", Seq("term"))
    PairGraph.ensureTable(spark, catalog, s"${name}__stats", s"${path}__stats", Seq("meta_id"))
    path
  }
}
