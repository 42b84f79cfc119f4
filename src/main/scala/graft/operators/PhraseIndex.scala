package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Retraction, UpsertStore}

/** POSITIONAL POSTINGS INDEX for exact PHRASE search (round 16) — the
  * inverted-index capability BM25's bag-of-words postings
  * ([[PostingsIndex]]) cannot express: "these tokens, ADJACENT, in
  * this order". The classic IR positional-index design (Manning,
  * Introduction to Information Retrieval §2.4.2): one stored row per
  * (term, doc) carrying the SORTED position list, phrase serve =
  * query-term-bounded posting reads + a positional intersection.
  *
  * Store layout (an [[UpsertStore]] keyed by (term, doc_id), the
  * derived-store discipline every index family here follows):
  *   (term, doc_id, positions: array<int>)   — 0-based token offsets
  * under the engine-wide tokenization convention
  * ([[TextAnalysis.tokens]]: lower + '\s+' split, UNfiltered, so
  * positions replay exactly in DuckDB as `generate_subscripts - 1`).
  *
  * Serve ([[search]]): a phrase [t₀ … tₘ₋₁] occurs at start s iff
  * every tᵢ has position s+i — so each matched posting row explodes
  * to (query, doc, pos − i) "start votes" and a start with ALL m
  * votes is an occurrence. Duplicate phrase terms need no special
  * case: pos = s + i is injective per (s, i), so each offset
  * contributes at most one vote per start. Overlapping occurrences
  * count correctly ("a a" in "a a a" → starts {0, 1}) — the
  * replace-and-measure trick a string-side oracle would use cannot
  * say that, which is why the DuckDB oracle replays POSITIONS too.
  *
  * Scale shape (the [[PostingsIndex]] argument, plus positions):
  *  - build/extend: one tokenize + one (term, doc_id) groupBy —
  *    embarrassingly parallel, done once into the store; extend costs
  *    |delta| tokens and is idempotent by construction (a replayed
  *    doc recomputes the identical position array under the same
  *    key — no ledger needed for content convergence);
  *  - serve: the `term IN (query terms)` filter reaches the postings
  *    parquet reader, so the scan is matched-posting-sized, never
  *    corpus-sized; the start-vote shuffle carries (query, doc,
  *    start) triples bounded by Σ matched term frequencies; the
  *    query-cardinality table broadcasts.
  */
object PhraseIndex {

  /** (term, doc_id, positions) rows for `docs` — the stored shape. */
  private def postings(docs: DataFrame): DataFrame =
    Distributed.parallelized(docs)
      .select(col("doc_id"),
        posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy("term", "doc_id")
      .agg(sort_array(collect_list(col("pos"))).as("positions"))

  /** Build the positional store from scratch. */
  def build(spark: SparkSession, docs: DataFrame, path: String): Unit =
    UpsertStore.replace(spark, path, postings(docs),
      Seq("term", "doc_id"), assumeKeyUnique = true)

  /** Fold a new-docs batch in. Documents are append-only by doc_id
    * (the engine-wide corpus contract), so the delta's recomputed
    * (term, doc_id, positions) rows upsert idempotently — a replayed
    * batch writes byte-identical arrays under the same keys. */
  def extend(spark: SparkSession, docs: DataFrame, path: String,
             txnId: Option[Long] = None): Unit =
    UpsertStore.upsert(spark, path, postings(docs),
      Seq("term", "doc_id"), assumeKeyUnique = true, txnId = txnId)

  /** RETRACT documents from the positional store (round 17 — the
    * takedown lifecycle): the family's simplest inverse, mirroring
    * its simplest extend — every stored row is a pure function of its
    * doc's text, so the deleted (term, doc_id) keys recompute from
    * the gone rows and the keyed deletes are idempotent under replay;
    * there are no counts to repair. The catalog meta (when present)
    * advances by the XOR-retract rule behind a txn guard (the
    * [[TrigramIndex.retract]] discipline). Contract: retracted rows
    * must currently be indexed. */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "doc_id")
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head())
    val metaTxn = meta.map(Retraction.fromMeta).getOrElse(-1L)
    if (meta.isDefined && txnId.exists(_ <= metaTxn)) return
    UpsertStore.delete(spark, path, postings(gone), Seq("term", "doc_id"))
    meta.foreach { m =>
      val (dn, dh) = PairGraph.corpusFingerprint(gone)
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, m.getAs[Long]("corpus_n") - dn,
          m.getAs[Long]("corpus_h") ^ dh)
          .withColumn("rtxn", lit(txnId.getOrElse(metaTxn))),
        Seq("meta_id"), assumeKeyUnique = true)
    }
  }

  private def metaRow(spark: SparkSession, n: Long, h: Long): DataFrame =
    spark.range(1).select(lit(1L).as("meta_id"),
      lit(n).as("corpus_n"), lit(h).as("corpus_h"))

  /** Register the positional store under the `graft` catalog (the
    * q179/q180/q186 idiom): build-or-gate-serve at the warehouse
    * path, then `<catalog>.<name>` reads the live (term, doc_id,
    * positions) postings, so the whole phrase serve (q193) is one SQL
    * text by table name. Fingerprint gate is the [[PairGraph]] rule:
    * a corpus-matching meta row (committed LAST, after the data
    * store) skips the rebuild; any crash window degrades to a
    * rebuild, never a stale serve. Returns the store path. */
  def registerCatalog(spark: SparkSession, name: String, docs: DataFrame,
                      catalog: String = "graft"): String = {
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    val (n, h) = PairGraph.corpusFingerprint(docs)
    val fresh = UpsertStore.read(spark, s"${path}__meta").exists(
      _.filter(col("corpus_n") === n && col("corpus_h") === h).count() == 1)
    if (!fresh) {
      build(spark, docs, path)
      UpsertStore.replace(spark, s"${path}__meta", metaRow(spark, n, h),
        Seq("meta_id"), assumeKeyUnique = true)
    }
    PairGraph.ensureTable(spark, catalog, name, path, Seq("term", "doc_id"))
    path
  }

  /** PROXIMITY serve (NEAR/w — the other classic positional-index
    * query, Manning IIR §2.4.2's "within k words"): a doc matches
    * when some occurrence of the query's FIRST term has EVERY other
    * distinct query term within `w` token positions of it (the
    * anchor-based NEAR semantics — deterministic and positionally
    * replayable, unlike "smallest cover window" which needs a scan).
    * Returns (query, doc_id, n_anchors) — how many anchor occurrences
    * satisfy the window; a single-term query degenerates to tf, the
    * q191 consistency. Same scale shape as [[search]]: matched-
    * posting-sized reads, per-(query, doc) group sizes = distinct
    * query terms, the window check runs as nested higher-order
    * functions over position arrays bounded by tf. */
  def searchNear(spark: SparkSession, path: String, phrases: DataFrame,
                 w: Int): DataFrame = {
    // DISTINCT query terms, each keeping its first offset (the anchor
    // is the term at offset 0)
    val qt = phrases.select(col("query"),
        posexplode(TextAnalysis.tokens(col("query"))).as(Seq("qi", "term")))
      .groupBy("query", "term").agg(min("qi").as("qi"))
    val nq = qt.groupBy("query").agg(count(lit(1)).as("nq"))
    qt.join(matchedPostings(spark, path, qt), Seq("term"))
      .groupBy("query", "doc_id")
      .agg(count(lit(1)).as("got"),
        // collect_list skips nulls: exactly the anchor's positions /
        // the other terms' position arrays
        flatten(collect_list(when(col("qi") === 0, col("positions")))).as("anchors"),
        collect_list(when(col("qi") =!= 0, col("positions"))).as("others"))
      .join(broadcast(nq), Seq("query"))
      .filter(col("got") === col("nq")) // every distinct term present
      .withColumn("n_anchors", expr(
        s"size(filter(anchors, p -> forall(others, o -> exists(o, q -> abs(q - p) <= $w))))")
        .cast("long"))
      .filter(col("n_anchors") > 0)
      .select("query", "doc_id", "n_anchors")
  }

  /** The stored postings restricted to the phrases' terms, with the
    * restriction as a DRIVER-KNOWN `term IN (...)` predicate so it
    * reaches the parquet reader (row-group min/max + dictionary
    * pruning) — a bare join would broadcast-probe but still SCAN the
    * whole store. Query terms are user-query-sized: the bounded
    * collect is the [[graft.plans.AnnTopKRewrite]] precedent. */
  /** Pushdown cap: above this many distinct query terms the driver
    * collect stops being "bounded" and the IN-list stops being a
    * predicate a reader can use — fall back to the plain join, whose
    * broadcast probe still prunes rows (just not the scan). */
  private val MaxPushdownTerms = 65536

  private def matchedPostings(spark: SparkSession, path: String,
                              qt: DataFrame): DataFrame = {
    val store = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"no phrase store at $path — build first"))
    val terms = qt.select("term").distinct()
      .limit(MaxPushdownTerms + 1).collect().map(_.getString(0))
    if (terms.length > MaxPushdownTerms) store // declared fallback
    else store.filter(col("term").isin(terms.toSeq: _*))
  }

  /** Exact phrase serve from the stored positional postings.
    * `phrases` is a (query) frame; returns (query, doc_id, n_hits) —
    * n_hits counts occurrence START positions, overlap-aware. */
  def search(spark: SparkSession, path: String, phrases: DataFrame): DataFrame = {
    // query terms with their 0-based phrase offsets; nq broadcasts
    // (query-cardinality-sized)
    val qt = phrases.select(col("query"),
      posexplode(TextAnalysis.tokens(col("query"))).as(Seq("qi", "term")))
    val nq = qt.groupBy("query").agg(count(lit(1)).as("nq"))
    qt.join(matchedPostings(spark, path, qt), Seq("term")) // pushed-down posting read
      .select(col("query"), col("qi"), col("doc_id"),
        explode(col("positions")).as("pos"))
      .select(col("query"), col("doc_id"), (col("pos") - col("qi")).as("start"))
      .groupBy("query", "doc_id", "start")
      .agg(count(lit(1)).as("votes"))
      .join(broadcast(nq), Seq("query"))
      .filter(col("votes") === col("nq")) // every phrase offset present
      .groupBy("query", "doc_id")
      .agg(count(lit(1)).as("n_hits"))
  }
}
