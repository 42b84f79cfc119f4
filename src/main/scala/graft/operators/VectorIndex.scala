package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TopKFunctions, VectorFunctions}
import graft.streaming.{Retraction, UpsertStore}

/** Materialize-once storage for the ANN VECTOR INDEX — the embedding
  * twin of [[PairGraph]].
  *
  * [[Similarity.ivfSearch]] re-derives the coarse quantizer state
  * (centroid set + per-vector cell assignment) on every call: one
  * corpus×centroids broadcast pass per query batch. That is the right
  * shape for a one-off, and the wrong one for the production serve
  * path, where the corpus is ~stable and query batches arrive
  * continuously — at 100 TB the assignment pass alone re-reads the
  * whole embedding table per batch. The production shape is: assign
  * ONCE, persist (vec_id, cell, embedding) keyed by vec_id next to
  * the centroid table, and let every query batch join its probed
  * cells against the stored assignment.
  *
  * Storage is an [[graft.streaming.UpsertStore]] table — atomic
  * replace, time travel, CDC for free — and freshness uses the exact
  * [[PairGraph]] discipline: a corpus FINGERPRINT (row count + an
  * order-independent `bit_xor` of per-row hashes) written next to the
  * cells and recomputed from the corpus on every serve; the meta row
  * commits LAST, so every crash window degrades to a recompute, never
  * a stale serve. [[extend]] folds a batch of NEW vectors in with one
  * delta×centroids broadcast pass — the old corpus is never re-read —
  * and advances the fingerprint associatively (count adds, XOR
  * composes).
  *
  * Centroids are the first `centroids` vectors by `vec_id` — the same
  * deterministic seed rule as [[Similarity.ivfSearch]], so the stored
  * index and the from-scratch computation agree bit-for-bit (the
  * extend ≡ scratch spec and the shared q50 brute-force oracle both
  * rely on this). Seeds-as-centroids is intentionally NOT k-means:
  * centroid drift would invalidate stored assignments and break the
  * incremental contract; a production re-train is a new index build
  * (gate miss), not a mutation.
  */
object VectorIndex {

  /** Dirty-meta + per-store txn crash discipline — the exact
    * [[PairGraph]] rules (see its class doc): dirty meta fails the gate
    * for EVERY corpus before any data mutation; clean meta (committed
    * last) records the caller's txn so replayed extends self-skip. */
  private def isDirty(m: org.apache.spark.sql.Row): Boolean =
    m.schema.fieldNames.contains("dirty") && m.getAs[Boolean]("dirty")

  private def metaTxn(m: org.apache.spark.sql.Row): Long =
    if (m.schema.fieldNames.contains("txn")) m.getAs[Long]("txn") else -1L

  private def gateOk(m: DataFrame, n: Long, h: Long, centroids: Int): Boolean = {
    val dirtyCol = if (m.columns.contains("dirty")) col("dirty") else lit(false)
    m.filter(col("corpus_n") === n && col("corpus_h") === h &&
      col("centroids") === centroids && !dirtyCol).count() == 1
  }

  /** Order-independent corpus fingerprint over (vec_id, embedding);
    * same rule as [[PairGraph.corpusFingerprint]] (xxhash64 hashes the
    * float array elementwise; bit_xor is ANSI-overflow-safe). */
  private[graft] def corpusFingerprint(emb: DataFrame): (Long, Long) = {
    val row = emb.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(vec_id, embedding))"), lit(0L)).as("h"))
      .head()
    (row.getLong(0), row.getLong(1))
  }

  /** Default store root: per-user under the JVM tmpdir (shared /tmp
    * would let concurrent users thrash each other's caches into
    * perpetual rebuilds); env override for a real deployment. */
  private def root: String =
    sys.env.getOrElse("GRAFT_VECTOR_INDEX_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-${System.getProperty("user.name", "anon")}/vector_index")

  /** Store location for one (corpus dir, centroid count) — freshness
    * is the fingerprint gate's job, not the path's. 64-bit key: a
    * 32-bit one collides at ~2^16 corpus dirs. */
  private[graft] def storePath(dataDir: String, centroids: Int): String =
    s"$root/vindex_${PairGraph.dirKey64(dataDir)}_c$centroids"

  private def metaRow(spark: SparkSession, n: Long, h: Long, centroids: Int,
                      dirty: Boolean = false, txn: Long = -1L,
                      rtxn: Long = -1L): DataFrame =
    spark.range(1).select(
      lit(1L).as("meta_id"), lit(n).as("corpus_n"), lit(h).as("corpus_h"),
      lit(centroids).as("centroids"), lit(dirty).as("dirty"), lit(txn).as("txn"),
      lit(rtxn).as("rtxn"))

  /** Retraction high-water mark — preserved by every meta rewrite (the
    * round-18 engine-wide rule; see [[IvfPqIndex]]). */
  private def metaRtxn(m: org.apache.spark.sql.Row): Long =
    Retraction.fromMeta(m)

  /** Deterministic nearest-centroid assignment: one broadcast pass,
    * cosine tie broken to the higher centroid id via the struct
    * ordering (float ties are vanishingly rare, but extend ≡ scratch
    * must not depend on rarity). */
  private def assignCells(emb: DataFrame, cents: DataFrame): DataFrame =
    emb.crossJoin(broadcast(cents))
      .withColumn("csim", nanvl(
        VectorFunctions.cosine_similarity(col("embedding"), col("cemb")), lit(-1.0)))
      .groupBy("vec_id")
      .agg(
        max_by(col("centroid_id"), struct(col("csim"), col("centroid_id"))).as("cell"),
        first(col("embedding")).as("embedding"))

  /** The stored assignment table (vec_id, cell, embedding) for `emb`:
    * served when the recorded fingerprint matches the corpus,
    * otherwise built from scratch (seed centroids → one assignment
    * pass), committed cells → centroids → meta (meta LAST — the
    * [[PairGraph]] crash rule), and then served from the store. */
  def index(spark: SparkSession, emb: DataFrame, dataDir: String,
            centroids: Int = 16, pathOverride: Option[String] = None,
            fp: Option[(Long, Long)] = None): DataFrame = {
    val path = pathOverride.getOrElse(storePath(dataDir, centroids))
    val metaPath = s"${path}__meta"
    val (n, h) = fp.getOrElse(corpusFingerprint(emb))
    val stored = UpsertStore.read(spark, metaPath).flatMap { m =>
      if (gateOk(m, n, h, centroids)) UpsertStore.read(spark, path) else None
    }
    stored.getOrElse {
      val prevMeta = UpsertStore.read(spark, metaPath)
      val prevTxn = prevMeta.map(m => metaTxn(m.head())).getOrElse(-1L)
      val prevRtxn = prevMeta.map(m => metaRtxn(m.head())).getOrElse(-1L)
      val cents = emb.orderBy("vec_id").limit(centroids)
        .select(col("vec_id").as("centroid_id"), col("embedding").as("cemb"))
      val cells = assignCells(emb, cents)
      // dirty → data → clean meta (the PairGraph crash rule): a partial
      // rebuild must fail the gate for the old corpus too; a first
      // build has no meta to mismatch — skip the commit. All writes
      // are key-unique by construction (groupBy/limit outputs, one
      // meta row) — the store-side dedup shuffle is skipped.
      if (prevMeta.isDefined) UpsertStore.replace(spark, metaPath,
        metaRow(spark, -1L, 0L, centroids, dirty = true, prevTxn, prevRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
      UpsertStore.replace(spark, path, cells, Seq("vec_id"), assumeKeyUnique = true)
      UpsertStore.replace(spark, s"${path}__centroids", cents, Seq("centroid_id"),
        assumeKeyUnique = true)
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, n, h, centroids, dirty = false, prevTxn, prevRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
      UpsertStore.read(spark, path).getOrElse(
        sys.error(s"vector index store $path unreadable immediately after commit"))
    }
  }

  /** Register the vector index for `emb` under the `graft` catalog
    * (VERDICT r7 #5) — the [[PairGraph.registerCatalog]] twin: builds
    * (or gate-serves) the cell + centroid stores at the catalog
    * warehouse so the location is table identity, then creates
    * `<catalog>.<name>` (cells) and `<catalog>.<name>__centroids`.
    * Fingerprint gates unchanged; returns the `pathOverride` for
    * [[extend]]/[[searchIndexed]]. */
  def registerCatalog(spark: SparkSession, name: String, emb: DataFrame,
                      dataDir: String, centroids: Int = 16,
                      catalog: String = "graft"): String = {
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    // index() builds eagerly on a gate miss and is a no-op read on a
    // hit — forcing the returned frame would re-scan the whole table
    index(spark, emb, dataDir, centroids, Some(path))
    PairGraph.ensureTable(spark, catalog, name, path, Seq("vec_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__centroids",
      s"${path}__centroids", Seq("centroid_id"))
    path
  }

  /** INCREMENTAL maintenance — the continuous-ingest shape: assign a
    * batch of NEW vectors against the STORED centroids (one
    * delta-sized broadcast pass; the old corpus is never re-read),
    * upsert the cells, advance the fingerprint associatively
    * (new_h = old_h XOR delta_h — no old-corpus scan). Serving
    * afterwards goes through [[index]] with the grown corpus, whose
    * fingerprint now matches.
    *
    * Contract: delta vec_ids must be NEW (an id collision would alias
    * two vectors under one cell row). Centroids never move on extend —
    * that is what keeps stored assignments valid (see class doc).
    *
    * Replay safety: `txnId` recorded in the clean meta skips an
    * already-committed batch; a retry after a crash mid-extend resumes
    * from the dirty meta's preserved pre-extend fingerprint (the cell
    * upsert is last-writer-wins — same delta converges on contents). */
  def extend(spark: SparkSession, delta: DataFrame, dataDir: String,
             centroids: Int = 16, pathOverride: Option[String] = None,
             txnId: Option[Long] = None,
             deltaFp: Option[(Long, Long)] = None): Unit = {
    val path = pathOverride.getOrElse(storePath(dataDir, centroids))
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no vector index at $path to extend — run index first"))
    val mTxn = metaTxn(meta)
    if (txnId.exists(_ <= mTxn)) return // replay of a committed extend
    require(!(isDirty(meta) && meta.getAs[Long]("corpus_n") < 0),
      s"vector index at $path was left dirty by an interrupted REBUILD — " +
        "there is no base fingerprint to extend from; rerun index")
    require(meta.getAs[Int]("centroids") == centroids,
      s"index at $path was built with ${meta.getAs[Int]("centroids")} centroids, " +
        s"asked $centroids")
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"vector index at $path has no centroid table"))
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    val mRtxn = metaRtxn(meta)
    // dirty FIRST (pre-extend fingerprint preserved for the retry path)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN, baseH, centroids, dirty = true, mTxn, mRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
    UpsertStore.upsert(spark, path, assignCells(delta, cents), Seq("vec_id"),
      assumeKeyUnique = true)
    val (dn, dh) = deltaFp.getOrElse(corpusFingerprint(delta))
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN + dn, baseH ^ dh, centroids, dirty = false,
        txnId.getOrElse(mTxn), mRtxn), Seq("meta_id"), assumeKeyUnique = true)
  }

  /** RETRACT vectors from the cell store (round 18 — VERDICT r17 #2's
    * "declared surfaces" clause: q96/q119 still serve this store even
    * though [[IvfPqIndex]] supersedes it): the [[IvfPqIndex.retract]]
    * contract verbatim — keyed vec_id delete, NO centroid move (the
    * assignment geometry is membership-independent), XOR fingerprint
    * retreat so `index(remaining)` gate-serves, `rtxn` retraction
    * ledger separate from the extend ledger and preserved across every
    * meta rewrite. `gone` carries (vec_id, embedding) full rows.
    * Contract: retracted rows must currently be indexed. */
  def retract(spark: SparkSession, gone0: DataFrame, dataDir: String,
              centroids: Int = 16, pathOverride: Option[String] = None,
              txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "vec_id")
    val path = pathOverride.getOrElse(storePath(dataDir, centroids))
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no vector index at $path to retract from — run index first"))
    val mTxn = metaTxn(meta)
    val mRtxn = metaRtxn(meta)
    if (txnId.exists(_ <= mRtxn)) return
    require(!(isDirty(meta) && meta.getAs[Long]("corpus_n") < 0),
      s"vector index at $path was left dirty by an interrupted REBUILD — rerun index")
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN, baseH, centroids, dirty = true, mTxn, mRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
    UpsertStore.delete(spark, path, gone.select("vec_id"), Seq("vec_id"))
    val (dn, dh) = corpusFingerprint(gone)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN - dn, baseH ^ dh, centroids, dirty = false, mTxn,
        txnId.getOrElse(mRtxn)),
      Seq("meta_id"), assumeKeyUnique = true)
  }

  /** IVF top-k for an EXTERNAL query batch — the production serve
    * shape, where query vectors arrive from outside the corpus
    * (a retrieval request, a dedup-against-index check) rather than
    * being corpus members selected by predicate. Reads cells +
    * centroids straight from the store with NO fingerprint gate: the
    * caller owns freshness (a [[graft.streaming.VectorIndexMaintainer]]
    * ledger, or a preceding [[index]]/[[extend]] call in the same
    * job). `queries` must carry (query_id, qe); output contract is the
    * same (query_id, rk, neighbor_id) as [[searchStored]], except
    * external queries are never filtered out of their own neighbor
    * lists (an external id never collides with a corpus vec_id by
    * contract). Cost: |queries| × centroids probe + the probed cells'
    * rows — corpus-sized work never happens at query time. */
  def searchIndexed(spark: SparkSession, path: String, queries: DataFrame,
                    nProbe: Int = 10, k: Int = 3): DataFrame = {
    val cells = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"no vector index at $path — run index first"))
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"vector index at $path has no centroid table"))
    val probes = queries
      .crossJoin(broadcast(cents))
      .withColumn("csim", nanvl(
        VectorFunctions.cosine_similarity(col("qe"), col("cemb")), lit(-1.0)))
      .groupBy("query_id")
      .agg(
        TopKFunctions.top_k_by_score(col("csim"), col("centroid_id"), nProbe).as("cells"),
        first(col("qe")).as("qe"))
      .select(col("query_id"), col("qe"), explode(col("cells.id")).as("cell"))
    probes.join(cells.select(col("cell"), col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("cell"))
      .withColumn("sim",
        nanvl(VectorFunctions.cosine_similarity(col("qe"), col("ce")), lit(-1.0)))
      .groupBy("query_id")
      .agg(TopKFunctions.top_k_by_score(col("sim"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** IVF top-k over the STORED index: probe the query batch against
    * the centroid table (queries × centroids — query-sized), explode
    * to the `nProbe` best cells, equi-join the stored assignment on
    * the cell id, exact-cosine verify, top-k. Identical output
    * contract to [[Similarity.ivfSearch]] — (query_id, rk,
    * neighbor_id), rank ties broken by neighbor id inside the top-k
    * aggregate — so the two paths share one oracle. The corpus scan
    * this saves vs `ivfSearch` is the assignment pass; the candidate
    * join itself reads only the probed cells' rows. */
  def searchStored(spark: SparkSession, emb: DataFrame, dataDir: String,
                   queryPred: Column, centroids: Int = 16, nProbe: Int = 10,
                   k: Int = 3, pathOverride: Option[String] = None,
                   fp: Option[(Long, Long)] = None): DataFrame = {
    val path = pathOverride.getOrElse(storePath(dataDir, centroids))
    val cells = index(spark, emb, dataDir, centroids, pathOverride, fp)
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"vector index at $path has no centroid table"))
    memberServe(cells, cents, queryPred, nProbe, k)
  }

  /** Corpus-member IVF top-k straight from the STORED index with NO
    * fingerprint gate — [[searchIndexed]]'s freshness contract (the
    * caller owns it: a maintainer ledger, or a preceding index/extend
    * in the same job) applied to MEMBER queries: query vectors are
    * stored cell rows selected by predicate, and self-matches are
    * excluded before the heap, so the output contract is exactly
    * [[searchStored]]'s. `nProbe = centroids` makes the serve exact
    * (every cell probed — the MultimodalEmbedSpec losslessness
    * argument), which is what lets a maintained index share a
    * brute-force oracle. */
  def searchMembers(spark: SparkSession, path: String, queryPred: Column,
                    nProbe: Int = 10, k: Int = 3): DataFrame = {
    val cells = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"no vector index at $path — run index first"))
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"vector index at $path has no centroid table"))
    memberServe(cells, cents, queryPred, nProbe, k)
  }

  /** The shared member-query serve tail (probe → nProbe cells → exact
    * verify → bounded-heap top-k, self-matches excluded). */
  private def memberServe(cells: DataFrame, cents: DataFrame, queryPred: Column,
                          nProbe: Int, k: Int): DataFrame = {
    val probes = cells.filter(queryPred)
      .crossJoin(broadcast(cents))
      .withColumn("csim", nanvl(
        VectorFunctions.cosine_similarity(col("embedding"), col("cemb")), lit(-1.0)))
      .groupBy(col("vec_id").as("query_id"))
      .agg(
        TopKFunctions.top_k_by_score(col("csim"), col("centroid_id"), nProbe).as("cells"),
        first(col("embedding")).as("qe"))
      .select(col("query_id"), col("qe"), explode(col("cells.id")).as("cell"))
    probes.join(cells.select(col("cell"), col("vec_id").as("neighbor_id"),
        col("embedding").as("ce")), Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim",
        nanvl(VectorFunctions.cosine_similarity(col("qe"), col("ce")), lit(-1.0)))
      .groupBy("query_id")
      .agg(TopKFunctions.top_k_by_score(col("sim"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("neighbor_id"))
      .orderBy("query_id", "rk")
  }
}
