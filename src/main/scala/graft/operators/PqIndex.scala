package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TopKFunctions, VectorFunctions}
import graft.streaming.{Retraction, UpsertStore}

/** Materialize-once storage for the PRODUCT-QUANTIZATION ANN index —
  * the compressed member of the stored-index family (pair graph q93,
  * IVF cells q96, BM25 postings q104, train grams q108).
  *
  * q119 re-trains codebooks and re-encodes the corpus on every call;
  * the production shape builds ONCE: per-subspace codebooks (M·K rows
  * of metadata) plus an 8-codes-per-vector table — 8 B of index per
  * 256 B vector, the representation a 100 TB corpus can keep hot.
  * Query batches then pay only the broadcast ADC lookup against the
  * stored codes; raw embeddings are touched exclusively to re-rank
  * the top-C candidates (a point-lookup join on vec_id).
  *
  * Freshness is the [[VectorIndex]] discipline verbatim: corpus
  * fingerprint (count + order-independent bit_xor) in a meta row
  * committed LAST behind a dirty bracket, so every crash window
  * degrades to a rebuild, never a stale serve. [[extend]] encodes a
  * delta against the STORED codebooks — codebooks never move on
  * extend (the [[VectorIndex]] centroid-pinning rule: retraining
  * would invalidate every stored code; a re-train is a new build via
  * gate miss, not a mutation) — and advances the fingerprint
  * associatively, so the old corpus is never re-read.
  *
  * Output-level correctness contract: the stored serve exact-reranks
  * the ADC top-C, and its measured recall vs brute force is 1.0 on
  * this corpus (pool margin pinned by SpanBloomPqSpec), so q122/q123
  * share q50's oracle — the driver's hash compare IS the recall gate,
  * even though extend-time codebooks (trained on the base corpus)
  * differ bit-wise from what a full rebuild would train.
  */
object PqIndex {

  private[operators] val M = 8
  private[operators] val SUB = 8
  private[operators] val K = 32
  private[operators] val ITERS = 2
  /** ADC pool size before exact re-rank. Sized for the WORST consumer:
    * the incremental lifecycle (q123) trains codebooks on the base 80%
    * and its measured worst true-neighbor pool rank is 277 at sf0.1 —
    * 512 holds ≥ 1.8× margin there and ≥ 4× for full-corpus codebooks
    * (q119/q122, worst ≈ 100–150). A constant, not corpus-growing:
    * the re-rank fetches ≤ C raw vectors per query at any scale. */
  private[operators] val C = 512

  // ---- shared PQ math (q119 calls these too — one convention) ----

  /** Unit-normalize: on the sphere ‖q−x‖² = 2 − 2·cos, so squared-L2
    * ADC orders by cosine. Zero vectors map to the origin. */
  private[operators] def unitEmb(e: DataFrame): DataFrame =
    e.withColumn("nrm",
        sqrt(expr("aggregate(emb, 0.0d, (a, x) -> a + x * x)")))
      .withColumn("uemb", expr("transform(emb, x -> x / greatest(nrm, 1e-300))"))
      .select(col("vec_id"), col("uemb").as("emb"))

  /** (vec_id, m, sub): the M contiguous subvectors of each unit
    * embedding. */
  private[operators] def subParts(u: DataFrame): DataFrame =
    u.select(col("vec_id"), explode(expr(
      s"transform(sequence(0, ${M - 1}), " +
        s"m -> struct(m AS m, slice(emb, m * $SUB + 1, $SUB) AS sub))")).as("p"))
      .select(col("vec_id"), col("p.m").as("m"), col("p.sub").as("sub"))

  private def centSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("m",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("cid",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("cemb",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.DoubleType), nullable = false)))

  /** ITERS deterministic Lloyd steps per subspace from the q111-style
    * seeding (vec_id % K), all M subspaces in one keyed plan; between
    * iterations the M·K centroids round-trip through the driver as a
    * literal relation (metadata-scale — the q115 bounded-collect
    * discipline). Returns (codebooks literal DF, final assignment). */
  private[operators] def trainCodebooks(s: SparkSession, parts0: DataFrame)
      : (DataFrame, DataFrame) = {
    // Lloyd re-reads the subvector relation once per iteration plus
    // once for the final encode/pack — persist it (MEMORY_AND_DISK,
    // the MLlib-KMeans input-caching discipline) instead of paying the
    // parquet scan + normalize + explode on every pass. ~100 B × M
    // rows per vector, spills past memory; released by build()'s
    // unpersist / the harness' per-query clearCache.
    val parts = parts0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var assigned = parts.withColumn("cid", (col("vec_id") % K).cast("int"))
    var cent: DataFrame = null
    for (_ <- 1 to ITERS) {
      val rows = assigned.select(col("m"), col("cid"), posexplode(col("sub")))
        .groupBy("m", "cid", "pos").agg(avg(col("col")).as("av"))
        .groupBy("m", "cid")
        .agg(array_sort(collect_list(struct(col("pos"), col("av")))).as("pv"))
        .select(col("m"), col("cid"), expr("transform(pv, x -> x.av)").as("cemb"))
        .collect()
      cent = s.createDataFrame(
        s.sparkContext.parallelize(rows.toIndexedSeq, 1), centSchema)
      assigned = encodeParts(parts, cent)
    }
    (cent, assigned)
  }

  /** Nearest codebook entry per (vector, subspace): 6-dp rounded
    * argmin, ties → ascending cid (the q111 cross-engine contract). */
  private[operators] def encodeParts(parts: DataFrame, cent: DataFrame): DataFrame =
    parts.join(broadcast(cent), Seq("m"))
      .withColumn("dst",
        round(VectorFunctions.l2_distance(col("sub"), col("cemb")), 6))
      .groupBy("vec_id", "m")
      .agg(min_by(col("cid"), struct(col("dst"), col("cid"))).as("cid"),
        first(col("sub")).as("sub"))

  /** Pack per-subspace codes into the stored row shape
    * (vec_id, codes array ordered by m). */
  private[operators] def packCodes(assigned: DataFrame): DataFrame =
    assigned.groupBy("vec_id")
      .agg(array_sort(collect_list(struct(col("m"), col("cid")))).as("mc"))
      .select(col("vec_id"), expr("transform(mc, x -> x.cid)").as("codes"))

  /** ADC candidate pool: per (query, m, cid) squared-L2 lookup table
    * (broadcast, M·K rows/query), candidate distance = Σ_m table
    * entries over the candidate's codes, bounded-heap top-C. Output
    * (query_id, pool_rank, neighbor_id). `qparts` must carry
    * (query_id, m, qsub). */
  private[operators] def adcPool(codes: DataFrame, cent: DataFrame,
                                 qparts: DataFrame): DataFrame = {
    val unpacked = codes.select(col("vec_id"),
      posexplode(col("codes"))).select(
      col("vec_id"), col("pos").cast("int").as("cm"), col("col").as("code"))
    val lut = qparts.join(broadcast(cent), Seq("m"))
      .select(col("query_id"), col("m").as("lm"), col("cid").as("lcode"),
        pow(VectorFunctions.l2_distance(col("qsub"), col("cemb")), 2).as("d2"))
    unpacked.join(broadcast(lut),
        col("cm") === col("lm") && col("code") === col("lcode"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("d2")).as("adist"))
      .filter(col("query_id") =!= col("vec_id"))
      .groupBy("query_id")
      // TIE-CLOSED pool (round 19 — VERDICT r18 #5): top-C plus every
      // candidate tied with the C-th ADC distance, so the pool is a
      // pure function of distances — on code-degenerate corpora (many
      // vectors sharing a code ⇒ identical adist) a plain top-C cut
      // boundary ties by id order and could drop a true neighbor the
      // exact re-rank can never recover. Headroom 4C bounds memory;
      // beyond it the aggregate REFUSES loudly (see PoolTieClosed).
      .agg(TopKFunctions.top_k_pool_tie_closed(-col("adist"), col("vec_id"),
        C, 4 * C).as("cand"))
      .select(col("query_id"), posexplode(expr("transform(cand, x -> x.id)")))
      .select(col("query_id"), (col("pos") + 1).as("pool_rank"),
        col("col").as("neighbor_id"))
  }

  // ---- the store ----

  private def root: String =
    sys.env.getOrElse("GRAFT_PQ_INDEX_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-${System.getProperty("user.name", "anon")}/pq_index")

  private[graft] def storePath(dataDir: String): String =
    s"$root/pq_${PairGraph.dirKey64(dataDir)}"

  private def metaRow(spark: SparkSession, n: Long, h: Long,
                      dirty: Boolean, txn: Long, rtxn: Long = -1L): DataFrame =
    spark.range(1).select(
      lit(1L).as("meta_id"), lit(n).as("corpus_n"), lit(h).as("corpus_h"),
      lit(M).as("m"), lit(K).as("k"), lit(dirty).as("dirty"), lit(txn).as("txn"),
      lit(rtxn).as("rtxn"))

  /** Retraction high-water mark — preserved by every meta rewrite (the
    * round-18 engine-wide rule; see [[IvfPqIndex]]). */
  private def metaRtxn(m: org.apache.spark.sql.Row): Long =
    Retraction.fromMeta(m)

  private def gateOk(m: DataFrame, n: Long, h: Long): Boolean =
    m.filter(col("corpus_n") === n && col("corpus_h") === h &&
      col("m") === M && col("k") === K && !col("dirty")).count() == 1

  /** Build (or fingerprint-gate-serve) the PQ index for `emb` —
    * codebooks + packed codes, dirty → data → clean meta. Returns the
    * stored codes table. `emb` carries (vec_id, emb double[]). */
  def ensure(spark: SparkSession, emb: DataFrame, path: String,
             fp: Option[(Long, Long)] = None): DataFrame = {
    val metaPath = s"${path}__meta"
    val (n, h) = fp.getOrElse(fingerprint(emb))
    val prev = UpsertStore.read(spark, metaPath)
    val stored =
      if (prev.exists(m => gateOk(m, n, h))) UpsertStore.read(spark, path)
      else None
    stored.getOrElse {
      val prevTxn = prev.map(_.head().getAs[Long]("txn")).getOrElse(-1L)
      val prevRtxn = prev.map(m => metaRtxn(m.head())).getOrElse(-1L)
      if (prev.isDefined) UpsertStore.replace(spark, metaPath,
        metaRow(spark, -1L, 0L, dirty = true, prevTxn, prevRtxn), Seq("meta_id"),
        assumeKeyUnique = true)
      val parts = subParts(unitEmb(emb))
      val (cent, assigned) = trainCodebooks(spark, parts)
      UpsertStore.replace(spark, path, packCodes(assigned), Seq("vec_id"),
        assumeKeyUnique = true)
      // codes are materialized — the Lloyd-loop cache is done
      parts.unpersist()
      UpsertStore.replace(spark, s"${path}__codebooks", cent, Seq("m", "cid"),
        assumeKeyUnique = true)
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, n, h, dirty = false, prevTxn, prevRtxn), Seq("meta_id"),
        assumeKeyUnique = true)
      UpsertStore.read(spark, path).getOrElse(
        sys.error(s"pq index store $path unreadable immediately after commit"))
    }
  }

  /** Fold NEW vectors in: encode the delta against the STORED
    * codebooks (one delta-sized broadcast pass — the old corpus is
    * never re-read), upsert the packed codes, advance the fingerprint
    * associatively. Codebooks never move (class doc). Replay-safe via
    * the txn ledger; crash-retry converges (last-writer-wins codes,
    * dirty meta preserves the pre-extend fingerprint). */
  def extend(spark: SparkSession, delta: DataFrame, path: String,
             txnId: Option[Long] = None,
             deltaFp: Option[(Long, Long)] = None): Unit = {
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no pq index at $path to extend — run ensure first"))
    val mTxn = meta.getAs[Long]("txn")
    if (txnId.exists(_ <= mTxn)) return
    require(!(meta.getAs[Boolean]("dirty") && meta.getAs[Long]("corpus_n") < 0),
      s"pq index at $path was left dirty by an interrupted REBUILD — rerun ensure")
    val cent = UpsertStore.read(spark, s"${path}__codebooks").getOrElse(
      sys.error(s"pq index at $path has no codebook table"))
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    val mRtxn = metaRtxn(meta)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN, baseH, dirty = true, mTxn, mRtxn), Seq("meta_id"),
      assumeKeyUnique = true)
    UpsertStore.upsert(spark, path,
      packCodes(encodeParts(subParts(unitEmb(delta)), cent)), Seq("vec_id"),
      assumeKeyUnique = true)
    val (dn, dh) = deltaFp.getOrElse(fingerprint(delta))
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN + dn, baseH ^ dh, dirty = false,
        txnId.getOrElse(mTxn), mRtxn), Seq("meta_id"), assumeKeyUnique = true)
  }

  /** RETRACT vectors from the code store (round 18 — VERDICT r17 #2's
    * "declared surfaces" clause: q122/q123 still serve this store even
    * though [[IvfPqIndex]] supersedes it): the [[IvfPqIndex.retract]]
    * contract — keyed vec_id delete, codebooks PINNED (they encode
    * per-vector values; membership does not move them), XOR
    * fingerprint retreat so `ensure(remaining)` gate-serves, `rtxn`
    * retraction ledger separate from the extend ledger and preserved
    * across every meta rewrite. `gone` carries (vec_id, emb) full
    * rows. Contract: retracted rows must currently be indexed. */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "vec_id")
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no pq index at $path to retract from — run ensure first"))
    val mTxn = meta.getAs[Long]("txn")
    val mRtxn = metaRtxn(meta)
    if (txnId.exists(_ <= mRtxn)) return
    require(!(meta.getAs[Boolean]("dirty") && meta.getAs[Long]("corpus_n") < 0),
      s"pq index at $path was left dirty by an interrupted REBUILD — rerun ensure")
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN, baseH, dirty = true, mTxn, mRtxn), Seq("meta_id"),
      assumeKeyUnique = true)
    UpsertStore.delete(spark, path, gone.select("vec_id"), Seq("vec_id"))
    val (dn, dh) = fingerprint(gone)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN - dn, baseH ^ dh, dirty = false, mTxn,
        txnId.getOrElse(mRtxn)),
      Seq("meta_id"), assumeKeyUnique = true)
  }

  /** Register the PQ index under the `graft` catalog (the
    * q99/q100/q106 idiom): build or gate-serve AT the warehouse path,
    * then `<catalog>.<name>` reads the packed codes and
    * `<catalog>.<name>__codebooks` the per-subspace codebooks — an
    * auditor (or the pure-SQL serve, q127) works in plain SQL.
    * Returns the store path. */
  def registerCatalog(spark: SparkSession, name: String, emb: DataFrame,
                      catalog: String = "graft"): String = {
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    ensure(spark, emb, path)
    PairGraph.ensureTable(spark, catalog, name, path, Seq("vec_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__codebooks",
      s"${path}__codebooks", Seq("m", "cid"))
    path
  }

  /** ADC + exact-rerank top-k from the STORED index for corpus-member
    * queries (`queryPred` over vec_id). `emb` supplies the raw vectors
    * for the query side and the ≤ C rerank fetches — the store itself
    * holds only codes + codebooks. Output (query_id, rk, neighbor_id),
    * the q50 contract. */
  def search(spark: SparkSession, emb: DataFrame, path: String,
             queryPred: org.apache.spark.sql.Column, k: Int = 3): DataFrame = {
    val codes = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"no pq index at $path — run ensure first"))
    val cent = UpsertStore.read(spark, s"${path}__codebooks").getOrElse(
      sys.error(s"pq index at $path has no codebook table"))
    val qparts = subParts(unitEmb(emb.filter(queryPred)))
      .select(col("vec_id").as("query_id"), col("m"), col("sub").as("qsub"))
    val pool = adcPool(codes, cent, qparts).drop("pool_rank")
    pool
      .join(emb.select(col("vec_id").as("neighbor_id"), col("emb").as("ce")),
        Seq("neighbor_id"))
      .join(broadcast(emb.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("emb").as("qe"))), Seq("query_id"))
      .withColumn("sim",
        nanvl(VectorFunctions.cosine_similarity(col("qe"), col("ce")), lit(-1.0)))
      .groupBy("query_id")
      .agg(TopKFunctions.top_k_by_score(col("sim"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("neighbor_id"))
      .orderBy("query_id", "rk")
  }

  /** Order-independent fingerprint over (vec_id, emb) — the
    * [[VectorIndex.corpusFingerprint]] rule on the double-cast frame. */
  private[operators] def fingerprint(e: DataFrame): (Long, Long) = {
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(vec_id, emb))"), lit(0L)).as("h"))
      .head()
    (row.getLong(0), row.getLong(1))
  }
}
