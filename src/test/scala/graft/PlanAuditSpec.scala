package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-inventory physical-plan audit (VERDICT r1 item 9): every
  * declared query is materialized at sf0.001 (so AQE settles on its
  * final plan) and checked against the scale anti-patterns:
  *
  *  - `CartesianProduct` — never acceptable; an unconstrained
  *    fact×fact product is the one plan shape that cannot survive a
  *    100× scale-up under any partitioning.
  *  - `BroadcastNestedLoopJoin` — acceptable ONLY where the broadcast
  *    side is small by construction and the predicate is genuinely
  *    non-equi: the band join (q18), and the ANN queries that
  *    broadcast a fixed query set / centroid table (q50, q55).
  *  - missing `WholeStageCodegen` — every query's hot path must stay
  *    inside codegen; the one exception is a plan AQE collapses to an
  *    empty LocalTableScan (q06's anti-join result is empty at this
  *    SF, so there is nothing left to compile).
  *
  * An allowlist entry here is a DECLARATION, not a waiver — a new
  * query that trips a flag fails this spec until it is either re-planned
  * or argued onto the list.
  */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001

  private val mayUseBroadcastNL = Set(
    "q18_price_band_join",   // non-equi band predicate; 3-row broadcast side
    "q50_ann_bruteforce",    // broadcast 5-query set vs corpus (declared exact baseline)
    "q52_embedding_neardup", // adaptive dense branch: measured candidate rate ≈ 1 ⇒
                             // banding can't prune, pair verify IS the work (Similarity.scala)
    "q55_ann_ivf",           // broadcast 16-centroid table (index build + probe)
    "q96_ann_index_store",   // broadcast 16-centroid table (probe side; cells are stored)
    "q97_ann_index_incremental", // same centroid broadcast via the serve path
    "q100_catalog_ann_sql",  // same 16-centroid broadcast, hinted in SQL (catalog
                             // tables carry no stats, so the hint replaces the
                             // size-estimate that picks BNLJ in the q96 twin
    "q101_bm25_topk",        // broadcast single-row corpus-stats (N, avgdl) join —
                             // the scalar fan-out every scorer needs
    "q102_hybrid_rrf",       // same stats row + q50's broadcast 3-query dense side
    "q103_semantic_dedup",   // q55's broadcast 16-centroid assignment pass
    "q106_catalog_bm25_sql", // q101's single-row stats cross join, written in SQL
                             // over the catalog stats table (hinted broadcast)
    "q107_hybrid_stored_rrf", // q96's broadcast 16-centroid probe on the dense side
    "q111_kmeans_step",      // broadcast 8-row centroid table vs corpus (Lloyd assignment)
    "q112_cluster_balanced_sample", // same centroid broadcast via the shared assignment
    "q115_kmeans_iterate",   // per-iteration 8-row centroid broadcast (Lloyd loop)
    "q116_unigram_nll",      // q101's single-row corpus-total cross join
    "q130_rerank_pipeline",  // stage-1 BM25 = q101's single-row stats cross join
    "q132_embedding_outliers", // single-row centroid + single-row moments broadcasts
    "q134_gapfill_resample", // types × hour-spine grid: both sides derived from
                             // aggregates (5 rows × hours) — metadata-sized at any SF
    "q139_tfidf_keywords",   // single-row corpus-N cross join (q101's stats idiom)
    "q142_market_basket",    // single-row n_orders cross join (lift denominator)
    "q146_bigram_nll",       // single-row vocab-size cross join (smoothing denominator)
    "q157_temperature_mix",  // single-row mixture-total cross join (share denominators)
    "q162_asset_embeddings", // q50's declared-exact shape over PRODUCED embeddings:
                             // broadcast 5-query set vs corpus; the stored-index
                             // serve path (VectorIndex.searchStored) is proven
                             // identical by MultimodalEmbedSpec
    "q163_asset_embed_maintain", // q96's broadcast 4-centroid probe via the
                                 // maintained-index serve (searchMembers)
    "q165_dsir_select",          // q116's single-row smoothing-totals cross join
                                 // (nr/nt/v denominators for both unigram models)
    "q166_dsir_maintain",        // the same totals cross join, priced off the
                                 // maintained count store (DsirMaintainer.serve)
    "q169_heavy_hitters",        // single-row token-total cross join (the
                                 // N/(k+1) bound denominator)
    "q171_theta_overlap",        // four single-row sketch/count aggregates
                                 // cross-joined into one measure row — every
                                 // BNLJ side is exactly one row at any SF
    "q182_ann_ivfpq",            // q96's broadcast 16-centroid coarse probe
                                 // (query side only; cells+codes are stored)
    "q186_catalog_ivfpq_sql",    // the same 16-centroid probe, hinted in SQL
                                 // (catalog tables carry no stats — the q100
                                 // rationale applied to the composed index)
    "q187_ivfpq_maintain")       // q182's centroid broadcast via the
                                 // maintained-store serve

  private val mayLackCodegen = Set(
    "q06_customers_without_orders", // empty result → AQE empty-relation propagation
    "q63_token_cms") // result is a driver-assembled sketch readout (LocalTableScan)

  test("q60/q80/q33 window parallelism is not stratum-bounded (range-repartition plan holds)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.window.WindowExec
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
      case q: QueryStageExec => deep(q.plan)
      case other => other.children.flatMap(deep)
    })
    val strata = Set("lang", "split", "l_returnflag")
    for (name <- Seq("q60_token_packing", "q80_prep_pipeline", "q33_percentiles")) {
      val df = SparkEntry.allQueries.find(_.name == name).get.fn(spark, sf)
      df.collect()
      val windows = deep(df.queryExecution.executedPlan).collect { case w: WindowExec => w }
      // a data-sized window partitioned ONLY by stratum columns runs one
      // task per stratum — the scale killer. The metadata-sized offset
      // window (one row per partition) is recognizable by its __pid
      // ordering and exempt.
      val bad = windows.filter { w =>
        val parts = w.partitionSpec.flatMap(_.references.toSeq.map(_.name)).toSet
        val order = w.orderSpec.flatMap(_.references.toSeq.map(_.name)).toSet
        parts.nonEmpty && parts.forall(strata.contains) && !order.exists(_.startsWith("__pid"))
      }
      assert(bad.isEmpty,
        s"$name still plans a stratum-partitioned data window: " +
          bad.map(w => w.partitionSpec.mkString(",")).mkString("; "))
    }
  }

  test("no declared query plans a CartesianProduct; BNLJ and codegen per allowlist") {
    val failures = SparkEntry.allQueries.flatMap { q =>
      val df = q.fn(spark, sf)
      df.collect() // settle AQE on the final adaptive plan
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val simple = df.queryExecution.executedPlan.toString
      val problems = Seq(
        Option.when(formatted.contains("CartesianProduct"))("CartesianProduct"),
        Option.when(formatted.contains("BroadcastNestedLoopJoin") &&
          !mayUseBroadcastNL(q.name))("unexpected BroadcastNestedLoopJoin"),
        Option.when(!simple.contains("*(") && !mayLackCodegen(q.name))(
          "no WholeStageCodegen span")).flatten
      if (problems.isEmpty) Nil else List(s"${q.name}: ${problems.mkString(", ")}")
    }
    assert(failures.isEmpty, s"plan audit failures:\n${failures.mkString("\n")}")
  }
}
