package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicates a scale-factor directory K× with
  * key-offsetting (unique keys stay unique; text/embedding content
  * repeats — realistic duplicate clusters for the dedup operators) and
  * times headline queries at 1× vs K×. A plan whose runtime grows
  * ≫ K× has a nonlinearity that would bite harder at 100 TB.
  *
  * Usage: `sbt "runMain graft.ScaleProbe <sfDir> <K> <workDir>"`
  * (K=0 reuses an already-replicated workDir — measure in a clean JVM
  * unpolluted by the replicate job's GC/page-cache pressure).
  */
object ScaleProbe {
  // per-table key columns to offset so replicas don't collide
  private val offsetCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq.empty, // all lineitem keys are FKs (+ int linenumber)
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  // foreign keys must shift with their referenced table's key space
  private val fkCols: Map[String, Seq[(String, String)]] = Map(
    "orders" -> Seq("o_custkey" -> "customer"),
    // l_orderkey must shift by the ORDERS key span, not lineitem's own
    // max — the two coincide in today's data only by accident (orders
    // without lineitems would silently desync replica FKs otherwise)
    "lineitem" -> Seq("l_orderkey" -> "orders", "l_partkey" -> "part",
      "l_suppkey" -> "supplier"))

  private def spanOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c).cast("long"))).head().getLong(0) + 1L

  /** Per-replica bijective char rotation over [a-z0-9] for
    * `documents.text` (on `SPARK_GRAFT_SCALE_DECORRELATE=1`): a
    * bijection preserves token lengths, token boundaries,
    * within-replica equality/near-dup structure, and edit distances
    * EXACTLY, while making cross-replica shingles disjoint — the
    * NON-dup-dense replica (VERDICT r12 #5). The default key-offset
    * replica keeps text identical across replicas, so every near-dup
    * cluster of size c becomes size K·c and pair/verify terms grow K²
    * per cluster; the decorrelated replica keeps duplicate DENSITY
    * constant (K independent copies of the corpus's own cluster
    * structure), which is what a genuinely larger crawl looks like. */
  private[graft] val rotSrc = "abcdefghijklmnopqrstuvwxyz0123456789"
  private[graft] def rotDst(i: Int): String = {
    val r = i % rotSrc.length
    rotSrc.drop(r) + rotSrc.take(r)
  }

  def replicate(spark: SparkSession, srcDir: String, k: Int, outDir: String): Unit = {
    val decorrelate = sys.env.get("SPARK_GRAFT_SCALE_DECORRELATE").contains("1")
    Tables.all.foreach { t =>
      val base = Tables.load(spark, srcDir, t)
      val out =
        if (!offsetCols.contains(t)) base // region/nation: shared dims
        else {
          // only LongType keys are offset (int keys would overflow /
          // lose FK alignment); skipped columns are reported
          val candidates = (offsetCols(t) ++ fkCols.getOrElse(t, Seq.empty).map(_._1)).distinct
          val keySpans = candidates.filter { c =>
            val ok = base.schema(c).dataType == org.apache.spark.sql.types.LongType
            if (!ok) System.err.println(s"[scale] WARN: not offsetting non-long key $t.$c")
            ok
          }
          val spans: Map[String, Long] = keySpans.map {
            case c if fkCols.getOrElse(t, Seq.empty).exists(_._1 == c) =>
              val ref = fkCols(t).find(_._1 == c).get._2
              c -> spanOf(Tables.load(spark, srcDir, ref),
                offsetCols(ref).head)
            case c => c -> spanOf(base, c)
          }.toMap
          (0 until k).map { i =>
            val shifted = spans.foldLeft(base) { case (df, (c, span)) =>
              df.withColumn(c, col(c) + lit(i.toLong * span))
            }
            if (decorrelate && t == "documents")
              shifted.withColumn("text", translate(col("text"), rotSrc, rotDst(i)))
            else shifted
          }.reduce(_ unionByName _)
        }
      out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
  }

  private val headline = Seq(
    "q01_pricing_summary", "q04_revenue_by_region", "q08_customer_running_total",
    "q30_asof_last_signup", "q45_dedup_exact", "q46_dedup_ngram_jaccard",
    "q47_dedup_minhash", "q48_dedup_simhash", "q56_neardup_pipeline",
    "q50_ann_bruteforce", "q55_ann_ivf", "q61_contamination_check",
    "q76_partitioned_dpp", "q80_prep_pipeline", "q81_salted_join",
    "q83_zorder_scan", "q86_trailing_window",
    // round 6: the de-stratified prefix-aggregate plans (range-
    // repartition + broadcast offsets), cluster propagation, the
    // removal-plan composition, and the skew-safe bucketed as-of
    "q33_percentiles", "q60_token_packing", "q89_dedup_clusters",
    "q90_intra_doc_repetition", "q91_dedup_removal_plan", "q92_asof_bucketed",
    // round 7: the materialized-index serve paths (warm-up builds the
    // store; timed runs measure the gated serve) and the change-feed
    // consumer fold
    "q96_ann_index_store", "q97_ann_index_incremental", "q98_upsert_changefeed",
    // round 8: the retrieval layer — BM25's posting-pruned scoring and
    // the rank-join RRF fusion must both grow with matched postings,
    // never with corpus × queries
    "q101_bm25_topk", "q102_hybrid_rrf", "q103_semantic_dedup",
    // round 11: the stored postings index — gated serve (q104, store
    // warm from the warm-up run) and the build+extend+serve lifecycle
    // (q105, fresh store per run); both must grow with postings and
    // delta size, never corpus × queries
    "q104_bm25_index_serve", "q105_bm25_index_incremental",
    // the stored-hybrid fusion: both stores warm after the warm-up
    // run, so the timed runs measure the pure two-sided gated serve
    "q107_hybrid_stored_rrf",
    // round-11 late adds: contamination probe from the stored gram
    // index (train side warm via the gate) and frame-level dedup
    // (the one corpus-sized digest shuffle must scale linearly)
    "q108_contamination_indexed", "q110_frame_dedup",
    // round-11 continuation: duplicate spans (one hashed-window groupBy
    // + per-doc interval merge), the bloom-pruned contamination scan
    // (train-side exchange must track EVAL size, so its ratio should
    // sit well under the replication factor), the dedup ingest gate
    // (store traffic ≈ duplicates), and the PQ serves (ADC over
    // 8-byte codes; stored path gated after warm-up)
    "q117_duplicate_spans", "q118_contamination_bloom",
    "q121_dedup_ingest_gate", "q119_ann_pq", "q122_ann_pq_stored",
    // round-11 close: the sketch pass + its stored lifecycle (fixed
    // store cost + one-pass data terms), funnel (3 conditional aggs),
    // the bloom star join (fact-side exchange ∝ dim selectivity),
    // graph ops (wedge closure / per-iteration joins are edge-sized),
    // two-stage rerank (stage-2 cost is candidate-bounded), drift and
    // outlier flags (one-two corpus passes, single-row broadcasts)
    "q120_quantile_sketch", "q133_quantile_sketch_stored", "q124_funnel",
    "q125_bloom_star_join", "q128_triangle_count", "q129_pagerank",
    "q130_rerank_pipeline", "q131_token_drift", "q132_embedding_outliers",
    // analytics pack: the spine/grid terms (q134) and day-level pair
    // terms (q136) are metadata-sized, so their ratios should sit far
    // under the replication factor; the window plans (q135/q137) and
    // the tokenize+tf pass (q139) are one-shuffle linear; the sorted-
    // neighborhood join (q140) is n·W candidates — linear, not the
    // quadratic blocked self-join it replaced
    "q134_gapfill_resample", "q135_rolling_zscore", "q136_active_users",
    "q137_attribution", "q138_regression_by_group", "q139_tfidf_keywords",
    "q140_fuzzy_sorted_neighborhood", "q141_weighted_sample",
    // second analytics wave: the basket self-join must grow with
    // orders × order-size² (never parts²); the IVM extend's store
    // traffic is delta-keyed; entropy/NLL are tokenize-pass linear
    "q142_market_basket", "q143_session_conversion", "q144_interevent_gaps",
    "q145_token_entropy", "q146_bigram_nll", "q147_rollup_ivm",
    // round 12: the HLL WAU swap must stay day-sketch-sized (q148) and
    // the stores metadata-sized (q151/q153); the index-served TF-IDF
    // (q149) pays the store build once then joins postings ∝ data; the
    // full-text verify (q150) is candidate-bounded; the stratified
    // sample (q152) is heap-bounded per group
    "q148_hll_wau", "q149_tfidf_index_serve", "q150_fuzzy_full_verify",
    "q151_hll_distinct_store", "q152_stratified_sample", "q153_hll_window_serve",
    // the cluster split adds one label join to the cluster pipeline;
    // the EWMA is one type-keyed window pass over day-grain rows; the
    // manifest composes digest-groupBy + quality scan + gated cluster
    // read + doc-keyed joins — each term priced by its standalone query
    "q154_cluster_split", "q155_daily_ewma", "q156_training_manifest",
    "q157_temperature_mix",
    // round 13/14: the streaming manifest lifecycle (fresh stores per
    // run; per-batch work must stay batch + affected-cluster sized, so
    // the 10× ratio prices the data terms on top of the fixed commit
    // tax), the catalog contamination SQL serve, the version-pinned
    // catalog read, and the embed-then-serve seam (one map-side encode
    // pass + the q50 scan — expect ~linear)
    "q159_manifest_maintain", "q160_catalog_contamination_sql",
    "q161_time_travel_sql", "q162_asset_embeddings",
    // round 14: the tokenizer-induction pair (census + trainer loop are
    // vocab-sized — replicated docs do NOT grow the vocab, so the work
    // that should grow is the corpus-side token fold and the q168
    // corpus×vocab join), the DSIR scorers (one conditional vocab
    // aggregate + corpus×vocab join, one-shot and maintained), and the
    // heavy-hitter pair (k-bounded sketch rows per partition; the exact
    // census readout is the part that scales with data)
    "q164_bpe_pair_step", "q165_dsir_select", "q166_dsir_maintain",
    "q167_bpe_train_merges", "q168_bpe_fertility",
    "q169_heavy_hitters", "q170_heavy_hitters_maintain",
    // the theta family: sketch folds are k-bounded per group (the
    // ratio prices the exact oracle side — distinct joins, linear);
    // the prefix join ships (1−t)·n shingles and is output-bounded
    // after that; the trigram serve reads K posting lists + verify
    "q171_theta_overlap", "q172_theta_retention_maintain",
    "q173_setsim_prefix_join", "q174_trigram_substring_serve",
    "q175_catalog_theta_sql",
    // the simhash index pair: build is one fingerprint pass + the
    // distinct-fp chunk explode; serve cost is bucket-matched postings
    // + Hamming-surviving pairs (both candidate-sized, but the bucket
    // join's fan-in grows with corpus density — the ratio to watch)
    "q176_simhash_index_serve", "q177_simhash_maintain",
    // top-gram coverage: tokenize + 3-way explode + two aggs — linear
    "q178_topgram_coverage",
    // round 15: the catalog SQL serves re-plan their Column-API twins
    // by table name (expect the q174/q176 shapes + the store build);
    // the regex serve adds the unprunable-pattern full scan (linear by
    // declaration) on top of K posting-list reads; the composed IVF-PQ
    // lifecycle is assign+train+encode linear, serve candidate-bounded;
    // the scorer seam is one map pass (expect ~linear); the maintained
    // trigram serve re-prices q174 through two extends
    "q179_catalog_trigram_sql", "q180_catalog_simhash_sql",
    "q181_trigram_regex_serve", "q182_ann_ivfpq", "q183_doc_scorer",
    "q184_trigram_maintain",
    // the scored manifest composes q156's stages with the scorer's one
    // extra map pass — expect q156's ratio
    "q185_manifest_scored",
    // the composed-store SQL serve and its maintainer re-price q182's
    // build+serve by table name / through the batch lifecycle
    "q186_catalog_ivfpq_sql", "q187_ivfpq_maintain",
    // the optimizer-rule serve: index build (linear) + three rewritten
    // naive filters (posting-bounded candidates + candidate verify)
    "q188_trigram_accel_rule",
    // round 16: the ANN-rule serve is the composed-store build (the
    // linear term) + five REWRITTEN naive top-k plans (probed-cell
    // semi-join + exact re-rank, candidate-bounded); the crawl-day
    // composition is the sum of its stages' standing shapes — the only
    // inter-stage edge is the keep-fraction-sized manifest semi-join
    "q189_ann_accel_rule", "q190_crawl_day",
    // the positional phrase family: build is one tokenize + keyed
    // groupBy (linear); serve reads matched postings only and the
    // start-vote shuffle is Σ-matched-tf-sized — the ratio prices the
    // build plus the probes' posting growth
    "q191_phrase_search", "q192_phrase_maintain", "q193_catalog_phrase_sql",
    // the join-view IVM lifecycle: bootstrap join (linear) + two
    // delta-keyed ingest joins — the ratio prices the base join, the
    // delta paths stay delta-sized
    "q194_join_view_ivm",
    // proximity from the positional store: build linear; the window
    // check is per-(query, doc) over tf-bounded position arrays
    "q195_proximity_search",
    // the join-view catalog serve: gate-served after warm-up (the
    // q186 shape) — the ratio prices the ledger-skipped ingest checks
    // + the view read
    "q196_catalog_join_view_sql",
    // round 17: the OR-disjunction accelerated scan (candidate union,
    // branch-summed df bound), the 3-way star view (ΔV on all three
    // sides), and the takedown-day composition (curation retract +
    // kept-diff index retract/extend + five store serves)
    "q197_trigram_or_rule", "q198_star_view_ivm", "q199_takedown_day",
    // round 18: the contamination takedown (pair-stage source select +
    // blast-radius gram retract + post-retraction probe — retraction
    // work ∝ the gone docs' posting lists), the view-family takedown
    // (keyed deletes sized by takedown set + fan-out), and the
    // adaptive-probe ANN serve (per-query certified depths; the
    // doubling rounds re-run the probed-cell serve, so the ratio
    // prices candidates-at-certified-depth, never corpus × queries)
    "q200_contamination_takedown", "q201_view_takedown",
    "q202_ann_adaptive_probe",
    // round 19: the external-query ANN serve — the adaptive serve
    // shape with caller-supplied vectors; the query batch is fixed,
    // so the ratio prices the sample-sized build + certified-depth
    // serve terms exactly like q202 — and the k=10 serve the
    // tie-closed pool made contractual
    "q203_ann_external_queries", "q204_ann_topk10")

  /** Median of 3 timed runs after one warm-up (single runs are
    * FS-cache noisy — same reason Bench B3 reports a median). */
  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    val runs = Seq.fill(3) {
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted
    runs(1)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, kStr, workDir) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // probe-scale scan sizing: the whole replicated corpus is a few
      // MB; with the default 128 MB partitions + 4 MB per-file open
      // cost a whole-table scan coalesces to 1-3 input partitions, so
      // pre-shuffle per-row stages (q80's normalize/metrics) measure
      // core starvation instead of the operator — q80's 10× ratio read
      // 8-9 from this alone. 128 KB partitions make scan parallelism
      // track row counts at BOTH probe sizes (the property a real
      // cluster gets from file splits at 128 MB); biggest probe table
      // is ~100 MB ⇒ ~800 scan tasks, still negligible overhead.
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (4 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (k > 0) {
      System.err.println(s"[scale] replicating $srcDir x$k -> $workDir")
      replicate(spark, srcDir, k, workDir)
    } else System.err.println(s"[scale] k=0: reusing existing $workDir")

    // targeted probe (SCALING.md noise protocol, same shape as Bench's
    // SPARK_GRAFT_BENCH_ONLY): comma list restricts the timed set
    val probeSet = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .fold(headline) { names =>
        // a typo'd name must not silently shrink the probe to nothing
        val unknown = names -- headline.toSet
        if (unknown.nonEmpty) System.err.println(
          s"[scale] WARNING: SPARK_GRAFT_PROBE_ONLY names not in the headline set " +
            s"(ignored): ${unknown.toSeq.sorted.mkString(", ")}")
        headline.filter(names)
      }

    val rows = probeSet.map { q =>
      val t1 = time(spark, q, srcDir)
      val tk = time(spark, q, workDir)
      val ratio = tk / t1
      System.err.println(f"[scale] $q%-28s 1x=${t1}%6.2fs ${k}x=${tk}%7.2fs ratio=${ratio}%5.1f")
      s""""$q":{"t1":$t1,"tk":$tk,"ratio":$ratio}"""
    }
    println(s"""{"metric":"scale_probe","k":$k,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
