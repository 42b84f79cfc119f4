package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfPqIndex
import graft.streaming.UpsertStore

/** RECALL-vs-nProbe sweep at √N cell counts (round 17 — VERDICT r16
  * #8): the 13-of-16 nProbe pin was measured at ONE cell count; a
  * store sized for 10×-100× corpora runs 64-256 cells, and the pin
  * only generalizes if the FRACTION of probed cells needed for
  * recall 1.0 does not grow with the cell count. This probe builds
  * the trained-quantizer IVF-PQ store at a given cell count over the
  * 10× replica's embeddings, computes the EXACT brute-force top-k for
  * a query sample, and reports the minimal nProbe whose probed-cell
  * set contains every true neighbor — the cell-containment criterion,
  * which is exactly the q189 rule's recall condition (probed-cell
  * semi-join + exact re-rank recovers the true top-k iff the true
  * top-k's cells are probed). One pass, no per-nProbe re-search: a
  * neighbor's REQUIRED nProbe is the rank of its cell in the query's
  * probe order, so the sweep is a max over ranks.
  *
  * Usage: `sbt "runMain graft.NProbeSweep <dataDir> <cells> [k] [nq]"`
  * (defaults: /tmp/scale10d, 64, k=10, 50 queries).
  */
object NProbeSweep {

  def run(spark: SparkSession, dir: String, cells: Int, k: Int = 10,
          nQueries: Int = 50): (Int, Double, Seq[Int]) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val path = Scratch.dir("nprobe-sweep") + s"/idx_$cells"
    IvfPqIndex.ensure(spark, emb, path, centroids = cells)

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    // exact brute-force top-k (cosine desc, lower neighbor id on ties
    // — the q50 contract)
    val bf = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", nanvl(
        graft.functions.VectorFunctions.cosine_similarity(col("emb"), col("qe")),
        lit(-1.0)))
      .groupBy("query_id")
      .agg(graft.functions.TopKFunctions.top_k_by_score(
        col("sim"), col("vec_id"), k).as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("neighbor_id"))

    // probe order per query: centroid cosine desc, ties to the higher
    // cell id — the AnnTopKRewrite/IvfPqIndex.search rule
    val cents = UpsertStore.read(spark, s"${path}__centroids").get
      .select(col("centroid_id"), col("cemb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qvecs = queries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) -1.0 else dot / d
    }
    val ranks: Seq[(Long, Long, Int)] = qvecs.toSeq.flatMap { case (qid, q) =>
      cents.map { case (cid, ce) => (cosine(q, ce), cid) }
        .sortBy { case (s, cid) => (-s, -cid) }
        .zipWithIndex.map { case ((_, cid), i) => (qid, cid, i + 1) }
    }
    val rankDf = ranks.toDF("query_id", "cell", "cell_rank")

    val storedCells = UpsertStore.read(spark, path).get
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val needed = bf.join(storedCells, Seq("neighbor_id"))
      .join(broadcast(rankDf), Seq("query_id", "cell"))
      .groupBy("query_id").agg(max("cell_rank").as("need"))
      .select("need").as[Int].collect().sorted.toSeq
    val minFull = needed.max
    (minFull, minFull.toDouble / cells, needed)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10d")
    val cells = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nq = args.lift(3).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-nprobe-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (need, frac, dist) = run(spark, dir, cells, k, nq)
    val p50 = dist(dist.size / 2); val p90 = dist((dist.size * 9) / 10)
    System.err.println(f"[nprobe] cells=$cells k=$k queries=$nq " +
      f"recall1.0_nprobe=$need (${frac * 100}%.1f%% of cells) p50=$p50 p90=$p90")
    println(s"""{"metric":"nprobe_sweep","cells":$cells,"k":$k,"queries":$nq,""" +
      s""""recall1_nprobe":$need,"frac":$frac,"p50":$p50,"p90":$p90}""")
    spark.stop()
  }
}

/** Measured probe-depth distribution of the ADAPTIVE serve (round 18 —
  * VERDICT r17 #8's "done" condition): runs
  * [[graft.operators.IvfPqIndex.searchAdaptive]] over the same store /
  * query sample as [[NProbeSweep]], verifies the adaptive results
  * EQUAL the exact brute-force top-k (the recall gate — the stop bound
  * is provably exact, this confirms it end-to-end), and reports the
  * certified per-query probe-depth distribution next to the
  * [[graft.operators.IvfPqIndex.defaultNProbe]] fraction pin the sweep
  * would otherwise pay for every query.
  *
  * Usage: `sbt "runMain graft.AdaptiveProbeSweep <dataDir> <cells> [k] [nq]"`.
  */
object AdaptiveProbeSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10d")
    val cells = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nq = args.lift(3).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-adaptive-probe-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // `clustered` corpus: 6400 deterministic hash-derived vectors in 64
    // tight (~2°) clusters — the geometry REAL text embeddings have
    // (they concentrate on manifolds) and the case the exact stop
    // bound exists for. The default decorrelated replica is the
    // PESSIMAL near-uniform case, where ~90° cell radii force the
    // certificate to exhaust (correctly: there, the true top-k really
    // can hide in any cell). Cluster size (100) stays under the ADC
    // pool so the PQ code degeneracy tight clusters force (identical
    // codes → tied ADC distances) cannot id-truncate a true neighbor
    // out of the pool — the pool-margin caveat the PqIndex contract
    // measures per corpus.
    val emb = (if (dir == "clustered")
      spark.range(6400).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> " +
          "cast(xxhash64((id % 64) * 131 + j) % 1000 as double) / 1000.0 + " +
          "cast(xxhash64(id * 7919 + j) % 1000 as double) / 20000.0)").as("emb"))
    else Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")))
      .localCheckpoint()
    val path = Scratch.dir("adaptive-sweep") + s"/idx_$cells"
    IvfPqIndex.ensure(spark, emb, path, centroids = cells)
    val pred = col("vec_id") < nq
    val t0 = System.nanoTime()
    val (res, depths) = IvfPqIndex.searchAdaptive(spark, emb, path, pred, k)
    val adaptive = res.as[(Long, Long, Long)].collect().toSet
    val secs = (System.nanoTime() - t0) / 1e9
    // recall gate: exact brute force with the same tie rule
    val queries = emb.filter(pred)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    val exact = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", nanvl(
        graft.functions.VectorFunctions.cosine_similarity(col("emb"), col("qe")),
        lit(-1.0)))
      .groupBy("query_id")
      .agg(graft.functions.TopKFunctions.top_k_by_score(
        col("sim"), col("vec_id"), k).as("tk"))
      .select(col("query_id"), posexplode(col("tk")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rk"),
        col("col.id").as("neighbor_id"))
      .as[(Long, Long, Long)].collect().toSet
    val recallOk = adaptive == exact
    if (!recallOk) {
      System.err.println(s"[adaptive] only-adaptive: ${(adaptive -- exact).toSeq.sorted.take(6)}")
      System.err.println(s"[adaptive] only-exact:    ${(exact -- adaptive).toSeq.sorted.take(6)}")
    }
    val dist = depths.select("depth").as[Long].collect().sorted
    val p50 = dist(dist.length / 2); val p90 = dist((dist.length * 9) / 10)
    val pin = IvfPqIndex.defaultNProbe(cells)
    System.err.println(f"[adaptive] cells=$cells k=$k queries=$nq recall_exact=$recallOk " +
      f"p50=$p50 p90=$p90 max=${dist.last} (pin=$pin) ${secs}%.1f s")
    println(s"""{"metric":"adaptive_probe_sweep","cells":$cells,"k":$k,"queries":$nq,""" +
      s""""recall_exact":$recallOk,"p50":$p50,"p90":$p90,"max":${dist.last},""" +
      s""""fraction_pin":$pin}""")
    spark.stop()
  }
}

/** Depth distribution of the PLAN-TIME adaptive certificate in the
  * transparent ANN rule (round 19 — VERDICT r18 #2): per query, how
  * many cells did [[graft.plans.AnnTopKRewrite]] actually splice —
  * the count-weighted geometric certificate where it certifies, the
  * fraction pin where it does not — and does every accelerated naive
  * plan still equal brute force. The certificate is metadata-only
  * (it cannot see the data-driven k-th-found similarity
  * [[graft.operators.IvfPqIndex.searchAdaptive]] uses), so on
  * near-uniform geometry it is EXPECTED to decline to the pin; the
  * row records what transparent SQL actually pays on each geometry. */
object RuleDepthSweep {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("clustered")
    val cells = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(3)
    val nq = args.lift(3).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-rule-depth-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val emb0 = (if (dir == "clustered")
      spark.range(6400).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 15), j -> " +
          "cast(xxhash64((id % 64) * 131 + j) % 1000 as double) / 1000.0 + " +
          "cast(xxhash64(id * 7919 + j) % 1000 as double) / 20000.0)").as("emb"))
    else Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb")))
    // the rule binds to a parquet LOCATION (the ScanGuard corpus)
    val base = Scratch.dir("rule-depth-sweep")
    val corpusPath = s"$base/emb.parquet"
    emb0.write.mode("overwrite").parquet(corpusPath)
    val emb = spark.read.parquet(corpusPath)
    val path = s"$base/idx_$cells"
    IvfPqIndex.ensure(spark, emb, path, centroids = cells)
    val rule = graft.plans.AnnAcceleration.enable(spark, path, corpusPath)
    try {
      val qs = emb.filter(col("vec_id") < nq)
        .select("vec_id", "emb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      var mismatches = 0
      val t0 = System.nanoTime()
      qs.foreach { case (qid, qv) =>
        val naive = emb.filter(col("vec_id") =!= qid)
          .withColumn("sim", nanvl(graft.functions.VectorFunctions
            .cosine_similarity(col("emb"), typedLit(qv.toSeq)), lit(-1.0)))
          .orderBy(col("sim").desc, col("vec_id"))
          .limit(k).select("vec_id")
        val accel = naive.as[Long].collect().toSeq
        val opt = naive.queryExecution.optimizedPlan.toString
        require(opt.contains("__ann_cand_vec_id"),
          s"rule did not fire for query $qid")
        // brute force via the aggregate (no rule: different plan shape)
        val brute = emb.filter(col("vec_id") =!= qid)
          .withColumn("sim", nanvl(graft.functions.VectorFunctions
            .cosine_similarity(col("emb"), typedLit(qv.toSeq)), lit(-1.0)))
          .groupBy().agg(graft.functions.TopKFunctions
            .top_k_by_score(col("sim"), col("vec_id"), k).as("tk"))
          .select(explode(expr("transform(tk, x -> x.id)")))
          .as[Long].collect().toSeq
        if (accel != brute) mismatches += 1
      }
      val secs = (System.nanoTime() - t0) / 1e9
      import scala.jdk.CollectionConverters._
      val dist = rule.probeDepths.asScala.map(_._1).toArray.sorted
      val pin = IvfPqIndex.defaultNProbe(cells)
      val p50 = dist(dist.length / 2); val p90 = dist((dist.length * 9) / 10)
      val certified = dist.count(_ < pin)
      System.err.println(f"[rule-depth] corpus=$dir cells=$cells k=$k queries=${qs.length} " +
        f"mismatches=$mismatches p50=$p50 p90=$p90 max=${dist.last} pin=$pin " +
        f"certified_below_pin=$certified ${secs}%.1f s")
      println(s"""{"metric":"rule_depth_sweep","corpus":"$dir","cells":$cells,"k":$k,""" +
        s""""queries":${qs.length},"mismatches":$mismatches,"p50":$p50,"p90":$p90,""" +
        s""""max":${dist.last},"fraction_pin":$pin,"certified_below_pin":$certified}""")
    } finally graft.plans.AnnAcceleration.disable(spark, rule)
    spark.stop()
  }
}
