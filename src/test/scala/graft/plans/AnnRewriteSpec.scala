package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.functions.VectorFunctions
import graft.operators.IvfPqIndex

/** The transparent ANN-acceleration optimizer rule
  * ([[AnnTopKRewrite]], q189 — VERDICT r15 #1): the naive
  * `ORDER BY cosine_similarity(embedding, <literal>) DESC LIMIT k`
  * plan gains a probed-cell LEFT-SEMI join against the IVF-PQ store
  * with the sort+limit (the exact re-rank) untouched. Pinned: result
  * identity with the rule on vs off, the semi-join + real cell prune
  * in the optimized plan, the SQL spelling, every narrowing guard
  * (no limit, ascending, column-valued query, dimension mismatch,
  * k > maxK, foreign relation), freshness snapshot, clean disable. */
class AnnRewriteSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // two well-separated clusters in R^8 (PQ needs dim divisible by M=8):
  // cluster A hugs e1, cluster B hugs e2 — with 4 coarse cells the
  // quadrant structure keeps each query's true neighbors in its own
  // probed cells even at nProbe = 2
  private def vec(axis: Int, i: Int): Seq[Double] = {
    val eps = 0.01 * (i % 7)
    (0 until 8).map(j => if (j == axis) 1.0 else if (j == (axis + 4)) eps else 0.0)
  }

  private lazy val env = {
    val dir = java.nio.file.Files.createTempDirectory("graft-annrw").toString
    val rows = (0L until 20L).map(i => (i, vec(0, i.toInt))) ++
      (20L until 40L).map(i => (i, vec(1, i.toInt)))
    rows.toDF("vec_id", "emb").write.parquet(s"$dir/emb.parquet")
    IvfPqIndex.ensure(spark, spark.read.parquet(s"$dir/emb.parquet"),
      s"$dir/idx", centroids = 4)
    Seq((99L, vec(0, 0))).toDF("vec_id", "emb")
      .write.parquet(s"$dir/other.parquet")
    dir
  }

  private def corpus = spark.read.parquet(s"$env/emb.parquet")

  private val q0: Seq[Double] = vec(0, 3)

  private def naive(k: Int = 3, q: Seq[Double] = q0) = corpus
    .withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
      col("emb"), typedLit(q)), lit(-1.0)))
    .orderBy(col("sim").desc, col("vec_id"))
    .limit(k)
    .select("vec_id")

  private def withRule[A](nProbe: Int = 4, maxK: Int = 1000)(f: => A): A = {
    val r = AnnAcceleration.enable(spark, s"$env/idx", s"$env/emb.parquet",
      nProbe = nProbe, maxK = maxK)
    try f finally AnnAcceleration.disable(spark, r)
  }

  test("rewrite fires: probed-cell semi-join in the plan, results identical") {
    val plain = naive().as[Long].collect().toSeq
    withRule() {
      val accel = naive()
      val opt = accel.queryExecution.optimizedPlan.toString
      assert(opt.contains("LeftSemi") && opt.contains("__ann_cand_vec_id"),
        s"rule did not splice the candidate semi-join:\n$opt")
      assert(accel.as[Long].collect().toSeq == plain,
        "accelerated top-k diverged from the naive scan")
    }
    // and with a REAL prune (2 of 4 cells) the clustered corpus still
    // agrees — the recall contract the oracle gate rests on
    withRule(nProbe = 2) {
      val accel = naive()
      assert(accel.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"))
      assert(accel.as[Long].collect().toSeq == plain,
        "nProbe=2 pruned away a true neighbor on the clustered corpus")
    }
  }

  test("the SQL spelling rewrites too (folded array literal)") {
    graft.GraftFunctions.register(spark)
    corpus.createOrReplaceTempView("annrw_emb")
    withRule() {
      val arr = q0.mkString("array(", "D, ", "D)")
      val viaSql = spark.sql(
        s"""SELECT vec_id FROM annrw_emb
           |ORDER BY cosine_similarity(emb, $arr) DESC, vec_id LIMIT 3""".stripMargin)
      assert(viaSql.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"),
        s"SQL ORDER BY cosine LIMIT did not rewrite:\n${viaSql.queryExecution.optimizedPlan}")
      assert(viaSql.as[Long].collect().toSeq == naive().as[Long].collect().toSeq)
    }
  }

  test("round 19 (VERDICT r18 #2): certified shallow depth where geometry allows, fraction pin where it doesn't") {
    import scala.jdk.CollectionConverters._
    val plain = naive().as[Long].collect().toSeq
    val r = AnnAcceleration.enable(spark, s"$env/idx", s"$env/emb.parquet")
    try {
      // clustered geometry, k=3: the count-weighted certificate must
      // probe FEWER than the pin (defaultNProbe(4) = 4 = exhaustive)
      // with the result still ≡ the plain scan
      r.probeDepths.clear()
      val accel = naive()
      assert(accel.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"))
      assert(accel.as[Long].collect().toSeq == plain,
        "certified-depth serve diverged from the naive scan")
      val ds = r.probeDepths.asScala.toSeq
      assert(ds.nonEmpty && ds.forall(_._1 < 4),
        s"expected a certified depth < the pin (4 of 4 cells), got $ds")
      // k beyond what shallow prefixes can GUARANTEE: the certificate
      // declines and the measured fraction pin serves unchanged
      r.probeDepths.clear()
      val plainBig = naive(k = 25).as[Long].collect().toSeq
      val big = naive(k = 25)
      assert(big.as[Long].collect().toSeq == plainBig)
      val dsBig = r.probeDepths.asScala.toSeq
      assert(dsBig.nonEmpty && dsBig.forall(_._1 == 4),
        s"uncertifiable k must fall back to the pin depth, got $dsBig")
    } finally AnnAcceleration.disable(spark, r)
  }

  test("guards: no limit / ascending / column query / dim mismatch / k>maxK / foreign relation") {
    withRule(maxK = 10) {
      def marker(df: org.apache.spark.sql.DataFrame): Boolean =
        df.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id")

      val noLimit = corpus.withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
        col("emb"), typedLit(q0)), lit(-1.0))).orderBy(col("sim").desc)
      assert(!marker(noLimit.select("vec_id")),
        "a sort without a limit is not top-k — pruning it drops rows")

      val asc = corpus.withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
        col("emb"), typedLit(q0)), lit(-1.0)))
        .orderBy(col("sim").asc, col("vec_id")).limit(3).select("vec_id")
      assert(!marker(asc), "ascending = FARTHEST-k; nearest cells are the wrong prune")

      val colQ = corpus.withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
        col("emb"), col("emb")), lit(-1.0)))
        .orderBy(col("sim").desc, col("vec_id")).limit(3).select("vec_id")
      assert(!marker(colQ), "column-valued query vector has no driver-known cells")

      val badDim = corpus.withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
        col("emb"), typedLit(Seq(1.0, 0.0))), lit(-1.0)))
        .orderBy(col("sim").desc, col("vec_id")).limit(3).select("vec_id")
      assert(!marker(badDim), "dimension-mismatched literal must not probe cells")

      val bigK = naive(k = 11)
      assert(!marker(bigK), "k above maxK must fall back to the full scan")
      assert(marker(naive(k = 10)), "k at maxK should still rewrite")

      val foreign = spark.read.parquet(s"$env/other.parquet")
        .withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
          col("emb"), typedLit(q0)), lit(-1.0)))
        .orderBy(col("sim").desc, col("vec_id")).limit(3).select("vec_id")
      assert(!marker(foreign), "rule pruned a relation the index never saw")
      assert(foreign.as[Long].collect().toSeq == Seq(99L))
    }
  }

  test("filtered ANN: arbitrary predicates decline; the gated self-exclusion shape fires") {
    def marker(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id")
    def filtered = corpus.filter(col("vec_id") >= 20)
      .withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
        col("emb"), typedLit(q0)), lit(-1.0)))
      .orderBy(col("sim").desc, col("vec_id")).limit(3).select("vec_id")
    def selfEx = corpus.filter(col("vec_id") =!= 3L)
      .withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
        col("emb"), typedLit(q0)), lit(-1.0)))
      .orderBy(col("sim").desc, col("vec_id")).limit(3).select("vec_id")
    val filteredPlain = filtered.as[Long].collect().toSeq
    val selfExPlain = selfEx.as[Long].collect().toSeq

    withRule(nProbe = 2) {
      // an arbitrary filter changes WHICH vectors compete for the
      // top-k: with q0 in cluster A and the filter keeping only
      // cluster B, the filtered top-k lives in cells the query vector
      // does NOT probe at nProbe=2 — the unfiltered recall-1.0
      // measurement does not transfer, so the rule must decline
      assert(!marker(filtered),
        "rule fired on a filter shape the recall gate never measured")
      assert(filtered.as[Long].collect().toSeq == filteredPlain,
        "declined plan must answer exactly as the plain filtered scan")

      // the SELF-EXCLUSION shape (vec_id != literal — q189/q50's own
      // filter, which the oracle gate measures recall WITH) still
      // accelerates, and agrees with the plain plan
      assert(marker(selfEx), "self-exclusion filter must still rewrite")
      assert(selfEx.as[Long].collect().toSeq == selfExPlain,
        "accelerated self-exclusion top-k diverged from the plain plan")
    }
  }

  test("freshness: a corpus appended after enable stops the rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-annrw-fresh").toString
    (0L until 16L).map(i => (i, vec(0, i.toInt))).toDF("vec_id", "emb")
      .write.parquet(s"$dir/emb.parquet")
    IvfPqIndex.ensure(spark, spark.read.parquet(s"$dir/emb.parquet"),
      s"$dir/idx", centroids = 2)
    val r = AnnAcceleration.enable(spark, s"$dir/idx", s"$dir/emb.parquet")
    try {
      def scan = spark.read.parquet(s"$dir/emb.parquet")
        .withColumn("sim", nanvl(VectorFunctions.cosine_similarity(
          col("emb"), typedLit(q0)), lit(-1.0)))
        .orderBy(col("sim").desc, col("vec_id")).limit(3).select("vec_id")
      assert(scan.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"),
        "rule should fire on the snapshotted corpus")
      // parallel to the query vector → must enter the true top-3
      Seq((77L, vec(0, 3))).toDF("vec_id", "emb")
        .write.mode("append").parquet(s"$dir/emb.parquet")
      val after = scan
      assert(!after.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"),
        "rule fired on a corpus that grew after the enable-time snapshot")
      assert(after.as[Long].collect().contains(77L),
        "appended vector lost — stale-index acceleration")
    } finally AnnAcceleration.disable(spark, r)
  }

  test("disable restores the plain plan; registerCatalog auto-installs") {
    val plainAfter = naive()
    assert(!plainAfter.queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"),
      "no rule installed — plan must be plain")

    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    val store = IvfPqIndex.registerCatalog(spark, "annrw_auto_idx", corpus, centroids = 4)
    try {
      assert(naive().queryExecution.optimizedPlan.toString.contains("__ann_cand_vec_id"),
        "registerCatalog did not install transparent ANN acceleration")
      assert(naive().as[Long].collect().toSeq ==
        plainAfter.as[Long].collect().toSeq)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot {
        case rr: AnnTopKRewrite => rr.storePath == store
        case _ => false
      }
  }
}
