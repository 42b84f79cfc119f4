package graft

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** 100× dedup-family probe (VERDICT r6 #5): verifies the claimed bound
  * that the MinHash banding funnel stays OUTPUT-sized — candidate pairs
  * ∝ true near-dup pairs — as k-fold replication drives the duplicate-
  * cluster term quadratically (every doc gains k exact copies ⇒ true
  * pairs grow ~C(k,2)·n). A plan defect (banding degenerating toward
  * all-pairs) would show as candidates growing FASTER than true pairs;
  * the healthy signature is a flat candidates/true-pairs ratio with
  * pre-distinct rows bounded by bands × true pairs.
  *
  * Replicates ONLY `documents` (the sole input of the dedup family), so
  * k=100 stays a ~60 MB corpus and the probe measures the operator, not
  * the disk.
  *
  * Usage: runMain graft.DedupProbe <srcDir> <k> <workDir>
  *        (k=0 reuses an existing replica, as ScaleProbe does)
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, kStr, workDir) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-dedup-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // probe-scale scan sizing (see ScaleProbe): keep scan parallelism
      // tracking row counts on a few-MB corpus
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (4 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (k > 0) {
      val base = Tables.load(spark, srcDir, "documents")
      val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
      (0 until k).map(i => base.withColumn("doc_id", col("doc_id") + lit(i.toLong * span)))
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$workDir/documents.parquet")
      System.err.println(s"[dedup-probe] replicated documents x$k -> $workDir")
    } else System.err.println(s"[dedup-probe] k=0: reusing $workDir")

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }

    val rows = Seq(srcDir -> "1x", workDir -> s"${if (k > 0) k else "k"}x").map {
      case (dir, tag) =>
        val docs = Tables.documents(spark, dir)
        val nDocs = docs.count()
        val nDistinct = docs.agg(countDistinct(sha2(col("text"), 256))).head().getLong(0)
        // the q47 funnel, stage by stage (counts are deterministic —
        // no medians needed; times are single warm-ish runs)
        val (preCand, tPre) = t(Dedup.bandedCandidatesPreDistinct(docs).count())
        val (truePairs, tPairs) = t(Dedup.exactNearDupPairs(docs, 0.6).count())
        val (_, tQ56) = t(SparkEntry.queries("q56_neardup_pipeline")(spark, dir)
          .write.format("noop").mode("overwrite").save())
        val bands = 16
        val candPerTrue = if (truePairs == 0) 0.0 else preCand.toDouble / (bands.toDouble * truePairs)
        System.err.println(
          f"[dedup-probe] $tag%5s docs=$nDocs%8d distinct=$nDistinct%7d " +
          f"preCand=$preCand%12d truePairs=$truePairs%10d " +
          f"preCand/(bands*truePairs)=$candPerTrue%6.2f " +
          f"t_pre=$tPre%6.1fs t_pairs=$tPairs%7.1fs t_q56=$tQ56%6.1fs")
        s""""$tag":{"docs":$nDocs,"distinct":$nDistinct,"pre_cand":$preCand,""" +
          s""""true_pairs":$truePairs,"cand_per_true":$candPerTrue,""" +
          s""""t_pairs":$tPairs,"t_q56":$tQ56}"""
    }
    println(s"""{"metric":"dedup_probe","k":$k,"scales":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}

/** Incremental-cluster scale probe: folds a FIXED-size delta (the
  * corpus's 500 highest doc_ids) into pair graph + clusters at 1× vs
  * k× corpus and times `extend` + `updateClusters` against the
  * from-scratch build at the same scale. The claim under test: the
  * incremental path's cost tracks the DELTA's pair volume (which
  * replication legitimately multiplies — each delta doc gains k
  * near-dup matches) while the from-scratch build tracks the CORPUS,
  * so the build/update ratio must WIDEN with scale. Reuses DedupProbe's
  * documents replica (`runMain graft.DedupProbe <src> <k> <work>`
  * first, then k=0 here, or any k to re-replicate).
  *
  * Usage: runMain graft.ClusterProbe <srcDir> <k> <workDir>
  */
object ClusterProbe {
  import graft.operators.PairGraph

  def main(args: Array[String]): Unit = {
    val Array(srcDir, kStr, workDir) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-cluster-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (4 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (k > 0) {
      val base = Tables.load(spark, srcDir, "documents")
      val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
      (0 until k).map(i => base.withColumn("doc_id", col("doc_id") + lit(i.toLong * span)))
        .reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$workDir/documents.parquet")
      System.err.println(s"[cluster-probe] replicated documents x$k -> $workDir")
    } else System.err.println(s"[cluster-probe] k=0: reusing $workDir")

    def t[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    val deltaN = 500

    val rows = Seq(srcDir -> "1x", workDir -> s"${if (k > 0) k else "k"}x").map {
      case (dir, tag) =>
        val docs = Tables.documents(spark, dir)
        val cutId = docs.select(col("doc_id")).orderBy(desc("doc_id")).limit(deltaN)
          .agg(min("doc_id")).head().getLong(0)
        val old = docs.filter(col("doc_id") < cutId)
        val delta = docs.filter(col("doc_id") >= cutId)
        val store = java.nio.file.Files.createTempDirectory("cluster_probe")
          .toString + "/store"
        val (_, tBuild) = t(
          PairGraph.clusters(spark, old, dir, 0.6, Some(store)).count())
        val (_, tExtend) = t(PairGraph.extend(spark, delta, dir, 0.6, Some(store)))
        val (_, tUpdate) = t(PairGraph.updateClusters(spark, delta, dir, 0.6, Some(store)))
        val (nClustered, tServe) = t(
          PairGraph.clusters(spark, docs, dir, 0.6, Some(store)).count())
        // honesty metric: the delta's own pair volume (what `extend` +
        // `updateClusters` legitimately pay for)
        val deltaPairs = graft.streaming.UpsertStore.read(spark, store).get
          .filter(col("doc_a") >= cutId || col("doc_b") >= cutId).count()
        System.err.println(
          f"[cluster-probe] $tag%5s delta=$deltaN deltaPairs=$deltaPairs%9d " +
          f"build=$tBuild%7.1fs extend=$tExtend%6.1fs update=$tUpdate%6.1fs " +
          f"serve=$tServe%5.1fs clustered=$nClustered%9d build/update=${tBuild / tUpdate}%5.1f")
        s""""$tag":{"delta_pairs":$deltaPairs,"t_build":$tBuild,"t_extend":$tExtend,""" +
          s""""t_update":$tUpdate,"t_serve":$tServe,"clustered":$nClustered}"""
    }
    println(s"""{"metric":"cluster_probe","k":$k,"scales":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
