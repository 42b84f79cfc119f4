package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Dedup, PairGraph}
import graft.streaming.UpsertStore

/** Throwaway per-stage profiler for q95 (build→extend→update→serve). */
object Q95Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("q95-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    })
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val j0 = jobs.get(); val r = f
      System.err.println(f"[q95] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  ${jobs.get() - j0}%3d jobs")
      r
    }
    // warm the table scans
    val docs = Tables.documents(spark, dir)
    docs.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      System.err.println(s"--- round $round")
      val store = java.nio.file.Files.createTempDirectory("q95prof").toString + "/store"
      val cut = t("percentile-cut") {
        docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong }
      val d80 = docs.filter(col("doc_id") <= cut)
      val d20 = docs.filter(col("doc_id") > cut)
      t("sketch-80 (count only)") { Dedup.shSketch(d80).count() }
      t("build: pairGraph(80)") { PairGraph.pairGraph(spark, d80, dir, 0.6, Some(store)).count() }
      t("build: clusters(80)") { PairGraph.clusters(spark, d80, dir, 0.6, Some(store)).count() }
      t("extend(20)") { PairGraph.extend(spark, d20, dir, 0.6, Some(store)) }
      t("updateClusters(20)") { PairGraph.updateClusters(spark, d20, dir, 0.6, Some(store)) }
      t("serve clusters(full)") { PairGraph.clusters(spark, docs, dir, 0.6, Some(store)).count() }
      t("fingerprint(full) alone") { PairGraph.corpusFingerprint(docs) }
      t("read sigs table") { UpsertStore.read(spark, s"${store}__sigs").get.count() }
    }
    spark.stop()
  }
}
