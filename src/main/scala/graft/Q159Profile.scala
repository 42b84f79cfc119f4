package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.streaming.{ManifestMaintainer, UpsertStore}

/** Throwaway per-stage profiler for q159's lifecycle (the q95-profile
  * playbook, VERDICT r13 #2): bootstrap (gate, clusters, facts, full
  * manifest) + two ingest batches (gate, cluster extend+merge, facts
  * upsert, scoped manifest refresh, ledger) + serve, each stage timed
  * with its Spark job count — the numbers behind BASELINE.md's q159
  * row and the commit-batching decision. */
object Q159Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("q159-profile")
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
      System.err.println(f"[q159] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  ${jobs.get() - j0}%3d jobs")
      r
    }
    val docs = Tables.documents(spark, dir)
    docs.write.format("noop").mode("overwrite").save()
    for (round <- 1 to 2) {
      System.err.println(s"--- round $round")
      val store = Scratch.dir("q159prof") + "/store"
      val mm = new ManifestMaintainer(spark, dir, store)
      val (cut, mid) = t("percentile cuts") {
        val c = docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong
        val m = docs.filter(col("doc_id") > c)
          .selectExpr("percentile(doc_id, 0.5)").head().getDouble(0).toLong
        (c, m)
      }
      val d80 = docs.filter(col("doc_id") <= cut)
      val b1 = docs.filter(col("doc_id") > cut && col("doc_id") <= mid)
      val b2 = docs.filter(col("doc_id") > mid)
      t("boot: gate") { mm.gate.bootstrap(d80) }
      t("boot: clusters") { mm.clusterM.bootstrap(d80) }
      t("boot: facts replace") {
        UpsertStore.replace(spark, s"${store}__facts", mm.factsOf(d80),
          Seq("doc_id"), assumeKeyUnique = true)
      }
      t("boot: manifest refresh(all)") { mm.refreshManifest(None) }
      for ((b, name, txn) <- Seq((b1, "b1", 10L), (b2, "b2", 11L))) {
        t(s"$name: gate.ingest") { mm.gate.ingestBatch(b, Some(txn)) }
        val fp = t(s"$name: fingerprint") {
          graft.operators.PairGraph.corpusFingerprint(b) }
        t(s"$name: pg.extend") {
          graft.operators.PairGraph.extend(spark, b, dir, 0.6,
            Some(s"${store}__pairs"), Some(txn), deltaFp = Some(fp)) }
        t(s"$name: pg.updateClusters") {
          graft.operators.PairGraph.updateClusters(spark, b, dir, 0.6,
            Some(s"${store}__pairs"), txnId = Some(txn), deltaFp = Some(fp)) }
        t(s"$name: cluster.ledger") {
          graft.streaming.UpsertStore.replace(spark,
            s"${store}__pairs__ingest_txn",
            spark.range(1).select(lit(1L).as("meta_id"), lit(txn).as("txn")),
            Seq("meta_id")) }
        t(s"$name: facts upsert") {
          UpsertStore.upsert(spark, s"${store}__facts", mm.factsOf(b),
            Seq("doc_id"), assumeKeyUnique = true)
        }
        t(s"$name: manifest refresh(scoped)") {
          mm.refreshManifest(Some(b.select("doc_id")))
        }
      }
      t("serve: current.count") { mm.current.count() }
      // COMPOSED lifecycle (what q159 actually runs): fresh store,
      // maintainer-internal stage concurrency + batch persist active
      val store2 = Scratch.dir("q159prof-c") + "/store"
      val mm2 = new ManifestMaintainer(spark, dir, store2)
      t("composed: bootstrap") { mm2.bootstrap(d80) }
      t("composed: ingest b1") { mm2.ingestBatch(b1, Some(0L)) }
      t("composed: ingest b2") { mm2.ingestBatch(b2, Some(1L)) }
      t("composed: serve") { mm2.current.orderBy("doc_id").count() }
      // store-commit census: every writeManifest leaves a _log entry
      val fsRoot = new java.io.File(store).getParentFile
      val commits = fsRoot.listFiles().filter(_.isDirectory).map { d =>
        val log = new java.io.File(d, "_log")
        d.getName -> (if (log.isDirectory) log.listFiles().length else 0)
      }.sortBy(-_._2)
      System.err.println("[q159] store commits (manifest writes): " +
        commits.map { case (n, c) => s"$n=$c" }.mkString(" "))
    }
    spark.stop()
  }
}
