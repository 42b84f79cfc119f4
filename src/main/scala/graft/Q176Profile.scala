package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage lifecycle profiler for the simhash-index pair (q176/q177)
  * — the q159/q95 profile playbook: stage wall times + Spark job
  * counts, two rounds (round 1 warms FS cache + codegen; round 2 is
  * the honest read). Run:
  * `SPARK_GRAFT_CPUS=32 sbt "runMain graft.Q176Profile /root/testdata/sf0.1"` */
object Q176Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("q176-profile")
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
      System.err.println(f"[q176] $label%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
        f"  ${jobs.get() - j0}%3d jobs")
      r
    }
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    docs.write.format("noop").mode("overwrite").save()
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cutA = math.floor(0.6 * maxId).toLong
    val cutB = math.floor(0.8 * maxId).toLong
    for (round <- 1 to 2) {
      System.err.println(s"[q176] --- round $round ---")
      val path = Scratch.dir("q176prof") + "/index"
      t("fps pass alone (noop)") {
        operators.SimhashIndex.fps(docs.filter(col("doc_id") <= cutA))
          .write.format("noop").mode("overwrite").save()
      }
      t("build (2 store replaces)") {
        operators.SimhashIndex.build(spark, docs.filter(col("doc_id") <= cutA), path)
      }
      t("extend (2 store upserts)") {
        operators.SimhashIndex.extend(spark,
          docs.filter(col("doc_id") > cutA && col("doc_id") <= cutB), path, Some(0L))
      }
      t("diag: fpPair/cand volumes") {
        val f = operators.SimhashIndex.fps(docs.filter(col("doc_id") > cutB)).persist()
        val st = graft.streaming.UpsertStore.read(spark, s"$path/chunks").get
        val ech = f.select("simhash").distinct()
          .select(col("simhash"),
            posexplode(expr("transform(sequence(0, 7), c -> (simhash >> (c * 8)) & 255)")))
          .select(col("simhash").as("fp_e"), col("pos").as("chunk"), col("col").as("chunk_val"))
        val pairs = ech.join(st.select(col("chunk"), col("chunk_val"),
            col("simhash").as("fp_i")), Seq("chunk", "chunk_val"))
        val raw = pairs.count()
        val surv = pairs.filter(expr("bit_count(fp_e ^ fp_i)") <= 16)
          .select("fp_e", "fp_i").distinct().count()
        System.err.println(s"[q176]   bucket-join rows=$raw hamming-survivors=$surv")
        f.unpersist()
      }
      val served = t("serve plan + action") {
        val df = operators.SimhashIndex.serve(spark, path,
          docs.filter(col("doc_id") > cutB), docs.filter(col("doc_id") <= cutB))
        df.write.format("noop").mode("overwrite").save()
        df
      }
      t("serve re-run (cached esh)") {
        served.write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
