package graft

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.spark.sql.SparkSession

import graft.streaming.ClusterMaintainer

/** Serve-side latency of the materialized cluster table UNDER
  * MAINTENANCE LOAD (VERDICT r7 #7): round 7's StreamingNearDupProbe
  * pinned ingest-side state discipline; this probe pins the other half
  * of the production contract — q89-shaped cluster reads issued
  * concurrently with a running extend+updateClusters ingest, at the
  * base and 10× batch protocol. The store makes this cheap by design
  * (readers see the last committed manifest; an in-flight ingest's
  * delta dirs are invisible until its atomic swap), so read latency
  * under load should sit near the idle latency — a big ratio would
  * mean ingest commits are blocking or bloating the read path.
  *
  * Usage: `sbt "runMain graft.ClusterServeProbe"`.
  */
object ClusterServeProbe {

  /** Deterministic doc batches: 50-token docs, every 10th a near-dup
    * of its predecessor — same corpus shape as StreamingNearDupProbe. */
  private def batchDf(spark: SparkSession, batchIdx: Long, n: Long) =
    spark.range(batchIdx * n, (batchIdx + 1) * n).selectExpr(
      "id AS doc_id",
      """concat_ws(' ', transform(sequence(0, 49), w ->
        |  CASE WHEN id % 10 = 0 AND w < 49 THEN concat('tok', pmod(hash(id - 1, w), 50000))
        |       WHEN id % 10 = 0 THEN concat('alt', id)
        |       ELSE concat('tok', pmod(hash(id, w), 50000)) END)) AS text""".stripMargin)

  /** One q89-shaped serve: cluster labels + per-cluster sizes. */
  private def serveOnce(cm: ClusterMaintainer): Double = {
    val t0 = System.nanoTime()
    cm.current.groupBy("label").count().count()
    (System.nanoTime() - t0) / 1e9
  }

  /** Bootstrap a maintainer on `n` docs, then run `batches` ingests on
    * one thread while a reader thread hammers serve reads; returns
    * (idle read sec, median under-load read sec, max under-load read
    * sec, reads completed during ingest). */
  def run(spark: SparkSession, n: Long, batches: Int): (Double, Double, Double, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("serve-probe").toString
    val cm = new ClusterMaintainer(spark, s"serve-probe-$n", s"$dir/store", 0.6)
    cm.bootstrap(batchDf(spark, 0, n))
    val idle = {
      serveOnce(cm) // warm plans
      val runs = Seq.fill(3)(serveOnce(cm)).sorted
      runs(1)
    }
    val ingesting = new AtomicBoolean(true)
    val reads = scala.collection.mutable.ListBuffer.empty[Double]
    val reader = new Thread(() => {
      while (ingesting.get()) reads += serveOnce(cm)
    })
    reader.start()
    try (1 to batches).foreach { i =>
      cm.ingestBatch(batchDf(spark, i.toLong, n), txnId = Some(i.toLong))
    } finally {
      ingesting.set(false)
      reader.join()
    }
    val sorted = reads.toSeq.sorted
    (idle, sorted(sorted.size / 2), sorted.last, sorted.size)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-cluster-serve-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (idleB, medB, maxB, nB) = run(spark, n = 500, batches = 5)
    System.err.println(f"[serve] base 500/batch  idle=${idleB}%.3fs " +
      f"median=${medB}%.3fs max=${maxB}%.3fs reads=$nB")
    val (idleX, medX, maxX, nX) = run(spark, n = 5000, batches = 5)
    System.err.println(f"[serve] 10x 5000/batch  idle=${idleX}%.3fs " +
      f"median=${medX}%.3fs max=${maxX}%.3fs reads=$nX")
    println(s"""{"metric":"cluster_serve_probe","idle_base":$idleB,""" +
      s""""underload_median_base":$medB,"underload_max_base":$maxB,""" +
      s""""idle_10x":$idleX,"underload_median_10x":$medX,""" +
      s""""underload_max_10x":$maxX,"reads_base":$nB,"reads_10x":$nX}""")
    spark.stop()
  }
}

/** Serve-under-ingest for the STREAMING MANIFEST store (VERDICT r13
  * #6): [[ClusterServeProbe]] pinned the cluster table's read latency
  * under maintenance load; this probe does the same for the composed
  * manifest maintainer — q156-shaped manifest reads (full read + keep/
  * reason rollup) issued concurrently with running `ingestBatch`
  * lifecycles, at the base and 10× batch protocol. The manifest is an
  * [[graft.streaming.UpsertStore]] like every other derived store
  * (readers see the last committed manifest pointer; the in-flight
  * batch's gate/cluster/facts/manifest commits become visible only at
  * their atomic swaps), so under-load read latency should sit near
  * idle, and a mid-refresh reader sees the previous complete manifest,
  * never a partial one.
  *
  * Usage: `sbt "runMain graft.ManifestServeProbe"`.
  */
object ManifestServeProbe {
  import graft.streaming.ManifestMaintainer

  /** Same deterministic corpus as [[ClusterServeProbe.batchDf]] with a
    * quality mix: every 7th doc is a short low-quality one, so the
    * manifest exercises all three stages (exact/near dup + quality). */
  private def batchDf(spark: SparkSession, batchIdx: Long, n: Long) =
    spark.range(batchIdx * n, (batchIdx + 1) * n).selectExpr(
      "id AS doc_id",
      """CASE WHEN id % 7 = 3 THEN 'tiny doc'
        |ELSE concat_ws(' ', transform(sequence(0, 49), w ->
        |  CASE WHEN id % 10 = 0 AND w < 49 THEN concat('tok', pmod(hash(id - 1, w), 50000))
        |       WHEN id % 10 = 0 THEN concat('alt', id)
        |       ELSE concat('tok', pmod(hash(id, w), 50000)) END)) END AS text""".stripMargin)

  /** One q156-shaped serve: the full manifest + a keep/reason rollup. */
  private def serveOnce(mm: ManifestMaintainer): Double = {
    val t0 = System.nanoTime()
    mm.current.groupBy("keep", "reason").count().count()
    (System.nanoTime() - t0) / 1e9
  }

  def run(spark: SparkSession, n: Long, batches: Int): (Double, Double, Double, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("manifest-serve-probe").toString
    val mm = new ManifestMaintainer(spark, s"mserve-$n", s"$dir/store")
    mm.bootstrap(batchDf(spark, 0, n))
    val idle = {
      serveOnce(mm) // warm plans
      Seq.fill(3)(serveOnce(mm)).sorted.apply(1)
    }
    val ingesting = new java.util.concurrent.atomic.AtomicBoolean(true)
    val reads = scala.collection.mutable.ListBuffer.empty[Double]
    val reader = new Thread(() => {
      while (ingesting.get()) reads += serveOnce(mm)
    })
    reader.start()
    try (1 to batches).foreach { i =>
      mm.ingestBatch(batchDf(spark, i.toLong, n), txnId = Some(i.toLong))
    } finally {
      ingesting.set(false)
      reader.join()
    }
    val sorted = reads.toSeq.sorted
    (idle, sorted(sorted.size / 2), sorted.last, sorted.size)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-manifest-serve-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (idleB, medB, maxB, nB) = run(spark, n = 500, batches = 5)
    System.err.println(f"[mserve] base 500/batch  idle=${idleB}%.3fs " +
      f"median=${medB}%.3fs max=${maxB}%.3fs reads=$nB")
    val (idleX, medX, maxX, nX) = run(spark, n = 5000, batches = 5)
    System.err.println(f"[mserve] 10x 5000/batch  idle=${idleX}%.3fs " +
      f"median=${medX}%.3fs max=${maxX}%.3fs reads=$nX")
    println(s"""{"metric":"manifest_serve_probe","idle_base":$idleB,""" +
      s""""underload_median_base":$medB,"underload_max_base":$maxB,""" +
      s""""idle_10x":$idleX,"underload_median_10x":$medX,""" +
      s""""underload_max_10x":$maxX,"reads_base":$nB,"reads_10x":$nX}""")
    spark.stop()
  }
}

/** Serve-under-ingest for the SUBSTRING (trigram) index (VERDICT r15
  * #6): [[ClusterServeProbe]]/[[ManifestServeProbe]]'s discipline
  * applied to the 14th maintainer — q174-shaped substring serves
  * (rarest-K posting intersection + contains verify) issued
  * concurrently with running [[graft.streaming.TrigramMaintainer
  * .ingestBatch]] lifecycles, at the base and 10× batch protocol.
  * The postings/df stores are plain [[graft.streaming.UpsertStore]]s,
  * so readers see the last committed manifest and an in-flight
  * ingest's delta dirs stay invisible until the atomic pointer swap —
  * under-load read latency should sit near idle.
  *
  * Usage: `sbt "runMain graft.TrigramServeProbe"`.
  */
object TrigramServeProbe {
  import graft.streaming.TrigramMaintainer

  /** [[ClusterServeProbe.batchDf]]'s deterministic corpus: the 'alt'
    * token every 10th doc gives the probe patterns a hit set that
    * grows with ingested batches, the hashed tokens give misses. */
  private def batchDf(spark: SparkSession, batchIdx: Long, n: Long) =
    spark.range(batchIdx * n, (batchIdx + 1) * n).selectExpr(
      "id AS doc_id",
      """concat_ws(' ', transform(sequence(0, 49), w ->
        |  CASE WHEN id % 10 = 0 AND w < 49 THEN concat('tok', pmod(hash(id - 1, w), 50000))
        |       WHEN id % 10 = 0 THEN concat('alt', id)
        |       ELSE concat('tok', pmod(hash(id, w), 50000)) END)) AS text""".stripMargin)

  /** One q174-shaped serve: three patterns (one growing hit family,
    * one narrow hit, one absent) against the committed stores. */
  private def serveOnce(spark: SparkSession, tm: TrigramMaintainer,
                        corpus: org.apache.spark.sql.DataFrame): Double = {
    import spark.implicits._
    val pats = Seq("alt", "alt10", "zzz-absent").toDF("query")
    val t0 = System.nanoTime()
    tm.serve(pats, corpus).count()
    (System.nanoTime() - t0) / 1e9
  }

  def run(spark: SparkSession, n: Long, batches: Int): (Double, Double, Double, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("trigram-serve-probe").toString
    val tm = new TrigramMaintainer(spark, s"$dir/store")
    tm.bootstrap(batchDf(spark, 0, n))
    // verify side: the full planned corpus (reads only join committed
    // candidates against it, so not-yet-ingested docs never surface)
    val corpus = (0 to batches).map(i => batchDf(spark, i.toLong, n))
      .reduce(_ unionByName _)
    val idle = {
      serveOnce(spark, tm, corpus) // warm plans
      Seq.fill(3)(serveOnce(spark, tm, corpus)).sorted.apply(1)
    }
    val ingesting = new java.util.concurrent.atomic.AtomicBoolean(true)
    val reads = scala.collection.mutable.ListBuffer.empty[Double]
    val reader = new Thread(() => {
      while (ingesting.get()) reads += serveOnce(spark, tm, corpus)
    })
    reader.start()
    try (1 to batches).foreach { i =>
      tm.ingestBatch(batchDf(spark, i.toLong, n), txnId = Some(i.toLong))
    } finally {
      ingesting.set(false)
      reader.join()
    }
    val sorted = reads.toSeq.sorted
    (idle, sorted(sorted.size / 2), sorted.last, sorted.size)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-trigram-serve-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (idleB, medB, maxB, nB) = run(spark, n = 500, batches = 5)
    System.err.println(f"[triserve] base 500/batch  idle=${idleB}%.3fs " +
      f"median=${medB}%.3fs max=${maxB}%.3fs reads=$nB")
    val (idleX, medX, maxX, nX) = run(spark, n = 5000, batches = 5)
    System.err.println(f"[triserve] 10x 5000/batch  idle=${idleX}%.3fs " +
      f"median=${medX}%.3fs max=${maxX}%.3fs reads=$nX")
    println(s"""{"metric":"trigram_serve_probe","idle_base":$idleB,""" +
      s""""underload_median_base":$medB,"underload_max_base":$maxB,""" +
      s""""idle_10x":$idleX,"underload_median_10x":$medX,""" +
      s""""underload_max_10x":$maxX,"reads_base":$nB,"reads_10x":$nX}""")
    spark.stop()
  }
}

/** Serve-under-ingest for the POSITIONAL PHRASE index (round 16 —
  * the [[TrigramServeProbe]] discipline applied to the sixteenth
  * maintainer): q191-shaped phrase serves (matched-posting join +
  * start-vote intersection) issued concurrently with running
  * [[graft.streaming.PhraseMaintainer.ingestBatch]] lifecycles, at
  * the base and 10× batch protocol. The positional store is a plain
  * [[graft.streaming.UpsertStore]], so readers resolve the last
  * committed manifest pointer and an in-flight ingest's delta dirs
  * stay invisible until the atomic swap — under-load read latency
  * should sit near idle.
  *
  * Usage: `sbt "runMain graft.PhraseServeProbe"`.
  */
object PhraseServeProbe {
  import graft.streaming.PhraseMaintainer

  /** [[TrigramServeProbe.batchDf]]'s deterministic corpus: every 10th
    * doc repeats a two-token phrase ('hit here hit here …' tail), so
    * one probe phrase's hit set grows with ingested batches while the
    * hashed tokens give misses. */
  private def batchDf(spark: SparkSession, batchIdx: Long, n: Long) =
    spark.range(batchIdx * n, (batchIdx + 1) * n).selectExpr(
      "id AS doc_id",
      """concat_ws(' ', transform(sequence(0, 49), w ->
        |  CASE WHEN id % 10 = 0 AND w >= 46 THEN (CASE WHEN w % 2 = 0 THEN 'hit' ELSE 'here' END)
        |       ELSE concat('tok', pmod(hash(id, w), 50000)) END)) AS text""".stripMargin)

  /** One q191-shaped serve: a growing-hit phrase, a reversed
    * non-phrase, an absent phrase. */
  private def serveOnce(spark: SparkSession, pm: PhraseMaintainer): Double = {
    import spark.implicits._
    val pats = Seq("hit here hit", "here hit here hit", "zzz absent").toDF("query")
    val t0 = System.nanoTime()
    pm.serve(pats).count()
    (System.nanoTime() - t0) / 1e9
  }

  def run(spark: SparkSession, n: Long, batches: Int): (Double, Double, Double, Int) = {
    val dir = java.nio.file.Files.createTempDirectory("phrase-serve-probe").toString
    val pm = new PhraseMaintainer(spark, s"$dir/store")
    pm.bootstrap(batchDf(spark, 0, n))
    val idle = {
      serveOnce(spark, pm) // warm plans
      Seq.fill(3)(serveOnce(spark, pm)).sorted.apply(1)
    }
    val ingesting = new java.util.concurrent.atomic.AtomicBoolean(true)
    val reads = scala.collection.mutable.ListBuffer.empty[Double]
    val reader = new Thread(() => {
      while (ingesting.get()) reads += serveOnce(spark, pm)
    })
    reader.start()
    try (1 to batches).foreach { i =>
      pm.ingestBatch(batchDf(spark, i.toLong, n), txnId = Some(i.toLong))
    } finally {
      ingesting.set(false)
      reader.join()
    }
    val sorted = reads.toSeq.sorted
    (idle, sorted(sorted.size / 2), sorted.last, sorted.size)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-phrase-serve-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (idleB, medB, maxB, nB) = run(spark, n = 500, batches = 5)
    System.err.println(f"[phrserve] base 500/batch  idle=${idleB}%.3fs " +
      f"median=${medB}%.3fs max=${maxB}%.3fs reads=$nB")
    val (idleX, medX, maxX, nX) = run(spark, n = 5000, batches = 5)
    System.err.println(f"[phrserve] 10x 5000/batch  idle=${idleX}%.3fs " +
      f"median=${medX}%.3fs max=${maxX}%.3fs reads=$nX")
    println(s"""{"metric":"phrase_serve_probe","idle_base":$idleB,""" +
      s""""underload_median_base":$medB,"underload_max_base":$maxB,""" +
      s""""idle_10x":$idleX,"underload_median_10x":$medX,""" +
      s""""underload_max_10x":$maxX,"reads_base":$nB,"reads_10x":$nX}""")
    spark.stop()
  }
}
