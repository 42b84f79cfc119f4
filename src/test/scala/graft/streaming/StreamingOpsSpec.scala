package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Streaming operators beyond the traffic pipeline: event dedup within
  * the watermark (exactly-once ingest for an at-least-once bus) and
  * stream-stream time-bounded joins — both bounded-state by watermark,
  * which is what keeps them viable at 100 TB/day.
  */
class StreamingOpsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import StreamingOpsSpec.Ev

  test("streaming dropDuplicatesWithinWatermark: replayed event ids collapse") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = input.toDS()
      .withWatermark("ts", "10 seconds")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_dedup_stream")
      .trigger(Trigger.ProcessingTime(0)).start()
    def ev(id: Long, t: Long) = Ev(id, new Timestamp(t), id.toDouble)
    input.addData(ev(1, 1000), ev(2, 2000), ev(1, 2500)) // id 1 duplicated
    q.processAllAvailable()
    input.addData(ev(2, 3000), ev(3, 4000)) // id 2 duplicated across batches
    q.processAllAvailable()
    val ids = spark.table("graft_dedup_stream").select("id").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L), s"got ${ids.toSeq}")
  }

  test("stream-stream join: clicks enriched by impressions within 1 minute") {
    implicit val sqlCtx = spark.sqlContext
    val impressions = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val imp = impressions.toDS().withWatermark("ts", "10 seconds")
      .select($"id".as("imp_ad_id"), $"ts".as("imp_ts"))
    val clk = clicks.toDS().withWatermark("ts", "10 seconds")
      .select($"id".as("ad_id"), $"ts".as("click_ts"), $"v".as("click_value"))
    val joined = imp.join(clk,
      expr("""imp_ad_id = ad_id AND click_ts >= imp_ts AND
              click_ts <= imp_ts + INTERVAL 1 MINUTE""".stripMargin))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("graft_ss_join")
      .trigger(Trigger.ProcessingTime(0)).start()
    impressions.addData(Ev(100, new Timestamp(10_000), 0))
    clicks.addData(Ev(100, new Timestamp(30_000), 1.5))   // within window → match
    clicks.addData(Ev(100, new Timestamp(200_000), 9.9))  // 190s later → no match
    q.processAllAvailable()
    val out = spark.table("graft_ss_join")
    val n = out.count()
    val v = out.select("click_value").as[Double].collect().toSeq
    q.stop()
    assert(n == 1, s"expected exactly the in-window click, got $n rows")
    assert(v == Seq(1.5))
  }
  test("streaming exact dedup: replayed document content collapses to first arrival") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val deduped = StreamingDedup.exactDedupStream(
      input.toDF(), watermark = "10 seconds")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("graft_doc_dedup")
      .trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, t: Long, text: String) =
      StreamingOpsSpec.Doc(id, new Timestamp(t), text)
    input.addData(doc(1, 1000, "alpha beta"), doc(2, 2000, "gamma"))
    q.processAllAvailable()
    // replayed content (different doc_id, same text) within watermark
    input.addData(doc(3, 2500, "alpha beta"), doc(4, 3000, "delta"))
    q.processAllAvailable()
    val kept = spark.table("graft_doc_dedup")
      .select("doc_id").as[Long].collect().sorted
    q.stop()
    assert(kept.toSeq == Seq(1L, 2L, 4L), s"got ${kept.toSeq}")
  }

  // near-dup corpus: A-variants differ by one word (3-gram Jaccard ≈ 0.7)
  private val textA = "the quick brown fox jumps over the lazy dog while " +
    "the cat sleeps on the warm mat near the door"
  private val textA2 = textA.replace("door", "window")
  private val textA3 = textA.replace("cat", "bird")
  private val textA4 = textA.replace("fox", "wolf")
  private val textB = "completely different subject matter entirely about " +
    "spacecraft navigation systems and orbital mechanics"
  private val textC = "another unrelated document concerning deep sea " +
    "creatures and their bioluminescent displays at night"
  private val textD = "yet more fresh material on medieval castle " +
    "architecture and defensive fortification design principles"

  test("streaming near-dup: minhash band index collapses near-duplicates, state expires with retention") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-stream").toString
    val nd = new StreamingNearDup(spark, s"$dir/bands", s"$dir/sigs",
      tau = 0.6, retentionMs = 60_000L, pruneEvery = 1)
    def batch(docs: (Long, Long, String)*) =
      docs.map { case (id, t, tx) => StreamingOpsSpec.Doc(id, new Timestamp(t), tx) }
        .toDF("doc_id", "ts", "text").select($"doc_id", $"ts", $"text")
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet

    // batch 1: near-dup pair within the batch + a distinct doc
    val k1 = keptIds(nd.dedupeBatch(batch((1, 1000, textA), (2, 1500, textA2), (3, 2000, textB))))
    assert(k1 == Set(1L, 3L), s"got $k1")
    // batch 2: near-dup of an INDEXED doc is dropped; new doc kept
    val k2 = keptIds(nd.dedupeBatch(batch((4, 5000, textA3), (5, 6000, textC))))
    assert(k2 == Set(5L), s"got $k2")
    // batch 3 far in the future: prune expires the whole old index
    val k3 = keptIds(nd.dedupeBatch(batch((6, 10_000_000, textD))))
    assert(k3 == Set(6L), s"got $k3")
    // batch 4: the A-family is forgotten (outside retention) → kept again
    val k4 = keptIds(nd.dedupeBatch(batch((7, 10_000_500, textA4))))
    assert(k4 == Set(7L), s"retention must have expired the A-family: got $k4")
    // bounded state: the band index holds only in-retention docs (6, 7)
    val indexed = UpsertStore.read(spark, s"$dir/sigs").get
      .select("doc_id").as[Long].collect().toSet
    assert(indexed == Set(6L, 7L), s"index not bounded by retention: $indexed")
  }

  test("trending tokens: streaming top-k per finalized window equals the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-trending").toString
    val sink = new ParquetUpsertSink(spark, s"$dir/sink", Seq("window_start", "rk"))
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val q = TrendingTokens.run(input.toDF(), sink, s"$dir/ckpt", k = 3,
      windowLen = "60 seconds", slide = "30 seconds", watermark = "0 seconds",
      trigger = Trigger.ProcessingTime(0))
    def doc(id: Long, t: Long, text: String) =
      StreamingOpsSpec.Doc(id, new Timestamp(t), text)
    val wave1 = Seq(
      doc(1, 5_000, "alpha alpha beta gamma"),
      doc(2, 20_000, "alpha beta beta delta"),
      doc(3, 40_000, "epsilon epsilon epsilon zeta"))
    input.addData(wave1: _*)
    q.processAllAvailable()
    // advance the watermark far past every window end → all finalize
    input.addData(doc(9, 500_000, "flush flush flush"))
    q.processAllAvailable()
    q.stop()
    import org.apache.spark.sql.functions.col
    val got = sink.read(spark)
      .filter(col("window_start") < 400_000L) // ignore the flush window
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    val expect = TrendingTokens.batchTopK(
      wave1.toDF("doc_id", "ts", "text"), k = 3,
      windowLen = "60 seconds", slide = "30 seconds")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
    assert(got == expect,
      s"missing=${(expect -- got).take(5)} extra=${(got -- expect).take(5)}")
  }

  test("progress recorder: listener captures per-batch rows off the query path") {
    implicit val sqlCtx = spark.sqlContext
    val rec = new ProgressRecorder().attach(spark)
    try {
      val input = MemoryStream[Ev]
      val q = input.toDS().withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark("id")
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_obs")
        .trigger(Trigger.ProcessingTime(0)).start()
      input.addData(Ev(1, new Timestamp(1000), 1.0), Ev(2, new Timestamp(2000), 2.0))
      q.processAllAvailable()
      // listener bus is async: progress lands shortly after the batch
      val deadline = System.currentTimeMillis() + 10000
      def rows() = rec.snapshot(spark)
        .filter(col("query_id") === q.id.toString)
        .agg(sum("num_input_rows")).head().getLong(0)
      var captured = 0L
      while ({ captured = try rows() catch { case _: NullPointerException => 0L }
               captured < 2 && System.currentTimeMillis() < deadline })
        Thread.sleep(100)
      q.stop()
      assert(captured >= 2, s"expected the 2 input rows in progress, saw $captured")
    } finally rec.detach(spark)
  }

  test("streaming near-dup replay: a re-processed batch re-emits its docs, never drops them") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-replay").toString
    val nd = new StreamingNearDup(spark, s"$dir/bands", s"$dir/sigs", tau = 0.6)
    def batch(docs: (Long, Long, String)*) =
      docs.map { case (id, t, tx) => StreamingOpsSpec.Doc(id, new Timestamp(t), tx) }
        .toDF("doc_id", "ts", "text")
    def keptIds(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id").as[Long].collect().toSet
    val b1 = Seq((1L, 1000L, textA), (2L, 2000L, textB))
    assert(keptIds(nd.dedupeBatch(batch(b1: _*))) == Set(1L, 2L))
    // foreachBatch is at-least-once: the index already holds these docs
    // (committed before the caller's output write) — a replayed batch
    // must not drop them against their own entries
    assert(keptIds(nd.dedupeBatch(batch(b1: _*))) == Set(1L, 2L),
      "replayed batch lost documents against its own index entries")
    // while a genuinely new near-dup in a later batch is still dropped
    assert(keptIds(nd.dedupeBatch(batch((3L, 3000L, textA2)))) == Set.empty)
  }

  test("streaming near-dup exact-verify: decisions equal the batch pipeline on a replayed corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-exact").toString
    val nd = new StreamingNearDup(spark, s"$dir/bands", s"$dir/sigs",
      tau = 0.6, exactVerify = true)
    // corpus: an exact-dup pair split across batches, a near-dup family
    // spread over three batches, and distinct docs
    val corpus = Seq(
      (1L, 1000L, textA), (2L, 2000L, textB), (3L, 2500L, textA), // 3 = exact dup of 1
      (4L, 5000L, textA2), (5L, 6000L, textC),                    // 4 = near-dup of 1
      (6L, 9000L, textA3), (7L, 9500L, textD), (8L, 9900L, textB) // 6 near-dup, 8 exact dup
    )
    def batch(docs: Seq[(Long, Long, String)]) =
      docs.map { case (id, t, tx) => StreamingOpsSpec.Doc(id, new Timestamp(t), tx) }
        .toDF("doc_id", "ts", "text")
    val streamingKept = Seq(corpus.take(3), corpus.slice(3, 5), corpus.drop(5))
      .flatMap(b => nd.dedupeBatch(batch(b)).select("doc_id").as[Long].collect()).toSet

    // ground truth: exact collapse + the batch pipeline's verified
    // near-dup pairs, replayed greedily in doc_id order (keep unless
    // near-dup of an already-kept doc) — the same decision rule the
    // stream applies, computed from the oracle-checked batch op
    val staticDf = batch(corpus).select("doc_id", "text")
    val exactKeep = corpus.groupBy(_._3).map { case (_, g) => g.map(_._1).min }.toSet
    val pairs = graft.operators.Dedup.nearDupPipeline(staticDf, tau = 0.6)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expected = corpus.map(_._1).sorted.foldLeft(Set.empty[Long]) { (kept, id) =>
      val nearDupOfKept = pairs.exists { case (a, b) => b == id && kept(a) }
      if (exactKeep(id) && !nearDupOfKept) kept + id else kept
    }
    assert(streamingKept == expected,
      s"streaming=$streamingKept batch-ground-truth=$expected")
    // and the signature store carries the HASHED shingle sets that made
    // the exact decisions possible — longs only, never the shingle
    // strings (the q47 cache discipline, applied to streaming state)
    val sigStore = UpsertStore.read(spark, s"$dir/sigs").get
    assert(sigStore.columns.contains("hsh"),
      s"exact mode must persist hashed shingle sets: ${sigStore.columns.toSeq}")
    assert(!sigStore.columns.contains("shingles"),
      s"string shingles must never reach the store: ${sigStore.columns.toSeq}")
    assert(sigStore.schema("hsh").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.LongType),
      "hsh must be array<long> (8 B/shingle)")
  }

  test("streaming near-dup bootstrap: a batch-seeded index suppresses near-dups of historical docs") {
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-boot").toString
    val nd = new StreamingNearDup(spark, s"$dir/bands", s"$dir/sigs",
      tau = 0.6, retentionMs = 3600L * 1000, exactVerify = true)
    def batch(docs: (Long, Long, String)*) =
      docs.map { case (id, t, tx) => StreamingOpsSpec.Doc(id, new Timestamp(t), tx) }
        .toDF("doc_id", "ts", "text")
    // backfill: the historical (already-deduped) corpus seeds the index
    nd.bootstrap(batch((1, 1000, textA), (2, 2000, textB)))
    val indexed = UpsertStore.read(spark, s"$dir/sigs").get
      .select("doc_id").as[Long].collect().toSet
    assert(indexed == Set(1L, 2L), s"bootstrap must index the corpus: $indexed")
    // stream: a near-dup of a BOOTSTRAPPED doc is dropped, fresh kept
    val kept = nd.dedupeBatch(batch((10, 5000, textA2), (11, 6000, textC)))
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(11L),
      s"doc 10 (near-dup of bootstrapped doc 1) must be dropped: $kept")
  }

  test("continuous cluster maintenance: streamed batches converge to the from-scratch components") {
    import graft.operators.{Dedup, PairGraph}
    val dir = java.nio.file.Files.createTempDirectory("graft-clmaint").toString
    val sf = SharedSpark.sf0001
    val docs = graft.Tables.documents(spark, sf)
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val (cut1, cut2) = (ids(ids.length * 6 / 10), ids(ids.length * 8 / 10))
    val cm = new ClusterMaintainer(spark, sf, s"$dir/store", 0.6)
    cm.bootstrap(docs.filter($"doc_id" <= cut1))
    cm.ingestBatch(docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2).select("doc_id", "text"))
    cm.ingestBatch(docs.filter($"doc_id" > cut2).select("doc_id", "text"))
    val streamed = cm.current.as[(Long, Long)].collect().toSet
    val scratch = Dedup.clusterAssignments(
      Dedup.exactNearDupPairs(docs, 0.6).select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(streamed == scratch,
      s"missing=${(scratch -- streamed).take(5)} extra=${(streamed -- scratch).take(5)}")
    // and the incremental result serves through the fingerprint gate
    val v = UpsertStore.latestVersion(spark, s"$dir/store__clusters")
    PairGraph.clusters(spark, docs, sf, 0.6, Some(s"$dir/store")).count()
    assert(UpsertStore.latestVersion(spark, s"$dir/store__clusters") == v,
      "full-corpus serve after streamed ingest must hit the gate, not rebuild")
  }

  test("continuous cluster maintenance: replays are skipped by id guard and txn ledger") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clmaint-rp").toString
    def batch(docs: (Long, String)*) = docs.toDF("doc_id", "text")
    val cm = new ClusterMaintainer(spark, "memtest", s"$dir/store", 0.6)
    cm.bootstrap(batch(1L -> textA, 2L -> textB))
    val pairsPath = s"$dir/store"

    // id-guard path (no txnId): same batch twice — second is a no-op
    cm.ingestBatch(batch(10L -> textA2))
    val v1 = UpsertStore.latestVersion(spark, pairsPath)
    cm.ingestBatch(batch(10L -> textA2))
    assert(UpsertStore.latestVersion(spark, pairsPath) == v1,
      "replayed batch (all ids indexed) must not touch the pair store")

    // txn-ledger path: same txnId twice — skipped even though the doc
    // is sketch-less (too short to shingle), which the id guard alone
    // could not recognize
    cm.ingestBatch(batch(20L -> "too short"), txnId = Some(7L))
    val v2 = UpsertStore.latestVersion(spark, pairsPath)
    cm.ingestBatch(batch(20L -> "too short"), txnId = Some(7L))
    assert(UpsertStore.latestVersion(spark, pairsPath) == v2,
      "replayed txnId must be skipped by the ledger")
    // a NEW txn with a near-dup doc still applies and merges
    cm.ingestBatch(batch(30L -> textA3), txnId = Some(8L))
    val labels = cm.current.as[(Long, Long)].collect().toSet
    assert(labels.contains((30L, 1L)),
      s"doc 30 (near-dup of 1 and 10) must join component 1: $labels")
  }

  test("continuous cluster maintenance: foreachBatch wiring keeps clusters current") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-clmaint-q").toString
    def batch(docs: (Long, String)*) = docs.toDF("doc_id", "text")
    val cm = new ClusterMaintainer(spark, "memtest2", s"$dir/store", 0.6)
    cm.bootstrap(batch(1L -> textA, 2L -> textB))
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val q = cm.run(input.toDF(), s"$dir/ckpt", trigger = Trigger.ProcessingTime(0))
    input.addData(StreamingOpsSpec.Doc(10, new Timestamp(1000), textA2))
    q.processAllAvailable()
    input.addData(StreamingOpsSpec.Doc(11, new Timestamp(2000), textA4),
      StreamingOpsSpec.Doc(12, new Timestamp(2500), textC))
    q.processAllAvailable()
    q.stop()
    val labels = cm.current.as[(Long, Long)].collect().toSet
    assert(labels == Set((1L, 1L), (10L, 1L), (11L, 1L)),
      s"streamed near-dups of doc 1 must fold into its component: $labels")
  }

  test("streaming near-dup wiring: foreachBatch query writes only survivors") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-neardup-q").toString
    val nd = new StreamingNearDup(spark, s"$dir/bands", s"$dir/sigs", tau = 0.6)
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val q = nd.run(input.toDF(), s"$dir/out", s"$dir/ckpt",
      trigger = Trigger.ProcessingTime(0))
    input.addData(StreamingOpsSpec.Doc(1, new Timestamp(1000), textA),
      StreamingOpsSpec.Doc(2, new Timestamp(2000), textB))
    q.processAllAvailable()
    input.addData(StreamingOpsSpec.Doc(3, new Timestamp(3000), textA2)) // near-dup of 1
    q.processAllAvailable()
    q.stop()
    val kept = spark.read.parquet(s"$dir/out").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L), s"got $kept")
  }
}

object StreamingOpsSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
  case class Ev(id: Long, ts: Timestamp, v: Double)
}
