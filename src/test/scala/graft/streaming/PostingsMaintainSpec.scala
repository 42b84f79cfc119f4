package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.operators.PostingsIndex

/** Continuous BM25 postings-index maintenance: streamed batches
  * converge to the from-scratch index (scores bit-identical), replays
  * are guarded by the ledger and the doc-id fallback, and retrieval
  * serves from the stored postings ([[PostingsMaintainer]]). */
class PostingsMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._
  import PostingsMaintainSpec.Doc

  private def batchDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  /** (query_id, term) probe set: the distinct terms of one document. */
  private def probe(docs: org.apache.spark.sql.DataFrame, id: Long) =
    docs.filter($"doc_id" === id)
      .select(lit(id).as("query_id"),
        explode(graft.operators.TextAnalysis.tokens($"text")).as("term"))
      .distinct()

  test("streamed batches converge to the from-scratch index, scores bit-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pmaint").toString
    val docs = Tables.documents(spark, sf)
    val ids = docs.select("doc_id").as[Long].collect().sorted
    val (cut1, cut2) = (ids(ids.length * 6 / 10), ids(ids.length * 8 / 10))
    val m = new PostingsMaintainer(spark, s"$dir/store")
    m.bootstrap(docs.filter($"doc_id" <= cut1))
    m.ingestBatch(docs.filter($"doc_id" > cut1 && $"doc_id" <= cut2)
      .select("doc_id", "text"))
    m.ingestBatch(docs.filter($"doc_id" > cut2).select("doc_id", "text"))

    val scratchDir = java.nio.file.Files.createTempDirectory("graft-pmaint-s").toString
    PostingsIndex.ensure(spark, docs, s"$scratchDir/store")
    val q = probe(docs, ids.head)
    val streamed = m.search(q)
      .as[(Long, Long, Double)].collect().toSet
    val scratch = PostingsIndex.search(spark, s"$scratchDir/store", q)
      .as[(Long, Long, Double)].collect().toSet
    assert(streamed == scratch,
      s"missing=${(scratch -- streamed).take(3)} extra=${(streamed -- scratch).take(3)}")

    // the associatively-advanced fingerprint equals the full corpus's:
    // a full-corpus ensure after streamed ingest hits the gate
    val v = UpsertStore.latestVersion(spark, s"$dir/store__stats")
    PostingsIndex.ensure(spark, docs, s"$dir/store")
    assert(UpsertStore.latestVersion(spark, s"$dir/store__stats") == v,
      "full-corpus ensure after streamed ingest must hit the gate, not rebuild")
  }

  test("replays are skipped by the txn ledger and the doc-id guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pmaint-rp").toString
    val m = new PostingsMaintainer(spark, s"$dir/store")
    m.bootstrap(batchDf((1L to 8L).map(i => i -> s"alpha beta doc$i"): _*))

    // doc-id-guard path (no txnId): same batch twice — second is a no-op
    m.ingestBatch(batchDf(10L -> "alpha gamma ten"))
    val v1 = UpsertStore.latestVersion(spark, s"$dir/store__stats")
    m.ingestBatch(batchDf(10L -> "alpha gamma ten"))
    assert(UpsertStore.latestVersion(spark, s"$dir/store__stats") == v1,
      "replayed batch (all doc_ids posted) must not touch the store")

    // txn-ledger path: same txnId twice — skipped by the ledger
    m.ingestBatch(batchDf(20L -> "beta delta twenty"), txnId = Some(7L))
    val v2 = UpsertStore.latestVersion(spark, s"$dir/store__stats")
    m.ingestBatch(batchDf(20L -> "beta delta twenty"), txnId = Some(7L))
    assert(UpsertStore.latestVersion(spark, s"$dir/store__stats") == v2,
      "replayed txnId must be skipped by the ledger")

    // a NEW txn still applies and the grown index serves current data
    m.ingestBatch(batchDf(30L -> "epsilon thirty"), txnId = Some(8L))
    val hits = m.search(Seq((99L, "epsilon")).toDF("query_id", "term"))
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(30L), s"expected the ledgered ingest to serve, got $hits")
  }

  test("foreachBatch wiring keeps the index current") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-pmaint-fb").toString
    val m = new PostingsMaintainer(spark, s"$dir/store")
    m.bootstrap(batchDf((1L to 4L).map(i => i -> s"base doc$i"): _*))
    val input = MemoryStream[Doc]
    val q = m.run(input.toDF(), s"$dir/ckpt", trigger = Trigger.ProcessingTime(0))
    input.addData(Doc(10, new Timestamp(1000), "streamed alpha"))
    q.processAllAvailable()
    input.addData(Doc(11, new Timestamp(2000), "streamed beta"))
    q.processAllAvailable()
    q.stop()
    val posted = UpsertStore.read(spark, s"$dir/store").get
      .select("doc_id").as[Long].collect().toSet
    assert(posted == ((1L to 4L).toSet ++ Set(10L, 11L)), s"got $posted")
    // df for a term spanning bootstrap + streamed batches is recounted
    val dfRow = UpsertStore.read(spark, s"$dir/store__df").get
      .filter($"term" === "streamed").select("df").as[Long].head()
    assert(dfRow == 2L, s"df(streamed) should be 2, got $dfRow")
  }
}

object PostingsMaintainSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}
