package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Continuous exact-dedup at the ingest edge ([[DedupGateMaintainer]]):
  * streamed batches converge to the batch-sequential gate, duplicates
  * resolve across batches to the ORIGINAL ids, and replays converge
  * without (and with) the ledger. */
class GateMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import GateMaintainSpec.Doc

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private def text(i: Long) = s"unique content number $i with enough words"

  test("streamed batches: cross-batch duplicates resolve to original ids; decisions accumulate") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gate").toString
    val m = new DedupGateMaintainer(spark, s"$dir/gate")
    m.bootstrap(docsDf(1L -> text(1), 2L -> text(2), 3L -> text(3)))
    // batch with one re-crawl of doc 2 and one fresh doc
    m.ingestBatch(docsDf(10L -> text(2), 11L -> text(11)), txnId = Some(0L))
    // second batch re-crawls the FRESH doc from the previous batch —
    // the gate must already know it
    m.ingestBatch(docsDf(20L -> text(11)), txnId = Some(1L))
    val d = m.decisions().as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d(1L) == ((1L, "new")) && d(2L) == ((2L, "new")) && d(3L) == ((3L, "new")))
    assert(d(10L) == ((2L, "duplicate")), s"got ${d(10L)}")
    assert(d(11L) == ((11L, "new")))
    assert(d(20L) == ((11L, "duplicate")), s"got ${d(20L)}")
  }

  test("replay converges: with the ledger it's a no-op, without it decisions are identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-r").toString
    val m = new DedupGateMaintainer(spark, s"$dir/gate")
    m.bootstrap(docsDf(1L -> text(1)))
    m.ingestBatch(docsDf(10L -> text(1), 11L -> text(11)), txnId = Some(0L))
    val before = m.decisions().as[(Long, Long, String)].collect().toSet
    val v = UpsertStore.latestVersion(spark, s"$dir/gate")
    // ledgered replay: skipped outright
    m.ingestBatch(docsDf(10L -> text(1), 11L -> text(11)), txnId = Some(0L))
    assert(UpsertStore.latestVersion(spark, s"$dir/gate") == v)
    // unledgered replay (the crash-before-ledger window): recomputes
    // but CONVERGES — same decisions, the class-doc guarantee
    m.ingestBatch(docsDf(10L -> text(1), 11L -> text(11)))
    assert(m.decisions().as[(Long, Long, String)].collect().toSet == before,
      "unledgered replay must converge to identical decisions")
  }

  test("foreachBatch wiring gates a live stream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-gate-fb").toString
    val m = new DedupGateMaintainer(spark, s"$dir/gate")
    m.bootstrap(docsDf(1L -> text(1)))
    val input = MemoryStream[Doc]
    val q = m.run(input.toDF(), s"$dir/ckpt", trigger = Trigger.ProcessingTime(0))
    input.addData(Doc(10, new Timestamp(1000), text(1)),
      Doc(11, new Timestamp(1000), text(42)))
    q.processAllAvailable()
    q.stop()
    val d = m.decisions().as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(d(10L) == ((1L, "duplicate")) && d(11L) == ((11L, "new")), s"got $d")
  }
}

object GateMaintainSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}
