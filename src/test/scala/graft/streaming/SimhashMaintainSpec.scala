package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.SimhashIndex

/** The thirteenth maintainer ([[SimhashMaintainer]], q176/q177): the
  * banded-fingerprint near-dup index maintained per batch. Pinned:
  * streamed extends ≡ one-shot build (serve equality), keyed-upsert
  * idempotence (replay is a no-op even with the ledger bypassed), and
  * foreachBatch + checkpoint restart. */
class SimhashMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import SimhashMaintainSpec._

  /** Corpus with planted near-dups across batch boundaries: doc 20 is
    * a near-copy of indexed doc 1 (one token changed), doc 21 of
    * indexed doc 10 (ingested in a later batch), doc 22 is unique. */
  private def w(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
  private val base = Seq(
    Doc(1L, w("a", 40)),
    Doc(2L, w("b", 40)),
    Doc(3L, w("c", 40)))
  private val batch1 = Seq(Doc(10L, w("d", 40)), Doc(11L, w("e", 40)))
  private val batch2 = Seq(Doc(12L, w("f", 40)))
  private val evalDocs = Seq(
    Doc(20L, w("a", 39) + " zz"),  // near-dup of doc 1
    Doc(21L, w("d", 39) + " zz"),  // near-dup of doc 10 (batch-1 doc)
    Doc(22L, w("q", 40)))          // unique
  private val corpus = base ++ batch1 ++ batch2

  private def servePairs(m: SimhashMaintainer): Set[(Long, Long)] =
    m.serve(evalDocs.toDF(), corpus.toDF())
      .select("test_doc", "train_doc").as[(Long, Long)].collect().toSet

  private val expected = Set((20L, 1L), (21L, 10L))

  test("streamed extends serve the one-shot contract; replay is a no-op without the ledger") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sm").toString
    val m = new SimhashMaintainer(spark, s"$dir/idx")
    m.bootstrap(base.toDF())
    m.ingestBatch(batch1.toDF()) // no txnId: ledger skip unavailable
    def fpSnap(): Set[(Long, Long)] =
      UpsertStore.read(spark, s"$dir/idx").get
        .as[(Long, Long)].collect().toSet
    def chSnap(): Long = UpsertStore.read(spark, s"$dir/idx__chunks").get.count()
    val (f1, c1) = (fpSnap(), chSnap())
    m.ingestBatch(batch1.toDF()) // replay without the ledger
    assert(fpSnap() == f1 && chSnap() == c1,
      "replayed batch changed the index — keyed upserts not idempotent")
    m.ingestBatch(batch2.toDF(), Some(1L))
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    m.ingestBatch(batch2.toDF(), Some(1L)) // ledgered replay
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "ledgered replay advanced the fps store")
    assert(servePairs(m) == expected, s"maintained serve: ${servePairs(m)}")
    // one-shot reference over the same corpus
    SimhashIndex.build(spark, corpus.toDF(), s"$dir/ref")
    val ref = SimhashIndex.serve(spark, s"$dir/ref", evalDocs.toDF(), corpus.toDF())
      .select("test_doc", "train_doc").as[(Long, Long)].collect().toSet
    assert(ref == expected, s"one-shot reference: $ref")
  }

  test("foreachBatch wiring + checkpoint restart: serve equals the from-scratch build") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sm-fb").toString
    val m = new SimhashMaintainer(spark, s"$dir/idx")
    m.bootstrap(base.toDF())
    val input = MemoryStream[Doc]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(batch1: _*)
    q.processAllAvailable()
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(servePairs(m) == expected,
      s"post-restart simhash serve diverged: ${servePairs(m)}")
  }
}

object SimhashMaintainSpec {
  case class Doc(doc_id: Long, text: String)
}
