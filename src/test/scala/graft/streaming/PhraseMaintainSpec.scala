package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.PhraseIndex

/** The sixteenth maintainer ([[PhraseMaintainer]], q192): the
  * positional phrase index maintained per batch. Pinned: streamed
  * extends ≡ one-shot build (serve equality over phrases whose
  * matches span batch boundaries, incl. an overlapping repeated-term
  * phrase), unledgered replay converges on CONTENT (position arrays
  * are pure functions of each doc's text — byte-identical rows under
  * the same keys), ledgered replay is a version-level no-op, and
  * foreachBatch + checkpoint restart serves the full corpus. */
class PhraseMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import PhraseMaintainSpec._

  private val base = Seq(
    PDoc(1L, "a a a quick brown"),
    PDoc(2L, "the quick brown fox"))
  private val batch1 = Seq(
    PDoc(3L, "quick brown quick brown"),
    PDoc(4L, "brown quick"))
  private val batch2 = Seq(PDoc(5L, "a lone a quick brown"))
  private val corpus = base ++ batch1 ++ batch2
  private val pats = Seq("quick brown", "a a", "brown", "zz absent")

  /** Brute force over the full corpus — the q191 spec's definition. */
  private val expected: Set[(String, Long, Long)] = corpus.flatMap { d =>
    val ts = d.text.toLowerCase.split("\\s+").toSeq
    pats.flatMap { p =>
      val ps = p.toLowerCase.split("\\s+").toSeq
      val n = (0 to ts.length - ps.length)
        .count(s => ps.indices.forall(i => ts(s + i) == ps(i)))
      if (n > 0) Some((p, d.doc_id, n.toLong)) else None
    }
  }.toSet

  private def servePairs(m: PhraseMaintainer): Set[(String, Long, Long)] =
    m.serve(pats.toDF("query")).as[(String, Long, Long)].collect().toSet

  test("streamed extends serve the one-shot contract; replay converges with and without the ledger") {
    val dir = java.nio.file.Files.createTempDirectory("graft-pm").toString
    val m = new PhraseMaintainer(spark, s"$dir/idx")
    m.bootstrap(base.toDF())
    m.ingestBatch(batch1.toDF()) // no txnId: ledger skip unavailable
    def snap(): Set[(String, Long, Seq[Int])] =
      UpsertStore.read(spark, s"$dir/idx").get
        .select("term", "doc_id", "positions")
        .as[(String, Long, Seq[Int])].collect().toSet
    val s1 = snap()
    m.ingestBatch(batch1.toDF()) // unledgered replay: content must converge
    assert(snap() == s1, "replayed batch changed the positional store")
    m.ingestBatch(batch2.toDF(), Some(1L))
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    m.ingestBatch(batch2.toDF(), Some(1L)) // ledgered replay: version-level no-op
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "ledgered replay advanced the positional store")
    assert(servePairs(m) == expected, s"maintained serve: ${servePairs(m)}")
    // one-shot reference over the same corpus
    PhraseIndex.build(spark, corpus.toDF(), s"$dir/ref")
    val ref = PhraseIndex.search(spark, s"$dir/ref", pats.toDF("query"))
      .as[(String, Long, Long)].collect().toSet
    assert(ref == expected, s"one-shot reference: $ref")
  }

  test("foreachBatch wiring + checkpoint restart: serve equals the from-scratch build") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-pm-fb").toString
    val m = new PhraseMaintainer(spark, s"$dir/idx")
    m.bootstrap(base.toDF())
    val input = MemoryStream[PDoc]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(batch1: _*)
    q.processAllAvailable()
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(servePairs(m) == expected,
      s"post-restart phrase serve diverged: ${servePairs(m)}")
  }
}

object PhraseMaintainSpec {
  case class PDoc(doc_id: Long, text: String)
}
