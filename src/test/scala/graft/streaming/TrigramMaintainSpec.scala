package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.TrigramIndex

/** The fourteenth maintainer ([[TrigramMaintainer]], q184): the
  * substring postings index maintained per batch. Pinned: streamed
  * extends ≡ one-shot build (serve equality over patterns whose
  * matches span batch boundaries), unledgered replay converges on
  * CONTENT for both stores (postings idempotent by key; df recounted,
  * never additively folded), ledgered replay is a version-level no-op,
  * and foreachBatch + checkpoint restart; the regex serve works from
  * the maintained store. */
class TrigramMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import TrigramMaintainSpec._

  private val base = Seq(
    Doc(1L, "the quick brown fox jumps"),
    Doc(2L, "a slow red panda sleeps"))
  private val batch1 = Seq(
    Doc(3L, "quick brown foxes are rare"),
    Doc(4L, "the quick red panda jumps"))
  private val batch2 = Seq(Doc(5L, "brown bread and red wine"))
  private val corpus = base ++ batch1 ++ batch2
  private val pats = Seq("quick brown", "red panda", "brown", "purple cow")

  private def servePairs(m: TrigramMaintainer): Set[(String, Long)] =
    m.serve(pats.toDF("query"), corpus.toDF())
      .as[(String, Long)].collect().toSet

  private val expected: Set[(String, Long)] = corpus.flatMap(d =>
    pats.filter(d.text.contains).map(_ -> d.doc_id)).toSet

  test("streamed extends serve the one-shot contract; replay converges with and without the ledger") {
    val dir = java.nio.file.Files.createTempDirectory("graft-tm").toString
    val m = new TrigramMaintainer(spark, s"$dir/idx")
    m.bootstrap(base.toDF())
    m.ingestBatch(batch1.toDF()) // no txnId: ledger skip unavailable
    def postSnap(): Set[(Long, String)] =
      UpsertStore.read(spark, s"$dir/idx").get
        .select("doc_id", "gram").as[(Long, String)].collect().toSet
    def dfSnap(): Set[(String, Long)] =
      UpsertStore.read(spark, s"$dir/idx__df").get
        .select("gram", "df").as[(String, Long)].collect().toSet
    val (p1, d1) = (postSnap(), dfSnap())
    m.ingestBatch(batch1.toDF()) // unledgered replay: content must converge
    assert(postSnap() == p1, "replayed batch changed the postings store")
    assert(dfSnap() == d1, "replayed batch drifted the df store — recount not replay-exact")
    m.ingestBatch(batch2.toDF(), Some(1L))
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    m.ingestBatch(batch2.toDF(), Some(1L)) // ledgered replay: version-level no-op
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "ledgered replay advanced the postings store")
    assert(servePairs(m) == expected, s"maintained serve: ${servePairs(m)}")
    // one-shot reference over the same corpus
    TrigramIndex.build(spark, corpus.toDF(), s"$dir/ref")
    val ref = TrigramIndex.search(spark, s"$dir/ref", pats.toDF("query"), corpus.toDF())
      .as[(String, Long)].collect().toSet
    assert(ref == expected, s"one-shot reference: $ref")
    // df must equal true posting-list lengths after the whole lifecycle
    val dfTrue = UpsertStore.read(spark, s"$dir/idx").get
      .groupBy("gram").count().select("gram", "count")
      .as[(String, Long)].collect().toSet
    assert(dfSnapAfter(dir) == dfTrue, "df store diverged from posting-list lengths")
  }

  private def dfSnapAfter(dir: String): Set[(String, Long)] =
    UpsertStore.read(spark, s"$dir/idx__df").get
      .select("gram", "df").as[(String, Long)].collect().toSet

  test("foreachBatch wiring + checkpoint restart: serve (incl. regex) equals the from-scratch build") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-tm-fb").toString
    val m = new TrigramMaintainer(spark, s"$dir/idx")
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
      s"post-restart trigram serve diverged: ${servePairs(m)}")
    val rx = m.serveRegex(Seq("quick (brown|red)"), corpus.toDF())
      .as[(String, Long)].collect().toSet
    val rxTruth = corpus.filter(d => d.text.matches(".*quick (brown|red).*"))
      .map(d => ("quick (brown|red)", d.doc_id)).toSet
    assert(rx == rxTruth, s"maintained regex serve diverged: $rx vs $rxTruth")
  }
}

object TrigramMaintainSpec {
  case class Doc(doc_id: Long, text: String)
}
