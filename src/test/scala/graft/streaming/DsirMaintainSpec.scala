package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** q166's maintainer ([[DsirMaintainer]]): the additive count merge is
  * NOT idempotent, so the txn-ledgered upsert is load-bearing —
  * streamed models must equal the one-shot models (the q165 ≡ q166
  * contract the driver hash-checks at corpus scale), replays must not
  * double-count, and a checkpoint restart must resume without losing
  * or doubling a batch. */
class DsirMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import DsirMaintainSpec._

  private val corpus = Seq(
    Doc(1, "en", "the cat sat on the mat"),
    Doc(2, "en", "the dog ate the bone"),
    Doc(3, "fr", "le chat et le chien"),
    Doc(4, "fr", "le pain et la mer"),
    Doc(5, "en", "a cat and a dog"),
    Doc(6, "de", "der hund und die katze"))

  private def served(m: DsirMaintainer): Seq[(Long, Long, Double, Boolean)] =
    m.serve(corpus.toDF()).as[(Long, Long, Double, Boolean)].collect().toSeq

  private def oneShot(dir: String): Seq[(Long, Long, Double, Boolean)] = {
    val ref = new DsirMaintainer(spark, s"$dir/ref")
    ref.bootstrap(corpus.toDF())
    served(ref)
  }

  test("dsir maintainer: streamed counts equal the one-shot models; replay is add-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-m").toString
    val m = new DsirMaintainer(spark, s"$dir/c")
    m.bootstrap(corpus.take(3).toDF())
    m.ingestBatch(corpus.slice(3, 5).toDF(), txnId = Some(0L))
    // REPLAY with the same txn: the additive merge must be skipped
    // outright and the store version must not advance
    val v = UpsertStore.latestVersion(spark, s"$dir/c")
    m.ingestBatch(corpus.slice(3, 5).toDF(), txnId = Some(0L))
    assert(UpsertStore.latestVersion(spark, s"$dir/c") == v)
    m.ingestBatch(corpus.drop(5).toDF(), txnId = Some(1L))
    assert(served(m) == oneShot(dir),
      "streamed DSIR models diverged from the one-shot bootstrap")
  }

  test("dsir maintainer: selection flags are target-language coherent on a separable corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-s").toString
    val m = new DsirMaintainer(spark, s"$dir/c")
    m.bootstrap(corpus.toDF())
    val flags = served(m).map(r => r._1 -> r._4).toMap
    // stopword-disjoint languages: every en doc scores target-like,
    // every fr/de doc raw-like — the sign the importance weight exists
    // to produce
    assert(Seq(1L, 2L, 5L).forall(flags(_)), s"en docs not selected: $flags")
    assert(Seq(3L, 4L, 6L).forall(!flags(_)), s"non-en docs selected: $flags")
  }

  test("dsir maintainer foreachBatch wiring + checkpoint restart: nothing lost, nothing doubled") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-dsir-fb").toString
    val m = new DsirMaintainer(spark, s"$dir/c")
    m.bootstrap(corpus.take(2).toDF())
    val input = MemoryStream[Doc]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(corpus.slice(2, 4): _*)
    q.processAllAvailable()
    // simulated crash/deploy: stop, restart on the SAME checkpoint
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(corpus.drop(4): _*)
    q2.processAllAvailable()
    q2.stop()
    assert(served(m) == oneShot(dir),
      "post-restart DSIR models must equal the from-scratch bootstrap over history + every batch")
  }
}

object DsirMaintainSpec {
  case class Doc(doc_id: Long, lang: String, text: String)
}
