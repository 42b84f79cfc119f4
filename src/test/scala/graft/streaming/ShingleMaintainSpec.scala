package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.ShingleIndex

/** Continuous contamination-index maintenance: streamed train batches
  * converge to the from-scratch index, replays are guarded, and eval
  * adjudication serves mid-stream ([[ShingleMaintainer]]). */
class ShingleMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import ShingleMaintainSpec.Doc

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")
  private val leaked = "a b c d e f g h i j"
  private def uniqueText(i: Long) = (1 to 10).map(t => s"u${i}x$t").mkString(" ")

  test("streamed train batches converge to the from-scratch index; adjudication is current") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shmaint").toString
    val m = new ShingleMaintainer(spark, s"$dir/idx")
    m.bootstrap(docsDf((1L to 4L).map(i => i -> uniqueText(i)): _*))
    // before the leaked doc enters training, the eval doc is clean
    val eval = docsDf(100L -> leaked)
    assert(m.adjudicate(eval).isEmpty, "no contamination before ingest")

    m.ingestBatch(docsDf(5L -> uniqueText(5L)), txnId = Some(0L))
    m.ingestBatch(docsDf(6L -> leaked), txnId = Some(1L))
    val out = m.adjudicate(eval).as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((100L, 1L, 3L)), s"got $out")

    // streamed state ≡ from-scratch over the same final corpus
    val scratchDir = java.nio.file.Files.createTempDirectory("graft-shmaint-s").toString
    ShingleIndex.ensure(spark,
      docsDf(((1L to 5L).map(i => i -> uniqueText(i)) :+ (6L -> leaked)): _*),
      s"$scratchDir/idx")
    val scratch = ShingleIndex.probe(spark, s"$scratchDir/idx", eval)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == scratch, s"streamed=$out scratch=$scratch")

    // replayed txn is a no-op
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    m.ingestBatch(docsDf(6L -> leaked), txnId = Some(1L))
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "replayed txnId must be skipped by the ledger")
  }

  test("foreachBatch wiring keeps the index current") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-shmaint-fb").toString
    val m = new ShingleMaintainer(spark, s"$dir/idx")
    m.bootstrap(docsDf(1L -> uniqueText(1L)))
    val input = MemoryStream[Doc]
    val q = m.run(input.toDF(), s"$dir/ckpt", trigger = Trigger.ProcessingTime(0))
    input.addData(Doc(10, new Timestamp(1000), leaked))
    q.processAllAvailable()
    q.stop()
    val out = m.adjudicate(docsDf(100L -> leaked))
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((100L, 1L, 3L)), s"got $out")
  }
}

object ShingleMaintainSpec {
  case class Doc(doc_id: Long, ts: Timestamp, text: String)
}
