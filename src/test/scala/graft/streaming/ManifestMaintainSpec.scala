package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.Dedup

/** The streaming training-manifest maintainer (VERDICT r12 #2): the
  * composed gate→cluster→facts→manifest refresh must produce, at any
  * serve point, EXACTLY what q156's one-shot computes over the history
  * ingested so far — across a checkpoint restart, with mid-stream
  * reads current to the committed batch, and replay-safe under
  * at-least-once delivery. The corpus plants every interesting
  * transition: an exact dup of a bootstrap doc arriving streamed, a
  * near-dup joining a bootstrap cluster, a post-restart doc GROWING a
  * streamed cluster, and a clean streamed doc that must be PROMOTED to
  * representative because its min-id bootstrap twin fails quality. */
class ManifestMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val tA = (1 to 30).map(i => s"a$i")
  private val textA = tA.mkString(" ")
  private def variantA(keep: Int, tag: String) =
    (tA.take(keep) ++ (keep + 1 to 30).map(i => s"$tag$i")).mkString(" ")
  private val textC = (1 to 30).map(i => s"c$i").mkString(" ")
  private val lowDiv = Seq.fill(30)("x").mkString(" ")
  // min-id member fails quality (13-char tokens → token_len_outlier);
  // its streamed near-dup is clean → promotion must happen mid-stream
  private val tE = (1 to 30).map(i => f"e$i%02dxxxxxxxxxx")
  private val textE = tE.mkString(" ")
  private val nearE = (tE.take(26) ++ (1 to 4).map(i => s"y$i")).mkString(" ")

  private val bootstrapDocs = Seq(
    1L -> textA, 2L -> textC, 3L -> lowDiv, 4L -> textE)
  private val batch1 = Seq(10L -> variantA(26, "x"), 11L -> textC, 12L -> nearE)
  private val batch2 =
    Seq(13L -> variantA(24, "y"), 14L -> (1 to 30).map(i => s"q$i").mkString(" "))

  private def docsDf(docs: Seq[(Long, String)]) =
    docs.map { case (i, t) => (i, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  private def writeCorpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("manifest-maint").toString
    docsDf(docs).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("streamed manifest across a checkpoint restart equals q156's one-shot") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-mm").toString
    val mm = new ManifestMaintainer(spark, "mm-spec", s"$dir/store")
    mm.bootstrap(docsDf(bootstrapDocs).select("doc_id", "text"))
    val in = MemoryStream[StreamingOpsSpec.Doc]
    val q1 = mm.run(in.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    in.addData(batch1.map { case (i, t) =>
      StreamingOpsSpec.Doc(i, new Timestamp(i * 100), t) }: _*)
    q1.processAllAvailable()

    // mid-stream serve: batch-1 decisions already visible and final
    val mid = mm.current.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(mid(10L) == "near_dup" && mid(11L) == "exact_dup",
      s"mid-stream manifest must already adjudicate batch 1: $mid")
    assert(mid(12L) == "kept" && mid(4L) == "token_len_outlier",
      s"streamed clean member must be promoted over its dirty min-id twin: $mid")

    // simulated crash/deploy → restart on the same checkpoint
    q1.stop()
    val q2 = mm.run(in.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    in.addData(batch2.map { case (i, t) =>
      StreamingOpsSpec.Doc(i, new Timestamp(i * 100), t) }: _*)
    q2.processAllAvailable()
    q2.stop()

    val fullDir = writeCorpus(bootstrapDocs ++ batch1 ++ batch2)
    val streamed = mm.current.collect().map(r =>
      (r.getLong(0), r.getBoolean(1), r.getString(2), r.getString(3))).toSet
    val oneShot = Dedup.q156TrainingManifest.fn(spark, fullDir).collect().map(r =>
      (r.getLong(0), r.getBoolean(1), r.getString(2), r.getString(3))).toSet
    assert(streamed == oneShot,
      s"missing=${(oneShot -- streamed).take(5)} extra=${(streamed -- oneShot).take(5)}")
  }

  test("replay guard: re-ingesting a committed batch leaves the manifest unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mm-replay").toString
    val mm = new ManifestMaintainer(spark, "mm-replay", s"$dir/store")
    mm.bootstrap(docsDf(bootstrapDocs).select("doc_id", "text"))
    val b = docsDf(batch1).select("doc_id", "text")
    mm.ingestBatch(b, Some(0L))
    val before = mm.current.collect().map(_.toSeq).toSet
    mm.ingestBatch(b, Some(0L)) // at-least-once delivery replays the batch
    assert(mm.current.collect().map(_.toSeq).toSet == before,
      "replayed committed batch must be a no-op")
  }
}
