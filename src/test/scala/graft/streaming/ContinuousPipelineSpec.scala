package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.{Dedup, VectorIndex}

/** The END-TO-END continuous pipeline as one declared capability
  * (VERDICT r7 #4): both maintainers — near-dup clusters and the ANN
  * index — bootstrapped from a historical corpus, fed by streaming
  * queries, SERVED mid-stream, then driven through a checkpoint
  * RESTART with more batches. The round-7 pieces existed but were only
  * exercised one at a time; this pins the composed story a production
  * deployment actually runs: ingest never stops, reads stay current to
  * the last committed batch, and a restart resumes from the checkpoint
  * without double-applying or losing a batch (the maintainers' layered
  * replay guards — per-store txn in meta + batch ledger — are what a
  * recovery replays into). */
class ContinuousPipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val tA = (1 to 30).map(i => s"a$i")
  private val textA = tA.mkString(" ")
  private def variant(keep: Int, tag: String) =
    (tA.take(keep) ++ (keep + 1 to 30).map(i => s"$tag$i")).mkString(" ")
  private val textC = (1 to 30).map(i => s"c$i").mkString(" ")

  private def emb(i: Int): Seq[Float] =
    Seq.tabulate(8)(j => if (j == i % 8) 1f else 0.05f * (i % 3))

  test("bootstrap -> stream -> serve mid-stream -> restart -> serve: clusters and index stay current") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-pipeline").toString

    // ---- bootstrap both stores from the historical corpus
    val corpusDocs = Seq(1L -> textA, 2L -> textC).toDF("doc_id", "text")
    val corpusVecs = (0L to 9L).map(i => i -> emb(i.toInt)).toDF("vec_id", "embedding")
    val cm = new ClusterMaintainer(spark, "pipeline-demo", s"$dir/pairs", 0.6)
    val vm = new VectorIndexMaintainer(spark, "pipeline-demo", s"$dir/vindex", 4)
    cm.bootstrap(corpusDocs)
    vm.bootstrap(corpusVecs)

    // ---- phase 1: live ingest on both maintainers
    val docsIn = MemoryStream[StreamingOpsSpec.Doc]
    val vecsIn = MemoryStream[ContinuousPipelineSpec.Vec]
    val qDocs = cm.run(docsIn.toDF(), s"$dir/ckpt-docs", Trigger.ProcessingTime(0))
    val qVecs = vm.run(vecsIn.toDF(), s"$dir/ckpt-vecs", Trigger.ProcessingTime(0))

    docsIn.addData(StreamingOpsSpec.Doc(10L, new Timestamp(1000), variant(26, "x")))
    vecsIn.addData(ContinuousPipelineSpec.Vec(20L, emb(1)))
    qDocs.processAllAvailable()
    qVecs.processAllAvailable()

    // ---- serve MID-STREAM: reads are current to the committed batch
    val midClusters = cm.current.as[(Long, Long)].collect().toSet
    assert(midClusters == Set((1L, 1L), (10L, 1L)),
      s"mid-stream cluster read must already see doc 10: $midClusters")
    val midHits = vm.search(
      Seq(100L -> emb(1)).toDF("query_id", "qe"), nProbe = 4, k = 2)
      .select("neighbor_id").as[Long].collect().toSet
    assert(midHits.contains(20L),
      s"mid-stream index read must already see vec 20: $midHits")

    // ---- stop (simulated crash/deploy), then RESTART from checkpoints
    qDocs.stop(); qVecs.stop()
    val qDocs2 = cm.run(docsIn.toDF(), s"$dir/ckpt-docs", Trigger.ProcessingTime(0))
    val qVecs2 = vm.run(vecsIn.toDF(), s"$dir/ckpt-vecs", Trigger.ProcessingTime(0))
    docsIn.addData(
      StreamingOpsSpec.Doc(11L, new Timestamp(2000), variant(24, "y")),
      StreamingOpsSpec.Doc(12L, new Timestamp(2500), (1 to 30).map(i => s"q$i").mkString(" ")))
    vecsIn.addData(ContinuousPipelineSpec.Vec(21L, emb(2)))
    qDocs2.processAllAvailable()
    qVecs2.processAllAvailable()
    qDocs2.stop(); qVecs2.stop()

    // ---- final state equals the from-scratch computation over
    //      history + every streamed batch (nothing lost, nothing doubled)
    val allDocs = corpusDocs.unionByName(
      Seq(10L -> variant(26, "x"), 11L -> variant(24, "y"),
        12L -> (1 to 30).map(i => s"q$i").mkString(" ")).toDF("doc_id", "text"))
    val finalClusters = cm.current.as[(Long, Long)].collect().toSet
    val scratchClusters = Dedup.clusterAssignments(
      Dedup.exactNearDupPairs(allDocs, 0.6).select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(finalClusters == scratchClusters,
      s"missing=${(scratchClusters -- finalClusters).take(5)} " +
        s"extra=${(finalClusters -- scratchClusters).take(5)}")

    val allVecs = corpusVecs.unionByName(
      Seq(20L -> emb(1), 21L -> emb(2)).toDF("vec_id", "embedding"))
    // the streamed index serves the grown corpus THROUGH the gate —
    // fingerprint current, no rebuild
    val v = UpsertStore.latestVersion(spark, s"$dir/vindex")
    VectorIndex.index(spark, allVecs, "pipeline-demo", 4, Some(s"$dir/vindex")).count()
    assert(UpsertStore.latestVersion(spark, s"$dir/vindex") == v,
      "post-restart index must be fingerprint-current for the full corpus")
    val finalHits = vm.search(
      Seq(101L -> emb(2)).toDF("query_id", "qe"), nProbe = 4, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(finalHits.contains(21L),
      s"post-restart index read must see the post-restart vec 21: $finalHits")
  }
}

object ContinuousPipelineSpec {
  case class Vec(vec_id: Long, embedding: Seq[Float])
}
