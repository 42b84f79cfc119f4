package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The embedding-producer seam (VERDICT r12 #6) beyond what q162's
  * oracle proves: the batched encode must be BATCH-SIZE INVARIANT
  * (production tunes batch size to the accelerator without changing
  * results), and the produced embedding column must feed the stored
  * ANN index unchanged — exhaustive-probe IVF over produced embeddings
  * must reproduce the brute-force ranking exactly (nProbe = #cells
  * makes IVF lossless, so any divergence is a plumbing bug, not
  * recall). */
class MultimodalEmbedSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  private val sf = "/root/testdata/sf0.001"

  test("batched encode is batch-size invariant and fixed-dim") {
    val ds = Multimodal.assets(spark, sf)
    def embMap(bs: Int) =
      Multimodal.embedAssets(ds, Multimodal.HashProjectionEmbedder, bs)
        .collect().map(e => e.vec_id -> e.emb.toSeq).toMap
    val small = embMap(3)
    val large = embMap(64)
    assert(small == large, "embedding must not depend on batch boundaries")
    assert(small.nonEmpty && small.values.forall(_.size == 8))
  }

  test("produced embeddings feed VectorIndex: exhaustive-probe IVF equals brute force") {
    val emb = Multimodal
      .embedAssets(Multimodal.assets(spark, sf), Multimodal.HashProjectionEmbedder)
      .toDF().select(col("vec_id"), col("emb").as("embedding"))
    val store = graft.Scratch.dir("graft-asset-ivf") + "/index"
    val ivf = VectorIndex.searchStored(spark, emb, s"$sf#assets",
        col("vec_id") < 5, centroids = 4, nProbe = 4, k = 3,
        pathOverride = Some(store))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Multimodal.q162AssetEmbeddings.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute,
      s"missing=${(brute -- ivf).take(5)} extra=${(ivf -- brute).take(5)}")
  }

  test("streamed embed maintainer across a checkpoint restart equals one-shot brute force") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val all = Multimodal.assets(spark, sf).collect().sortBy(_.doc_id)
    val cut = all((all.length * 0.8).toInt - 1).doc_id
    val (boot, rest) = all.partition(_.doc_id <= cut)
    val (b1, b2) = rest.splitAt(rest.length / 2)

    val dir = java.nio.file.Files.createTempDirectory("graft-embed-maint").toString
    val em = new graft.streaming.AssetEmbedMaintainer(
      spark, sf, s"$dir/index", Multimodal.HashProjectionEmbedder, centroids = 4)
    em.bootstrap(spark.createDataset(boot.toIndexedSeq))

    val in = MemoryStream[Multimodal.Asset]
    val q1 = em.run(in.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    in.addData(b1.toIndexedSeq: _*)
    q1.processAllAvailable()
    q1.stop()
    // simulated crash/deploy → restart on the same checkpoint
    val q2 = em.run(in.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    in.addData(b2.toIndexedSeq: _*)
    q2.processAllAvailable()
    q2.stop()

    val streamed = em.searchMembers(col("vec_id") < 5, nProbe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = Multimodal.q162AssetEmbeddings.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed == brute,
      s"missing=${(brute -- streamed).take(5)} extra=${(streamed -- brute).take(5)}")

    // at-least-once replay of a committed batch is a no-op
    em.ingestBatch(spark.createDataset(b2.toIndexedSeq), Some(1L))
    val replayed = em.searchMembers(col("vec_id") < 5, nProbe = 4, k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(replayed == brute, "replayed committed batch must not change the serve")
  }
}
