package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.operators.VectorIndex

/** Continuous ANN-index maintenance: streamed batches converge to the
  * from-scratch index, replays are guarded, and retrieval serves from
  * the stored cells ([[VectorIndexMaintainer]]). */
class VectorIndexMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._
  import VectorIndexMaintainSpec.Vec

  /** Deterministic 8-dim synthetic vector: id i concentrates mass on
    * component i % 8, so nearest neighbors are ids congruent mod 8. */
  private def vec(id: Long): Array[Float] = {
    val a = Array.fill(8)(0.05f + (id % 3) * 0.01f)
    a((id % 8).toInt) = 1.0f
    a
  }
  private def batchDf(ids: Long*) =
    ids.map(i => (i, vec(i))).toDF("vec_id", "embedding")

  test("streamed batches converge to the from-scratch index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vimaint").toString
    val emb = Tables.embeddings(spark, sf)
    val ids = emb.select("vec_id").as[Long].collect().sorted
    val (cut1, cut2) = (ids(ids.length * 6 / 10), ids(ids.length * 8 / 10))
    val m = new VectorIndexMaintainer(spark, sf, s"$dir/store")
    m.bootstrap(emb.filter($"vec_id" <= cut1))
    m.ingestBatch(emb.filter($"vec_id" > cut1 && $"vec_id" <= cut2)
      .select("vec_id", "embedding"))
    m.ingestBatch(emb.filter($"vec_id" > cut2).select("vec_id", "embedding"))
    val streamed = UpsertStore.read(spark, s"$dir/store").get
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    val scratchDir = java.nio.file.Files.createTempDirectory("graft-vimaint-s").toString
    val scratch = VectorIndex.index(spark, emb, sf, pathOverride = Some(s"$scratchDir/store"))
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(streamed == scratch,
      s"missing=${(scratch -- streamed).take(5)} extra=${(streamed -- scratch).take(5)}")
    // and a full-corpus gated serve after streamed ingest hits the gate
    val v = UpsertStore.latestVersion(spark, s"$dir/store")
    VectorIndex.index(spark, emb, sf, pathOverride = Some(s"$dir/store")).count()
    assert(UpsertStore.latestVersion(spark, s"$dir/store") == v,
      "full-corpus serve after streamed ingest must hit the gate, not rebuild")
  }

  test("replays are skipped by the txn ledger and the id guard") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vimaint-rp").toString
    val m = new VectorIndexMaintainer(spark, "memtest-vi", s"$dir/store", centroids = 4)
    m.bootstrap(batchDf(1L to 8L: _*))

    // id-guard path (no txnId): same batch twice — second is a no-op
    m.ingestBatch(batchDf(10L))
    val v1 = UpsertStore.latestVersion(spark, s"$dir/store")
    m.ingestBatch(batchDf(10L))
    assert(UpsertStore.latestVersion(spark, s"$dir/store") == v1,
      "replayed batch (all ids indexed) must not touch the store")

    // txn-ledger path: same txnId twice — skipped without reading cells
    m.ingestBatch(batchDf(20L), txnId = Some(7L))
    val v2 = UpsertStore.latestVersion(spark, s"$dir/store")
    m.ingestBatch(batchDf(20L), txnId = Some(7L))
    assert(UpsertStore.latestVersion(spark, s"$dir/store") == v2,
      "replayed txnId must be skipped by the ledger")

    // a NEW txn still applies, and the grown index serves via the gate
    m.ingestBatch(batchDf(30L), txnId = Some(8L))
    val all = batchDf((1L to 8L) ++ Seq(10L, 20L, 30L): _*)
    val v3 = UpsertStore.latestVersion(spark, s"$dir/store")
    VectorIndex.index(spark, all, "memtest-vi", centroids = 4,
      pathOverride = Some(s"$dir/store")).count()
    assert(UpsertStore.latestVersion(spark, s"$dir/store") == v3,
      "fingerprint must match after ledgered ingests")
  }

  test("search serves external queries from the maintained index") {
    val dir = java.nio.file.Files.createTempDirectory("graft-vimaint-q").toString
    val m = new VectorIndexMaintainer(spark, "memtest-vi2", s"$dir/store", centroids = 4)
    m.bootstrap(batchDf(1L to 12L: _*))
    m.ingestBatch(batchDf(21L))
    // query with vec(21)'s own direction: the just-ingested vector must
    // be its top-1 (cosine 1.0 with itself beats every other id)
    val queries = Seq((100L, vec(21L))).toDF("query_id", "qe")
    val top1 = m.search(queries, nProbe = 3, k = 1)
      .select("neighbor_id").as[Long].head()
    assert(top1 == 21L, s"expected the ingested vector as top-1, got $top1")
  }

  test("foreachBatch wiring keeps the index current") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-vimaint-fb").toString
    val m = new VectorIndexMaintainer(spark, "memtest-vi3", s"$dir/store", centroids = 4)
    m.bootstrap(batchDf(1L to 8L: _*))
    val input = MemoryStream[Vec]
    val q = m.run(input.toDF(), s"$dir/ckpt", trigger = Trigger.ProcessingTime(0))
    input.addData(Vec(10, new Timestamp(1000), vec(10L)))
    q.processAllAvailable()
    input.addData(Vec(11, new Timestamp(2000), vec(11L)))
    q.processAllAvailable()
    q.stop()
    val cells = UpsertStore.read(spark, s"$dir/store").get
      .select("vec_id").as[Long].collect().toSet
    assert(cells == ((1L to 8L).toSet ++ Set(10L, 11L)), s"got $cells")
  }
}

object VectorIndexMaintainSpec {
  case class Vec(vec_id: Long, ts: Timestamp, embedding: Array[Float])
}
