package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.streaming.UpsertStore

/** Materialized product-quantization index: train → encode → persist →
  * serve, with the corpus-fingerprint gate, codebook pinning on
  * extend, and the txn replay ledger (the [[VectorIndex]] discipline
  * on the compressed representation). */
class PqIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("pq_spec").toString + "/store"

  private def searchSet(path: String) =
    PqIndex.search(spark, emb, path, col("vec_id") < 5)
      .as[(Long, Long, Long)].collect().toSeq

  test("stored serve equals q119's recompute, and a repeat serve hits the gate") {
    val path = freshDir()
    PqIndex.ensure(spark, emb, path)
    val direct = Similarity.q119AnnPq.fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    assert(searchSet(path) == direct,
      "stored PQ serve must match the from-scratch q119 output")
    val v1 = UpsertStore.latestVersion(spark, path)
    PqIndex.ensure(spark, emb, path)
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "matching fingerprint must NOT retrain/re-encode")
  }

  test("extend encodes the delta against PINNED codebooks and serves the grown corpus") {
    val path = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    PqIndex.ensure(spark, emb.filter($"vec_id" <= cut), path)
    val cbBefore = UpsertStore.read(spark, s"${path}__codebooks").get
      .orderBy("m", "cid").collect().toSeq
    PqIndex.extend(spark, emb.filter($"vec_id" > cut), path)
    val cbAfter = UpsertStore.read(spark, s"${path}__codebooks").get
      .orderBy("m", "cid").collect().toSeq
    assert(cbBefore == cbAfter, "extend must never move codebooks")
    // grown index serves through the gate (fingerprint advanced), and
    // every corpus vector has exactly one stored code row
    val served = PqIndex.ensure(spark, emb, path)
    assert(served.count() == emb.count())
    // the lifecycle output stays recall-1.0 (the q123 oracle contract)
    assert(searchSet(path) ==
      Similarity.q50AnnBruteForce.fn(spark, sf).as[(Long, Long, Long)].collect().toSeq)
  }

  test("committed-txn replay self-skips; a changed corpus misses the gate") {
    val path = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    PqIndex.ensure(spark, emb.filter($"vec_id" <= cut), path)
    PqIndex.extend(spark, emb.filter($"vec_id" > cut), path, txnId = Some(7L))
    val v = UpsertStore.latestVersion(spark, path)
    PqIndex.extend(spark, emb.filter($"vec_id" > cut), path, txnId = Some(7L))
    assert(UpsertStore.latestVersion(spark, path) == v,
      "replay of a committed txn must be a no-op")
    // mutate one vector: the gate must force a rebuild, never serve stale
    val mutated = emb.withColumn("emb",
      when($"vec_id" === 0L, expr("transform(emb, x -> x + 1.0d)")).otherwise($"emb"))
    val metaBefore = UpsertStore.read(spark, s"${path}__meta").get.head()
    PqIndex.ensure(spark, mutated, path)
    val metaAfter = UpsertStore.read(spark, s"${path}__meta").get.head()
    assert(metaBefore.getAs[Long]("corpus_h") != metaAfter.getAs[Long]("corpus_h"),
      "changed corpus must rebuild (fingerprint must differ)")
  }

  test("extend without a built index fails loudly") {
    val e = intercept[RuntimeException] {
      PqIndex.extend(spark, emb.limit(3), freshDir())
    }
    assert(e.getMessage.contains("run ensure first"))
  }
}
