package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.streaming.UpsertStore

/** The IVF-PQ composed index (q182): coarse cells + PQ codes in one
  * stored row, served probe → ADC → exact re-rank. Pins the
  * composition contract — the serve equals brute force through BOTH
  * prunings across the build/extend lifecycle, the side tables never
  * move on extend, and the crash/replay discipline is [[PqIndex]]'s. */
class IvfPqIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("ivfpq_spec").toString + "/store"

  private def searchSet(path: String, nProbe: Int = 10) =
    IvfPqIndex.search(spark, emb, path, col("vec_id") < 5, nProbe = nProbe)
      .as[(Long, Long, Long)].collect().toSeq

  private lazy val brute =
    Similarity.q50AnnBruteForce.fn(spark, sf).as[(Long, Long, Long)].collect().toSeq

  test("composed serve equals brute force at nProbe=10 AND exhaustive nProbe; gate skips rebuild") {
    val path = freshDir()
    IvfPqIndex.ensure(spark, emb, path)
    assert(searchSet(path) == brute,
      "IVF-PQ serve at the q96-pinned nProbe must match brute force")
    assert(searchSet(path, nProbe = 16) == brute,
      "exhaustive probe must match brute force (losslessness baseline)")
    // every corpus vector holds exactly one composed row with 8 codes
    val stored = UpsertStore.read(spark, path).get
    assert(stored.count() == emb.count())
    assert(stored.select(size(col("codes"))).distinct().as[Int].collect().toSeq == Seq(8))
    val v1 = UpsertStore.latestVersion(spark, path)
    IvfPqIndex.ensure(spark, emb, path)
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "matching fingerprint must NOT reassign/retrain")
  }

  test("extend pins centroids AND codebooks; the grown lifecycle stays recall-1.0") {
    val path = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    IvfPqIndex.ensure(spark, emb.filter($"vec_id" <= cut), path)
    val centsBefore = UpsertStore.read(spark, s"${path}__centroids").get
      .orderBy("centroid_id").collect().toSeq
    val booksBefore = UpsertStore.read(spark, s"${path}__codebooks").get
      .orderBy("m", "cid").collect().toSeq
    IvfPqIndex.extend(spark, emb.filter($"vec_id" > cut), path)
    assert(UpsertStore.read(spark, s"${path}__centroids").get
      .orderBy("centroid_id").collect().toSeq == centsBefore,
      "extend must never move coarse centroids")
    assert(UpsertStore.read(spark, s"${path}__codebooks").get
      .orderBy("m", "cid").collect().toSeq == booksBefore,
      "extend must never move PQ codebooks")
    assert(UpsertStore.read(spark, path).get.count() == emb.count())
    assert(searchSet(path) == brute,
      "the extended lifecycle must stay recall-1.0 vs brute force")
  }

  test("delta assignment matches what a member of the base corpus would get") {
    // extend ≡ scratch at the ASSIGNMENT level: the same vector folded
    // in later must land in the same cell the base build gives it
    // (deterministic seed centroids + tie rule — the VectorIndex
    // contract carried over)
    val pathAll = freshDir(); val pathInc = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    IvfPqIndex.ensure(spark, emb, pathAll)
    IvfPqIndex.ensure(spark, emb.filter($"vec_id" <= cut), pathInc)
    IvfPqIndex.extend(spark, emb.filter($"vec_id" > cut), pathInc)
    val cellsAll = UpsertStore.read(spark, pathAll).get
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    val cellsInc = UpsertStore.read(spark, pathInc).get
      .select("vec_id", "cell").as[(Long, Long)].collect().toMap
    assert(cellsAll == cellsInc,
      "delta cell assignment must equal the from-scratch assignment")
  }

  test("committed-txn replay self-skips; changed corpus misses the gate; extend-first fails loudly") {
    val path = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    IvfPqIndex.ensure(spark, emb.filter($"vec_id" <= cut), path)
    IvfPqIndex.extend(spark, emb.filter($"vec_id" > cut), path, txnId = Some(7L))
    val v = UpsertStore.latestVersion(spark, path)
    IvfPqIndex.extend(spark, emb.filter($"vec_id" > cut), path, txnId = Some(7L))
    assert(UpsertStore.latestVersion(spark, path) == v,
      "replay of a committed txn must be a no-op")
    val mutated = emb.withColumn("emb",
      when($"vec_id" === 0L, expr("transform(emb, x -> x + 1.0d)")).otherwise($"emb"))
    val metaBefore = UpsertStore.read(spark, s"${path}__meta").get.head()
    IvfPqIndex.ensure(spark, mutated, path)
    val metaAfter = UpsertStore.read(spark, s"${path}__meta").get.head()
    assert(metaBefore.getAs[Long]("corpus_h") != metaAfter.getAs[Long]("corpus_h"),
      "changed corpus must rebuild (fingerprint must differ)")
    val e = intercept[RuntimeException] {
      IvfPqIndex.extend(spark, emb.limit(3), freshDir())
    }
    assert(e.getMessage.contains("run ensure first"))
  }
}
