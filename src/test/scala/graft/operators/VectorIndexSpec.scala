package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.streaming.UpsertStore

/** Materialized ANN vector index: assign → persist → serve, with the
  * corpus-fingerprint gate and the delta-sized extend path (the
  * [[PairGraph]] discipline applied to the embedding store). */
class VectorIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("vindex_spec").toString
    s"$d/store"
  }

  test("stored search equals ivfSearch, and the second serve reuses the table") {
    val emb = Tables.embeddings(spark, sf)
    val path = freshDir()
    val direct = Similarity.ivfSearch(emb, col("vec_id") < 5)
      .as[(Long, Long, Long)].collect().toSeq
    val first = VectorIndex.searchStored(spark, emb, sf, col("vec_id") < 5,
      pathOverride = Some(path)).as[(Long, Long, Long)].collect().toSeq
    assert(first == direct, "stored-index search must match the from-scratch IVF path")
    val v1 = UpsertStore.latestVersion(spark, path)
    assert(v1.nonEmpty, "first serve must materialize the assignment table")
    val second = VectorIndex.searchStored(spark, emb, sf, col("vec_id") < 5,
      pathOverride = Some(path)).as[(Long, Long, Long)].collect().toSeq
    assert(second == direct)
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "matching fingerprint must NOT rewrite the store")
  }

  test("extend equals from-scratch build over the grown corpus") {
    val emb = Tables.embeddings(spark, sf)
    val path = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    VectorIndex.index(spark, emb.filter($"vec_id" <= cut), sf, pathOverride = Some(path))
    VectorIndex.extend(spark, emb.filter($"vec_id" > cut), sf, pathOverride = Some(path))
    val incremental = VectorIndex.index(spark, emb, sf, pathOverride = Some(path))
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    val scratch = VectorIndex.index(spark, emb, sf, pathOverride = Some(freshDir()))
      .select($"vec_id", $"cell").as[(Long, Long)].collect().toSet
    assert(incremental == scratch,
      s"missing=${(scratch -- incremental).take(5)} extra=${(incremental -- scratch).take(5)}")
  }

  test("extend advances the fingerprint so the grown corpus serves through the gate") {
    val emb = Tables.embeddings(spark, sf)
    val path = freshDir()
    val cut = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    VectorIndex.index(spark, emb.filter($"vec_id" <= cut), sf, pathOverride = Some(path))
    VectorIndex.extend(spark, emb.filter($"vec_id" > cut), sf, pathOverride = Some(path))
    val v = UpsertStore.latestVersion(spark, path)
    VectorIndex.index(spark, emb, sf, pathOverride = Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path) == v,
      "full-corpus serve after extend must hit the gate, not rebuild")
  }

  test("a changed corpus misses the gate and rebuilds; the old index is never served") {
    val emb = Tables.embeddings(spark, sf).limit(50).cache()
    val path = freshDir()
    VectorIndex.index(spark, emb, sf, pathOverride = Some(path))
    val v1 = UpsertStore.latestVersion(spark, path)
    // mutate one vector IN PLACE (same ids, same count — only the hash
    // can catch it)
    val mutated = emb.withColumn("embedding",
      when($"vec_id" === 3L, reverse($"embedding")).otherwise($"embedding"))
    val cells = VectorIndex.index(spark, mutated, sf, pathOverride = Some(path))
    assert(UpsertStore.latestVersion(spark, path) != v1,
      "fingerprint mismatch must rebuild the store")
    // and the rebuilt index reflects the mutated vector's row
    assert(cells.filter($"vec_id" === 3L).count() == 1)
    emb.unpersist()
  }

  test("extend without a built index fails loudly") {
    val emb = Tables.embeddings(spark, sf).limit(10)
    val e = intercept[RuntimeException] {
      VectorIndex.extend(spark, emb, sf, pathOverride = Some(freshDir()))
    }
    assert(e.getMessage.contains("run index first"))
  }

  test("centroid-count mismatch on extend fails loudly") {
    val emb = Tables.embeddings(spark, sf).limit(50)
    val path = freshDir()
    VectorIndex.index(spark, emb, sf, centroids = 8, pathOverride = Some(path))
    val e = intercept[IllegalArgumentException] {
      VectorIndex.extend(spark, emb, sf, centroids = 16, pathOverride = Some(path))
    }
    assert(e.getMessage.contains("centroids"))
  }
}
