package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.streaming.UpsertStore

/** Materialize-once pair graph: compute → persist → reuse, with the
  * corpus-fingerprint gate that keeps a stale graph from ever being
  * served (VERDICT r6 #2). */
class PairGraphSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("pairgraph_spec").toString
    s"$d/store"
  }

  test("stored pairs equal the direct computation, and the second call reuses the table") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    val direct = Dedup.exactNearDupPairs(docs, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val first = PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(first == direct, "persistence roundtrip must be invisible")
    val v1 = UpsertStore.latestVersion(spark, path)
    assert(v1.nonEmpty, "first call must materialize the store")
    val second = PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(second == direct)
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "matching fingerprint must NOT rewrite the store")
  }

  test("corpus change flips the fingerprint and forces a recompute") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
    val v1 = UpsertStore.latestVersion(spark, path).get

    // same doc_ids, one text changed: a stale graph would still "fit"
    // structurally — only the fingerprint can catch it
    val mutated = docs.withColumn("text",
      when($"doc_id" === docs.agg(min("doc_id")).head().getLong(0),
        concat($"text", lit(" MUTATED TAIL TOKENS"))).otherwise($"text"))
    val (n1, h1) = PairGraph.corpusFingerprint(docs)
    val (n2, h2) = PairGraph.corpusFingerprint(mutated)
    assert(n1 == n2 && h1 != h2, "fingerprint must move on content change")

    PairGraph.pairGraph(spark, mutated, sf, 0.6, Some(path))
    assert(UpsertStore.latestVersion(spark, path).get > v1,
      "fingerprint mismatch must rewrite the store")
  }

  test("incremental extend equals the from-scratch graph over the grown corpus") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    // split the corpus: first 80% is the "old" corpus, rest arrives later
    val cut = docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong
    val old = docs.filter($"doc_id" <= cut)
    val delta = docs.filter($"doc_id" > cut)
    assert(delta.count() > 0 && old.count() > 0)

    PairGraph.pairGraph(spark, old, sf, 0.6, Some(path))
    PairGraph.extend(spark, delta, sf, 0.6, Some(path))

    val viaExtend = PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
    val v1 = UpsertStore.latestVersion(spark, path)
    val stored = viaExtend
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    // serving the grown corpus hit the advanced fingerprint — no rewrite
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "extend must leave the store fingerprint-current for the grown corpus")
    val scratch = Dedup.exactNearDupPairs(docs, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(stored == scratch,
      s"extend diverged from scratch: missing=${(scratch -- stored).take(5)} " +
        s"extra=${(stored -- scratch).take(5)}")
  }

  test("extend refuses a mismatched tau and a missing store") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    intercept[RuntimeException] {
      PairGraph.extend(spark, docs, sf, 0.6, Some(path))
    }
    PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
    intercept[IllegalArgumentException] {
      PairGraph.extend(spark, docs.limit(1), sf, 0.7, Some(path))
    }
  }

  test("fingerprint is order- and partitioning-independent") {
    val docs = Tables.documents(spark, sf)
    val a = PairGraph.corpusFingerprint(docs)
    val b = PairGraph.corpusFingerprint(docs.repartition(7).sortWithinPartitions(desc("doc_id")))
    assert(a == b)
  }
}
