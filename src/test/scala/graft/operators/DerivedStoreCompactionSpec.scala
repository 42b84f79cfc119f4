package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.UpsertStore

/** Compaction/VACUUM contract for the DERIVED stores (VERDICT r7 #6):
  * perpetual [[PairGraph.extend]]/[[VectorIndex.extend]] upserts append
  * delta dirs to the pair/sigs/cells tables; the same
  * [[UpsertStore]] compaction that bounds the sink's read cost must
  * bound theirs, the fingerprint gate must keep hitting across
  * compactions, and the CDC feed must fail loudly (re-snapshot
  * contract) once a compaction folds per-commit granularity away. */
class DerivedStoreCompactionSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val tA = (1 to 30).map(i => s"a$i")
  private def variant(keep: Int, tag: String) =
    (tA.take(keep) ++ (keep + 1 to 30).map(i => s"$tag$i")).mkString(" ")

  private def deltaDirs(path: String): Int = {
    val d = new java.io.File(path)
    if (!d.exists) 0 else d.listFiles.count(_.getName.startsWith("d="))
  }

  test("N extends compact the pair/sigs stores, the gate still hits, and changesSince fails loudly") {
    val path = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/store"
    var corpus = Seq(1L -> tA.mkString(" "), 2L -> (1 to 30).map(i => s"c$i").mkString(" "))
      .toDF("doc_id", "text")
    PairGraph.pairGraph(spark, corpus, "compact-test", 0.6, Some(path))
    val snapshotVersion = UpsertStore.latestVersion(spark, s"${path}__sigs").get

    // 2×maxDeltas extends: enough upserts that BOTH derived tables must
    // have compacted at least once
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i =>
      val delta = Seq((100L + i) -> variant(20 + i % 8, s"t$i")).toDF("doc_id", "text")
      PairGraph.extend(spark, delta, "compact-test", 0.6, Some(path))
      corpus = corpus.unionByName(delta)
    }
    // read cost stays bounded: never more than maxDeltas live delta dirs
    assert(deltaDirs(s"${path}__sigs") <= UpsertStore.DefaultMaxDeltas,
      s"sigs deltas unbounded: ${deltaDirs(s"${path}__sigs")}")
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"pair deltas unbounded: ${deltaDirs(path)}")
    // compaction GC actually retired history: some early commit of the
    // sigs table is no longer readable
    val readable = UpsertStore.versions(spark, s"${path}__sigs")
    assert(readable.exists(!_._2),
      s"expected GC'd history after $n extends: $readable")

    // the fingerprint gate still hits for the grown corpus
    val v = UpsertStore.latestVersion(spark, path)
    val served = PairGraph.pairGraph(spark, corpus, "compact-test", 0.6, Some(path))
    served.count()
    assert(UpsertStore.latestVersion(spark, path) == v,
      "gate must survive compaction — serve, don't rebuild")
    // and the served graph equals the from-scratch one
    val stored = served.select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val scratch = Dedup.exactNearDupPairs(corpus, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(stored == scratch)

    // CDC across the compaction boundary: per-commit granularity was
    // folded — the feed must tell the consumer to re-snapshot, not
    // silently serve a partial history
    val ex = intercept[IllegalArgumentException] {
      UpsertStore.changesSince(spark, s"${path}__sigs", snapshotVersion).count()
    }
    assert(ex.getMessage.contains("re-snapshot"), ex.getMessage)

    // vacuum reclaims the retired dirs and the gate STILL hits
    val (dirs, logs) = UpsertStore.vacuum(spark, s"${path}__sigs")
    assert(dirs + logs > 0, "vacuum after repeated compaction must reclaim something")
    val v2 = UpsertStore.latestVersion(spark, path)
    PairGraph.pairGraph(spark, corpus, "compact-test", 0.6, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path) == v2)
  }

  test("vector-index extends compact the cell table and the gate survives") {
    def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i % 4) 1f else 0.02f * (i % 5))
    val path = java.nio.file.Files.createTempDirectory("graft-vcompact").toString + "/store"
    var corpus = vecs((0L to 7L).map(i => i -> e(i.toInt)): _*)
    VectorIndex.index(spark, corpus, "vcompact-test", 4, Some(path))
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i =>
      val delta = vecs((100L + i) -> e(i))
      VectorIndex.extend(spark, delta, "vcompact-test", 4, Some(path))
      corpus = corpus.unionByName(delta)
    }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"cell deltas unbounded: ${deltaDirs(path)}")
    val v = UpsertStore.latestVersion(spark, path)
    VectorIndex.index(spark, corpus, "vcompact-test", 4, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path) == v,
      "index gate must survive compaction")
  }
}
