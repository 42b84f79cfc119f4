package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.{ClusterMaintainer, UpsertStore, VectorIndexMaintainer}

/** Crash-window discipline of the derived stores (ADVICE r7): every
  * mutation is bracketed dirty-meta → data → clean-meta, so a partial
  * mutation fails the fingerprint gate for EVERY corpus (old and
  * grown) — and extends record the caller's txnId in meta, so a
  * replayed committed batch self-skips instead of double-applying the
  * associative fingerprint advance (the round-7 streaming wedge). */
class CrashDisciplineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/store"

  // corpus texts: A-family are near-dups of each other, C is unrelated
  private val tA = (1 to 30).map(i => s"a$i")
  private val textA = tA.mkString(" ")
  private val textA2 = (tA.take(26) ++ (27 to 30).map(i => s"x$i")).mkString(" ")
  private val textA3 = (tA.take(24) ++ (25 to 30).map(i => s"y$i")).mkString(" ")
  private val textC = (1 to 30).map(i => s"c$i").mkString(" ")

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("pair-graph extend with a txnId is transactionally idempotent") {
    val path = freshDir("crash_txn")
    val old = docs(1L -> textA, 2L -> textC)
    val delta = docs(10L -> textA2)
    PairGraph.pairGraph(spark, old, "crash_txn", 0.6, Some(path))
    PairGraph.extend(spark, delta, "crash_txn", 0.6, Some(path), txnId = Some(5L))
    val meta1 = UpsertStore.read(spark, s"${path}__meta").get.head()
    val v1 = UpsertStore.latestVersion(spark, path)
    // replay of the committed batch: must be a complete no-op — a
    // double-applied extend would add the count twice and XOR the hash
    // back out, wedging every later consistency check
    PairGraph.extend(spark, delta, "crash_txn", 0.6, Some(path), txnId = Some(5L))
    val meta2 = UpsertStore.read(spark, s"${path}__meta").get.head()
    assert(meta1.getAs[Long]("corpus_n") == meta2.getAs[Long]("corpus_n") &&
      meta1.getAs[Long]("corpus_h") == meta2.getAs[Long]("corpus_h"),
      "replayed txn must not advance the fingerprint")
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "replayed txn must not touch the pair table")
    // the grown corpus still serves through the gate
    val grown = old.unionByName(delta)
    val v2 = UpsertStore.latestVersion(spark, path)
    PairGraph.pairGraph(spark, grown, "crash_txn", 0.6, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path) == v2)
  }

  test("crash between extend and updateClusters: the replayed batch completes instead of wedging") {
    // the ADVICE r7 scenario: ingestBatch dies AFTER PairGraph.extend
    // but BEFORE updateClusters and the ledger commit. foreachBatch
    // replays the batch; extend must self-skip (its meta txn), and
    // updateClusters must then run in-step — round 7 threw the
    // out-of-step require on every retry, drifting the meta further
    val dir = freshDir("crash_wedge")
    val cm = new ClusterMaintainer(spark, "crash_wedge", dir, 0.6)
    cm.bootstrap(docs(1L -> textA, 2L -> textC))
    val batch = docs(10L -> textA2)
    // simulate the dying first attempt: extend committed, nothing else
    PairGraph.extend(spark, batch, "crash_wedge", 0.6, Some(dir), txnId = Some(0L))
    // the replay — must complete the batch, not throw
    cm.ingestBatch(batch, txnId = Some(0L))
    val labels = cm.current.as[(Long, Long)].collect().toSet
    assert(labels == Set((1L, 1L), (10L, 1L)),
      s"replay must fold doc 10 into doc 1's component: $labels")
    // and a LATER batch through the normal path still applies cleanly
    cm.ingestBatch(docs(11L -> textA3), txnId = Some(1L))
    val after = cm.current.as[(Long, Long)].collect().toSet
    assert(after == Set((1L, 1L), (10L, 1L), (11L, 1L)), s"got $after")
  }

  test("a dirty pair-graph meta fails the gate for EVERY corpus — partial mutations never serve") {
    val path = freshDir("crash_dirty")
    val old = docs(1L -> textA, 2L -> textC)
    PairGraph.pairGraph(spark, old, "crash_dirty", 0.6, Some(path))
    val (n, h) = PairGraph.corpusFingerprint(old)
    // simulate a crash mid-extend: dirty meta (pre-extend fingerprint
    // preserved) is on disk, data writes may or may not have landed.
    // Round 7 kept the OLD clean meta through the data writes, so a
    // serve for the OLD corpus would gate-match and return rows the
    // extend had already mixed in — foreign pairs.
    UpsertStore.replace(spark, s"${path}__meta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(n).as("corpus_n"),
        lit(h).as("corpus_h"), lit(0.6).as("tau"), lit(true).as("dirty"),
        lit(-1L).as("txn")), Seq("meta_id"))
    val vBefore = UpsertStore.latestVersion(spark, path).get
    PairGraph.pairGraph(spark, old, "crash_dirty", 0.6, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path).get > vBefore,
      "a dirty meta must force a rebuild even for the matching corpus")
    // the rebuild left the store clean again: same corpus now serves
    val vClean = UpsertStore.latestVersion(spark, path)
    PairGraph.pairGraph(spark, old, "crash_dirty", 0.6, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path) == vClean)
  }

  test("retry of an interrupted extend converges to the from-scratch graph") {
    val path = freshDir("crash_retry")
    val old = docs(1L -> textA, 2L -> textC)
    val delta = docs(10L -> textA2, 11L -> textA3)
    val full = old.unionByName(delta)
    PairGraph.pairGraph(spark, old, "crash_retry", 0.6, Some(path))
    val (bn, bh) = PairGraph.corpusFingerprint(old)
    // run the extend to completion, then rewind the meta to the DIRTY
    // state — exactly what a crash after the data writes but before the
    // clean-meta commit leaves behind
    PairGraph.extend(spark, delta, "crash_retry", 0.6, Some(path))
    UpsertStore.replace(spark, s"${path}__meta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(bn).as("corpus_n"),
        lit(bh).as("corpus_h"), lit(0.6).as("tau"), lit(true).as("dirty"),
        lit(-1L).as("txn")), Seq("meta_id"))
    // the at-least-once retry re-applies the same delta: upserts are
    // last-writer-wins, so contents converge and the fingerprint lands
    // on the grown corpus exactly once
    PairGraph.extend(spark, delta, "crash_retry", 0.6, Some(path))
    val vServe = UpsertStore.latestVersion(spark, path)
    val served = PairGraph.pairGraph(spark, full, "crash_retry", 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(UpsertStore.latestVersion(spark, path) == vServe,
      "converged retry must serve the grown corpus through the gate")
    val scratch = Dedup.exactNearDupPairs(full, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(served == scratch, s"retry diverged: $served vs $scratch")
  }

  test("retry of an interrupted updateClusters converges (labels already merged or not)") {
    val path = freshDir("crash_cl_retry")
    val old = docs(1L -> textA, 2L -> textA2, 30L -> textC)
    val delta = docs(10L -> textA3)
    val full = old.unionByName(delta)
    PairGraph.clusters(spark, old, "crash_cl_retry", 0.6, Some(path))
    val (cn, ch) = PairGraph.corpusFingerprint(old)
    PairGraph.extend(spark, delta, "crash_cl_retry", 0.6, Some(path))
    // run the cluster update to completion, then rewind cMeta to the
    // DIRTY state — a crash after the (atomic) label upsert but before
    // the clean cMeta commit. The retry recomputes the merge from the
    // ALREADY-merged labels: the contracted graph collapses to nothing
    // and the clean meta lands — same final state, no drift
    PairGraph.updateClusters(spark, delta, "crash_cl_retry", 0.6, Some(path))
    UpsertStore.replace(spark, s"${path}__cmeta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(cn).as("corpus_n"),
        lit(ch).as("corpus_h"), lit(0.6).as("tau"), lit(true).as("dirty"),
        lit(-1L).as("txn")), Seq("meta_id"))
    PairGraph.updateClusters(spark, delta, "crash_cl_retry", 0.6, Some(path))
    val vServe = UpsertStore.latestVersion(spark, s"${path}__clusters")
    val served = PairGraph.clusters(spark, full, "crash_cl_retry", 0.6, Some(path))
      .as[(Long, Long)].collect().toSet
    assert(UpsertStore.latestVersion(spark, s"${path}__clusters") == vServe,
      "converged retry must serve through the gate, not re-propagate")
    val scratch = Dedup.clusterAssignments(
      Dedup.exactNearDupPairs(full, 0.6).select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(served == scratch, s"retry diverged: $served vs $scratch")

    // and the OTHER half of the window: dirty cMeta with the labels
    // upsert NOT yet applied (atomicity means nothing landed) — retry
    // finds the merges and applies them once
    val path2 = freshDir("crash_cl_retry2")
    PairGraph.clusters(spark, old, "crash_cl_retry2", 0.6, Some(path2))
    PairGraph.extend(spark, delta, "crash_cl_retry2", 0.6, Some(path2))
    UpsertStore.replace(spark, s"${path2}__cmeta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(cn).as("corpus_n"),
        lit(ch).as("corpus_h"), lit(0.6).as("tau"), lit(true).as("dirty"),
        lit(-1L).as("txn")), Seq("meta_id"))
    PairGraph.updateClusters(spark, delta, "crash_cl_retry2", 0.6, Some(path2))
    val served2 = PairGraph.clusters(spark, full, "crash_cl_retry2", 0.6, Some(path2))
      .as[(Long, Long)].collect().toSet
    assert(served2 == scratch, s"pre-upsert retry diverged: $served2 vs $scratch")
  }

  test("extend refuses a store left dirty by an interrupted REBUILD (no base to extend from)") {
    val path = freshDir("crash_rebuild")
    val old = docs(1L -> textA, 2L -> textC)
    PairGraph.pairGraph(spark, old, "crash_rebuild", 0.6, Some(path))
    // the rebuild-dirty sentinel carries no usable base fingerprint
    UpsertStore.replace(spark, s"${path}__meta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(-1L).as("corpus_n"),
        lit(0L).as("corpus_h"), lit(0.6).as("tau"), lit(true).as("dirty"),
        lit(-1L).as("txn")), Seq("meta_id"))
    intercept[IllegalArgumentException] {
      PairGraph.extend(spark, docs(10L -> textA2), "crash_rebuild", 0.6, Some(path))
    }
  }

  test("vector-index extend with a txnId is idempotent, and dirty meta forces a rebuild") {
    def vecs(rows: (Long, Seq[Float])*) =
      rows.toDF("vec_id", "embedding")
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i % 4) 1f else 0.1f * i)
    val corpus = vecs((0L to 9L).map(i => i -> e(i.toInt)): _*)
    val delta = vecs(20L -> e(1), 21L -> e(2))
    val path = freshDir("crash_vidx")
    VectorIndex.index(spark, corpus, "crash_vidx", 4, Some(path))
    VectorIndex.extend(spark, delta, "crash_vidx", 4, Some(path), txnId = Some(3L))
    val meta1 = UpsertStore.read(spark, s"${path}__meta").get.head()
    VectorIndex.extend(spark, delta, "crash_vidx", 4, Some(path), txnId = Some(3L))
    val meta2 = UpsertStore.read(spark, s"${path}__meta").get.head()
    assert(meta1.getAs[Long]("corpus_n") == meta2.getAs[Long]("corpus_n") &&
      meta1.getAs[Long]("corpus_h") == meta2.getAs[Long]("corpus_h"),
      "replayed txn must not advance the index fingerprint")
    // dirty meta ⇒ gate miss ⇒ rebuild even for the matching corpus
    val grown = corpus.unionByName(delta)
    val (n, h) = VectorIndex.corpusFingerprint(grown)
    UpsertStore.replace(spark, s"${path}__meta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(n).as("corpus_n"),
        lit(h).as("corpus_h"), lit(4).as("centroids"), lit(true).as("dirty"),
        lit(-1L).as("txn")), Seq("meta_id"))
    val vBefore = UpsertStore.latestVersion(spark, path).get
    VectorIndex.index(spark, grown, "crash_vidx", 4, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path).get > vBefore,
      "dirty index meta must force a rebuild")
  }

  test("crash between vector-index extend and the ledger: the replayed batch completes") {
    def vecs(rows: (Long, Seq[Float])*) = rows.toDF("vec_id", "embedding")
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i % 4) 1f else 0.1f * i)
    val corpus = vecs((0L to 9L).map(i => i -> e(i.toInt)): _*)
    val dir = freshDir("crash_vmaint")
    val vm = new VectorIndexMaintainer(spark, "crash_vmaint", dir, 4)
    vm.bootstrap(corpus)
    val batch = vecs(20L -> e(1))
    // first attempt dies after the extend, before the ledger commit
    VectorIndex.extend(spark, batch, "crash_vmaint", 4, Some(dir), txnId = Some(0L))
    val meta1 = UpsertStore.read(spark, s"${dir}__meta").get.head()
    vm.ingestBatch(batch, txnId = Some(0L)) // the replay
    val meta2 = UpsertStore.read(spark, s"${dir}__meta").get.head()
    assert(meta1.getAs[Long]("corpus_n") == meta2.getAs[Long]("corpus_n") &&
      meta1.getAs[Long]("corpus_h") == meta2.getAs[Long]("corpus_h"),
      "replay must not double-apply the extend")
    // the index still answers: vec 20 (a copy-ish of e(1)) is served
    val hits = vm.search(vecs(100L -> e(1)).select($"vec_id".as("query_id"),
      $"embedding".as("qe")), nProbe = 4, k = 3)
      .select("neighbor_id").as[Long].collect().toSet
    assert(hits.nonEmpty, "index must serve after the replayed batch")
  }
}
