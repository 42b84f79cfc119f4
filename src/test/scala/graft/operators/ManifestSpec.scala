package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Semantics the q154/q156 oracles prove engine-equal but don't
  * explain: stage priority in the manifest's reason (exact dup beats
  * quality beats near-dup), cluster-atomic splits, and the
  * representative-keeps policy — pinned on a hand-built corpus. */
class ManifestSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val tA = (1 to 30).map(i => s"a$i")
  private val textA = tA.mkString(" ")
  private val nearA = (tA.take(26) ++ (27 to 30).map(i => s"z$i")).mkString(" ")
  private val textC = (1 to 30).map(i => s"c$i").mkString(" ")
  private val lowDiv = Seq.fill(30)("x").mkString(" ")
  // Cluster whose MIN-id member fails quality: tE tokens are 13 chars
  // (avg_token_len 13 > 12 → token_len_outlier); nearE swaps the last
  // 4 for short tokens (avg 11.53 → passes) while sharing 24/32
  // shingles (jaccard 0.75 ≥ 0.6 → same near-dup cluster).
  private val tE = (1 to 30).map(i => f"e$i%02dxxxxxxxxxx")
  private val textE = tE.mkString(" ")
  private val nearE = (tE.take(26) ++ (1 to 4).map(i => s"y$i")).mkString(" ")

  private def bucket(clusterId: Long): Long =
    (((clusterId % 268435456L) * 2654435761L) % 4294967296L) % 100

  private def splitOf(clusterId: Long): String = {
    val b = bucket(clusterId)
    if (b < 80) "train" else if (b < 90) "val" else "test"
  }

  private def corpusDir(): String = {
    val docs = Seq(
      (1L, textA, "en", "t", textA.length.toLong),   // kept, cluster rep
      (2L, textA, "en", "t", textA.length.toLong),   // exact copy of 1
      (3L, nearA, "en", "t", nearA.length.toLong),   // near-dup of 1 (not exact)
      (4L, lowDiv, "en", "t", lowDiv.length.toLong), // 1/30 distinct ratio
      (5L, "short text", "en", "t", 10L),            // 2 tokens
      (6L, textC, "en", "t", textC.length.toLong),   // kept singleton
      (7L, lowDiv, "en", "t", lowDiv.length.toLong), // exact copy of 4 AND low quality
      (8L, textE, "en", "t", textE.length.toLong),   // cluster min-id, FAILS quality
      (9L, nearE, "en", "t", nearE.length.toLong))   // clean near-dup of 8 → promoted rep
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("manifest").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("manifest: reason priority is exact-dup > quality > near-dup; reps and singletons keep") {
    val out = Dedup.q156TrainingManifest.fn(spark, corpusDir()).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getString(2), r.getString(3)))).toMap
    assert(out(1L) == ((true, "kept", splitOf(1L))))
    assert(out(2L) == ((false, "exact_dup", "none")),
      "an exact copy is exact_dup even though it is also a near-dup cluster member")
    assert(out(3L) == ((false, "near_dup", "none")),
      "a non-representative cluster member drops as near_dup")
    assert(out(4L) == ((false, "low_diversity", "none")))
    assert(out(5L) == ((false, "too_short", "none")))
    assert(out(6L) == ((true, "kept", splitOf(6L))), "singletons split by their own id")
    assert(out(7L) == ((false, "exact_dup", "none")),
      "exact-dup wins over the quality verdict (stage order)")
    assert(out(8L) == ((false, "token_len_outlier", "none")))
    assert(out(9L) == ((true, "kept", splitOf(8L))),
      "when the min-id member fails quality, the lowest-id CLEAN member is " +
        "promoted to kept representative (split still keyed by cluster id)")
  }

  test("cluster split: near-dup members can never straddle splits") {
    val rows = Dedup.q154ClusterSplit.fn(spark, corpusDir()).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byDoc = rows.map(t => t._1 -> t).toMap
    // docs 1, 2, 3 share one cluster (rep 1) — one split for all three
    assert(Seq(1L, 2L, 3L).map(byDoc(_)._2).distinct == Seq(1L))
    assert(Seq(1L, 2L, 3L).map(byDoc(_)._3).distinct.size == 1,
      s"cluster members diverged: ${Seq(1L, 2L, 3L).map(byDoc)}")
    assert(byDoc(1L)._3 == splitOf(1L), "split is the hash of the CLUSTER id")
    // every cluster in the output is split-atomic, not just the known one
    val straddlers = rows.groupBy(_._2).filter(_._2.map(_._3).distinct.size > 1)
    assert(straddlers.isEmpty, s"clusters straddling splits: ${straddlers.keys}")
    // and every document appears exactly once
    assert(rows.map(_._1).sorted.toSeq == (1L to 9L))
  }
}
