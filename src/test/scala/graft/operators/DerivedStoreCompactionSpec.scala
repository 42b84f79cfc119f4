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

  // ---- r14/r15 store families (VERDICT r15 #5): each takes perpetual
  // maintainer extends — the same bounded-delta-dirs + gates-survive
  // proof the pair/sigs/cells tables above have ----

  test("trigram postings + df stores compact across 2x maxDeltas extends; serve stays exact") {
    val path = java.nio.file.Files.createTempDirectory("graft-tricompact").toString + "/store"
    val docs = Seq(1L -> "alpha bravo charlie needle", 2L -> "delta echo foxtrot")
      .toDF("doc_id", "text")
    TrigramIndex.build(spark, docs, path)
    var corpus = docs
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i =>
      val text = if (i == n) s"golf hotel needle batch$i" else s"golf hotel batch$i"
      val delta = Seq((100L + i) -> text).toDF("doc_id", "text")
      TrigramIndex.extend(spark, delta, path)
      corpus = corpus.unionByName(delta)
    }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"postings deltas unbounded: ${deltaDirs(path)}")
    assert(deltaDirs(s"${path}__df") <= UpsertStore.DefaultMaxDeltas,
      s"df deltas unbounded: ${deltaDirs(s"${path}__df")}")
    // serve across the compacted lifecycle finds the first AND the
    // last doc carrying the pattern — nothing was folded away
    val hits = TrigramIndex.search(spark, path, Seq("needle").toDF("query"), corpus)
      .select("doc_id").as[Long].collect().toSet
    assert(hits == Set(1L, 100L + n), s"compacted serve lost matches: $hits")
  }

  test("simhash fp + chunk stores compact across 2x maxDeltas extends; rows stay current") {
    val path = java.nio.file.Files.createTempDirectory("graft-shcompact").toString + "/store"
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    var corpus = Seq(1L -> base).toDF("doc_id", "text")
    SimhashIndex.build(spark, corpus, path)
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i =>
      val delta = Seq((100L + i) ->
        ((1 to 25).map(j => s"w$j") ++ (26 to 30).map(j => s"v$i$j")).mkString(" "))
        .toDF("doc_id", "text")
      SimhashIndex.extend(spark, delta, path)
      corpus = corpus.unionByName(delta)
    }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"fp deltas unbounded: ${deltaDirs(path)}")
    assert(deltaDirs(s"${path}__chunks") <= UpsertStore.DefaultMaxDeltas,
      s"chunk deltas unbounded: ${deltaDirs(s"${path}__chunks")}")
    assert(UpsertStore.read(spark, path).get.count() == corpus.count(),
      "fp store must hold one row per ingested doc after compaction")
  }

  test("theta day-sketch store compacts across 2x maxDeltas ingests; estimates stay exact-k") {
    val path = java.nio.file.Files.createTempDirectory("graft-thcompact").toString + "/store"
    val m = new graft.streaming.ThetaMaintainer(spark, path, k = 64)
    def day(d: Int, users: Range) = users.map(u =>
      (java.sql.Timestamp.valueOf(f"2024-01-${d}%02d 10:00:00"), u.toLong))
      .toDF("ts", "user_id")
    m.bootstrap(day(1, 1 to 20))
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i => m.ingestBatch(day(1 + (i % 3), (i * 3) to (i * 3 + 5)), Some(i.toLong)) }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"theta deltas unbounded: ${deltaDirs(path)}")
    // the store still holds one mergeable sketch per touched day and
    // serves the consecutive-day contract
    assert(UpsertStore.read(spark, path).get.count() == 3)
    val served = m.serve(day(1, 1 to 20)
      .unionByName((1 to n).map(i => day(1 + (i % 3), (i * 3) to (i * 3 + 5))).reduce(_ unionByName _)))
    assert(served.count() > 0, "theta serve must produce day pairs after compaction")
  }

  test("Misra-Gries per-lang store compacts across 2x maxDeltas ingests; bounds survive") {
    val path = java.nio.file.Files.createTempDirectory("graft-mgcompact").toString + "/store"
    val m = new graft.streaming.HeavyMaintainer(spark, path, k = 32)
    def batch(i: Int) = Seq(
      (i.toLong * 2, "en", s"the the the common word$i"),
      (i.toLong * 2 + 1, "fr", s"le le rare mot$i")).toDF("doc_id", "lang", "text")
    m.bootstrap(batch(0))
    val n = UpsertStore.DefaultMaxDeltas * 2
    var corpus = batch(0)
    (1 to n).foreach { i => m.ingestBatch(batch(i), Some(i.toLong)); corpus = corpus.unionByName(batch(i)) }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"mg deltas unbounded: ${deltaDirs(path)}")
    val served = m.serve(corpus)
    assert(served.count() > 0)
    // the MG detection guarantee survives arbitrary compaction: 'the'
    // dominates en and must be detected by the maintained summary
    val theRow = served.filter($"lang" === "en" && $"term" === "the")
    assert(theRow.count() == 1 && theRow.head().getAs[Boolean]("detected"),
      "majority term must stay detected after compacted merges")
  }

  test("phrase positional store compacts across 2x maxDeltas extends; overlap counts stay exact") {
    val path = java.nio.file.Files.createTempDirectory("graft-phrcompact").toString + "/store"
    val docs = Seq(1L -> "alpha needle point beta", 2L -> "gamma delta")
      .toDF("doc_id", "text")
    PhraseIndex.build(spark, docs, path)
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i =>
      val text = if (i == n) s"needle point needle point batch$i" else s"golf hotel batch$i"
      PhraseIndex.extend(spark, Seq((100L + i) -> text).toDF("doc_id", "text"), path)
    }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"phrase deltas unbounded: ${deltaDirs(path)}")
    // the first and last carriers survive, with the last doc's TWO
    // occurrences counted — position arrays merged, not folded away
    val hits = PhraseIndex.search(spark, path, Seq("needle point").toDF("query"))
      .select("doc_id", "n_hits").as[(Long, Long)].collect().toSet
    assert(hits == Set(1L -> 1L, (100L + n) -> 2L),
      s"compacted phrase serve lost matches: $hits")
  }

  test("IVF-PQ composed store compacts across 2x maxDeltas extends; fingerprint gate survives") {
    val path = java.nio.file.Files.createTempDirectory("graft-ivfpqcompact").toString + "/store"
    def vec(i: Int): Seq[Double] =
      (0 until 8).map(j => if (j == i % 4) 1.0 else 0.01 * (i % 7))
    var corpus = (0L until 16L).map(i => (i, vec(i.toInt))).toDF("vec_id", "emb")
    IvfPqIndex.ensure(spark, corpus, path, centroids = 4)
    val n = UpsertStore.DefaultMaxDeltas * 2
    (1 to n).foreach { i =>
      val delta = Seq((100L + i, vec(i))).toDF("vec_id", "emb")
      IvfPqIndex.extend(spark, delta, path)
      corpus = corpus.unionByName(delta)
    }
    assert(deltaDirs(path) <= UpsertStore.DefaultMaxDeltas,
      s"ivfpq deltas unbounded: ${deltaDirs(path)}")
    // associatively-folded fingerprint still gates: an ensure over the
    // grown corpus must SERVE, not retrain
    val v = UpsertStore.latestVersion(spark, path)
    IvfPqIndex.ensure(spark, corpus, path, centroids = 4)
    assert(UpsertStore.latestVersion(spark, path) == v,
      "gate must survive compaction — serve, don't rebuild")
    assert(UpsertStore.read(spark, path).get.count() == corpus.count())
  }
}
