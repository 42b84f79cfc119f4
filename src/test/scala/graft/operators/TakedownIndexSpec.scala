package graft.operators

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.UpsertStore

/** Index-store retraction (round 17 — the takedown lifecycle's serve
  * legs): for each derived-store family, `retract(gone)` must leave
  * the stores BIT-EQUAL to a from-scratch build on the remaining
  * corpus — including the df/stats bookkeeping (vanished terms lose
  * their rows, corpus stats and fingerprints retreat exactly, so a
  * later gated ensure on the remaining corpus SERVES instead of
  * rebuilding) — and a replayed retraction must converge. */
class TakedownIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = Seq(
    1L -> "alpha beta gamma delta epsilon",
    2L -> "alpha beta zeta eta theta",
    3L -> "unique tokens only here now",
    4L -> "alpha beta gamma delta epsilon", // exact copy of 1
    5L -> "closing words beta alpha gamma")
  private val goneIds = Set(1L, 3L)
  private def df(rows: Seq[(Long, String)]): DataFrame = rows.toDF("doc_id", "text")
  private val full = df(docs)
  private val gone = df(docs.filter(d => goneIds(d._1)))
  private val remaining = df(docs.filterNot(d => goneIds(d._1)))

  private def rows(path: String): Set[Seq[Any]] =
    UpsertStore.read(spark, path).get.collect().map(_.toSeq.map {
      case null => null
      case s: Seq[_] => s.toList
      case x => x
    }).toSet

  test("postings retract ≡ from-scratch (df rows vanish, stats + fingerprint retreat, gate re-serves)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-post").toString
    PostingsIndex.ensure(spark, full, s"$dir/idx")
    PostingsIndex.retract(spark, gone, s"$dir/idx", Some(1L))
    PostingsIndex.ensure(spark, remaining, s"$dir/fresh")
    assert(rows(s"$dir/idx") == rows(s"$dir/fresh"), "postings diverged")
    assert(rows(s"$dir/idx__df") == rows(s"$dir/fresh__df"),
      "df table diverged — vanished terms must lose their rows")
    def stats(p: String) = UpsertStore.read(spark, s"${p}__stats").get
      .select("n", "total_dl", "avgdl", "corpus_n", "corpus_h").head().toSeq
    assert(stats(s"$dir/idx") == stats(s"$dir/fresh"),
      "stats/fingerprint did not retreat to the remaining corpus' values")
    // the retreated fingerprint means ensure(remaining) gate-SERVES
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    PostingsIndex.ensure(spark, remaining, s"$dir/idx")
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "post-retract ensure(remaining) must gate-serve, not rebuild")
    // ledgered replay self-skips
    PostingsIndex.retract(spark, gone, s"$dir/idx", Some(1L))
    assert(stats(s"$dir/idx") == stats(s"$dir/fresh"), "replayed retract drifted stats")
  }

  test("trigram retract ≡ from-scratch build on the remaining corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-tri").toString
    TrigramIndex.build(spark, full, s"$dir/idx")
    TrigramIndex.retract(spark, gone, s"$dir/idx")
    TrigramIndex.build(spark, remaining, s"$dir/fresh")
    assert(rows(s"$dir/idx") == rows(s"$dir/fresh"), "trigram postings diverged")
    assert(rows(s"$dir/idx__df") == rows(s"$dir/fresh__df"), "trigram df diverged")
    // un-metered path: a repeated retract of the same (already absent)
    // rows converges — keys recompute from text, deletes are no-ops
    TrigramIndex.retract(spark, gone, s"$dir/idx")
    assert(rows(s"$dir/idx__df") == rows(s"$dir/fresh__df"))
  }

  test("phrase retract ≡ from-scratch build on the remaining corpus") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-phr").toString
    PhraseIndex.build(spark, full, s"$dir/idx")
    PhraseIndex.retract(spark, gone, s"$dir/idx")
    PhraseIndex.build(spark, remaining, s"$dir/fresh")
    assert(rows(s"$dir/idx") == rows(s"$dir/fresh"), "positional postings diverged")
    // docs 2 and 4 contain the phrase; doc 1 did too but is retracted
    // (doc 5 has the REVERSED bigram — must not match)
    val hits = PhraseIndex.search(spark, s"$dir/idx",
      Seq("alpha beta").toDF("query")).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(hits == Map(2L -> 1L, 4L -> 1L),
      s"phrase serve must stop returning retracted docs: $hits")
  }

  test("simhash retract keeps shared-fingerprint bucket rows, drops orphaned ones") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-sim").toString
    SimhashIndex.build(spark, full, s"$dir/idx")
    // doc 1 is an exact copy of doc 4: retracting 1 must KEEP their
    // shared fingerprint's chunk rows; retracting 3 orphans its own
    SimhashIndex.retract(spark, gone, s"$dir/idx")
    SimhashIndex.build(spark, remaining, s"$dir/fresh")
    assert(rows(s"$dir/idx") == rows(s"$dir/fresh"), "fingerprint table diverged")
    assert(rows(s"$dir/idx__chunks") == rows(s"$dir/fresh__chunks"),
      "chunk postings diverged — shared-fp rows must survive, orphans must not")
  }

  test("VERDICT r17 #1: shingle retract ≡ from-scratch — a retracted train doc stops adjudicating contamination") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-shg").toString
    ShingleIndex.ensure(spark, full, s"$dir/idx", n = 3)
    // pre-retract: the eval doc (doc 1's exact text) is flagged against
    // BOTH exact-copy train docs, sharing all 3 of its 3-grams
    val evalDocs = Seq(100L -> "alpha beta gamma delta epsilon").toDF("doc_id", "text")
    def probe(path: String) =
      ShingleIndex.probe(spark, path, evalDocs, n = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(probe(s"$dir/idx") == Set((100L, 2L, 3L)),
      s"construction check: pre-retract probe should flag train docs 1 and 4")
    ShingleIndex.retract(spark, gone, s"$dir/idx", n = 3, txnId = Some(1L))
    ShingleIndex.ensure(spark, remaining, s"$dir/fresh", n = 3)
    assert(rows(s"$dir/idx") == rows(s"$dir/fresh"), "gram postings diverged")
    assert(rows(s"$dir/idx__df") == rows(s"$dir/fresh__df"),
      "gram df diverged — vanished grams must lose their rows")
    // the compliance teeth: the retracted train doc no longer
    // adjudicates; the surviving exact copy still does
    assert(probe(s"$dir/idx") == Set((100L, 1L, 3L)),
      "a retracted train doc must stop flagging eval docs as contaminated")
    // fingerprint retreat means ensure(remaining) gate-SERVES
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    ShingleIndex.ensure(spark, remaining, s"$dir/idx", n = 3)
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "post-retract ensure(remaining) must gate-serve, not rebuild")
    // ledgered replay self-skips
    ShingleIndex.retract(spark, gone, s"$dir/idx", n = 3, txnId = Some(1L))
    assert(rows(s"$dir/idx__df") == rows(s"$dir/fresh__df"),
      "replayed committed retract drifted the df table")
  }

  test("round 18: the retraction high-water mark survives a later extend (rtxn preservation)") {
    // pre-r18 bug: extend rewrote the meta/stats row WITHOUT rtxn, so a
    // late replay of a committed takedown re-applied its non-idempotent
    // fingerprint/stats retreat
    val dir = java.nio.file.Files.createTempDirectory("graft-td-rtxn").toString
    PostingsIndex.ensure(spark, full, s"$dir/p")
    PostingsIndex.retract(spark, gone, s"$dir/p", Some(5L))
    PostingsIndex.extend(spark,
      Seq(6L -> "brand new words arriving").toDF("doc_id", "text"),
      s"$dir/p", Some(1L))
    def stats() = UpsertStore.read(spark, s"$dir/p__stats").get.head().toSeq
    val s0 = stats()
    PostingsIndex.retract(spark, gone, s"$dir/p", Some(5L))
    assert(stats() == s0,
      "postings extend dropped the rtxn mark — a replayed retract re-applied its retreat")
    // same property through the shingle family
    ShingleIndex.ensure(spark, full, s"$dir/s", n = 3)
    ShingleIndex.retract(spark, gone, s"$dir/s", n = 3, txnId = Some(5L))
    ShingleIndex.extend(spark,
      Seq(6L -> "brand new words arriving today ok").toDF("doc_id", "text"),
      s"$dir/s", n = 3, txnId = Some(1L))
    def smeta() = UpsertStore.read(spark, s"$dir/s__meta").get.head().toSeq
    val m0 = smeta()
    ShingleIndex.retract(spark, gone, s"$dir/s", n = 3, txnId = Some(5L))
    assert(smeta() == m0,
      "shingle extend dropped the rtxn mark — a replayed retract re-applied its retreat")
    // and the ivf-pq family
    val emb = (0L to 11L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1))).toDF("vec_id", "emb")
    IvfPqIndex.ensure(spark, emb.filter($"vec_id" < 10), s"$dir/v", centroids = 2)
    IvfPqIndex.retract(spark, emb.filter($"vec_id" === 3L), s"$dir/v", Some(5L))
    IvfPqIndex.extend(spark, emb.filter($"vec_id" >= 10), s"$dir/v", Some(1L))
    def vmeta() = UpsertStore.read(spark, s"$dir/v__meta").get.head().toSeq
    val v0 = vmeta()
    IvfPqIndex.retract(spark, emb.filter($"vec_id" === 3L), s"$dir/v", Some(5L))
    assert(vmeta() == v0,
      "ivf-pq extend dropped the rtxn mark — a replayed retract re-applied its retreat")
  }

  test("round 18: vector-cell and pq-code stores retract (the declared q96/q122 surfaces)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-vcpq").toString
    // vector-cell store (q96's family): keyed delete, centroids pinned,
    // gate re-serves, replay self-skips
    val embV = (0L to 11L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1)))
      .toDF("vec_id", "embedding")
    val vPath = s"$dir/vc"
    VectorIndex.index(spark, embV, "unused", centroids = 2,
      pathOverride = Some(vPath))
    val centsBefore = rows(s"${vPath}__centroids")
    VectorIndex.retract(spark, embV.filter($"vec_id".isin(3L, 7L)), "unused",
      centroids = 2, pathOverride = Some(vPath), txnId = Some(1L))
    assert(UpsertStore.read(spark, vPath).get
      .filter($"vec_id".isin(3L, 7L)).count() == 0, "retracted cells still served")
    assert(rows(s"${vPath}__centroids") == centsBefore,
      "retraction must not move the pinned centroids")
    val vv = UpsertStore.latestVersion(spark, vPath)
    VectorIndex.index(spark, embV.filter(!$"vec_id".isin(3L, 7L)), "unused",
      centroids = 2, pathOverride = Some(vPath))
    assert(UpsertStore.latestVersion(spark, vPath) == vv,
      "post-retract index(remaining) must gate-serve, not rebuild")
    VectorIndex.retract(spark, embV.filter($"vec_id".isin(3L, 7L)), "unused",
      centroids = 2, pathOverride = Some(vPath), txnId = Some(1L))
    assert(UpsertStore.latestVersion(spark, vPath) == vv,
      "replayed committed retraction advanced the store")

    // pq-code store (q122's family): same contract, codebooks pinned
    val embP = (0L until 40L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1)))
      .toDF("vec_id", "emb")
    val pPath = s"$dir/pq"
    PqIndex.ensure(spark, embP, pPath)
    val booksBefore = rows(s"${pPath}__codebooks")
    PqIndex.retract(spark, embP.filter($"vec_id".isin(3L, 7L)), pPath, Some(1L))
    assert(UpsertStore.read(spark, pPath).get
      .filter($"vec_id".isin(3L, 7L)).count() == 0, "retracted codes still served")
    assert(rows(s"${pPath}__codebooks") == booksBefore,
      "retraction must not retrain the pinned codebooks")
    val pv = UpsertStore.latestVersion(spark, pPath)
    PqIndex.ensure(spark, embP.filter(!$"vec_id".isin(3L, 7L)), pPath)
    assert(UpsertStore.latestVersion(spark, pPath) == pv,
      "post-retract ensure(remaining) must gate-serve, not rebuild")
    PqIndex.retract(spark, embP.filter($"vec_id".isin(3L, 7L)), pPath, Some(1L))
    assert(UpsertStore.latestVersion(spark, pPath) == pv,
      "replayed committed retraction advanced the store")
  }

  test("round 19 (VERDICT r18 #1): retract(duplicated batch) ≡ retract(deduped) — stats and fingerprints exact") {
    // a compliance batch with the same doc listed twice (two
    // overlapping complaints): pre-fix, the postings stats retreat
    // summed dl over the duplicated rows (WRONG avgdl/N under a CLEAN
    // meta) and every fingerprint retreat XOR-cancelled its hash term
    // (x ⊕ x = 0) while over-retreating corpus_n by 2 — spurious full
    // rebuilds at the next gate. The Retraction.dedupBatch guard at
    // every retract entry makes the duplicated batch bit-equal to the
    // deduped one.
    val dir = java.nio.file.Files.createTempDirectory("graft-td-dup").toString
    val dupGone = gone.unionByName(gone)

    // postings — the family where the pre-fix symptom is wrong BM25
    // stats under a clean meta (no gate ever catches it)
    PostingsIndex.ensure(spark, full, s"$dir/p")
    PostingsIndex.retract(spark, dupGone, s"$dir/p", Some(1L))
    PostingsIndex.ensure(spark, remaining, s"$dir/pfresh")
    def pstats(p: String) = UpsertStore.read(spark, s"${p}__stats").get
      .select("n", "total_dl", "avgdl", "corpus_n", "corpus_h").head().toSeq
    assert(pstats(s"$dir/p") == pstats(s"$dir/pfresh"),
      "duplicated takedown batch corrupted the BM25 stats/fingerprint retreat")
    assert(rows(s"$dir/p__df") == rows(s"$dir/pfresh__df"),
      "duplicated takedown batch diverged the df table")
    val pv = UpsertStore.latestVersion(spark, s"$dir/p")
    PostingsIndex.ensure(spark, remaining, s"$dir/p")
    assert(UpsertStore.latestVersion(spark, s"$dir/p") == pv,
      "post-dup-retract ensure(remaining) must gate-serve, not rebuild")

    // shingle — a fingerprint-gate family (pre-fix: XOR-cancel → the
    // next gated ensure pays a spurious corpus-sized rebuild)
    ShingleIndex.ensure(spark, full, s"$dir/s", n = 3)
    ShingleIndex.retract(spark, dupGone, s"$dir/s", n = 3, txnId = Some(1L))
    ShingleIndex.ensure(spark, remaining, s"$dir/sfresh", n = 3)
    def smeta(p: String) = UpsertStore.read(spark, s"${p}__meta").get
      .select("corpus_n", "corpus_h").head().toSeq
    assert(smeta(s"$dir/s") == smeta(s"$dir/sfresh"),
      "duplicated takedown batch corrupted the shingle fingerprint retreat")
    val sv = UpsertStore.latestVersion(spark, s"$dir/s")
    ShingleIndex.ensure(spark, remaining, s"$dir/s", n = 3)
    assert(UpsertStore.latestVersion(spark, s"$dir/s") == sv,
      "post-dup-retract ensure(remaining) must gate-serve, not rebuild")

    // pair graph + clusters — the curation composition's fingerprint
    // (both metas retreat in lockstep; PairGraph.scala:445 pre-fix)
    PairGraph.clusters(spark, full, "unused-dup", 0.6, Some(s"$dir/pg"))
    PairGraph.retract(spark, dupGone, s"$dir/pg", txnId = 1L)
    PairGraph.clusters(spark, remaining, "unused-dup-f", 0.6, Some(s"$dir/pgfresh"))
    def pgmeta(p: String) = UpsertStore.read(spark, s"${p}__meta").get
      .select("corpus_n", "corpus_h").head().toSeq
    assert(pgmeta(s"$dir/pg") == pgmeta(s"$dir/pgfresh"),
      "duplicated takedown batch corrupted the pair-graph fingerprint retreat")
    assert(UpsertStore.read(spark, s"$dir/pg__cmeta").get
      .select("corpus_n", "corpus_h").head().toSeq == pgmeta(s"$dir/pgfresh"),
      "duplicated takedown batch broke the pair/cluster meta lockstep")

    // vec_id-keyed family (ivf-pq; PqIndex.fingerprint pre-fix)
    val emb = (0L to 11L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1))).toDF("vec_id", "emb")
    val goneV = emb.filter($"vec_id".isin(3L, 7L))
    IvfPqIndex.ensure(spark, emb, s"$dir/v", centroids = 2)
    IvfPqIndex.retract(spark, goneV.unionByName(goneV), s"$dir/v", Some(1L))
    val vv = UpsertStore.latestVersion(spark, s"$dir/v")
    IvfPqIndex.ensure(spark, emb.filter(!$"vec_id".isin(3L, 7L)), s"$dir/v",
      centroids = 2)
    assert(UpsertStore.latestVersion(spark, s"$dir/v") == vv,
      "post-dup-retract ensure(remaining) must gate-serve, not rebuild")
  }

  test("ivf-pq retract: keyed delete, no retrain, fingerprint retreat gate-serves") {
    val dir = java.nio.file.Files.createTempDirectory("graft-td-ivf").toString
    val emb = (0L to 11L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1))).toDF("vec_id", "emb")
    val goneV = emb.filter($"vec_id".isin(3L, 7L))
    IvfPqIndex.ensure(spark, emb, s"$dir/idx", centroids = 2)
    val centsBefore = rows(s"$dir/idx__centroids")
    IvfPqIndex.retract(spark, goneV, s"$dir/idx", Some(1L))
    assert(UpsertStore.read(spark, s"$dir/idx").get
      .filter($"vec_id".isin(3L, 7L)).count() == 0, "tombstoned rows still served")
    assert(rows(s"$dir/idx__centroids") == centsBefore,
      "retraction must not retrain the pinned quantizer")
    // fingerprint retreat: ensure(remaining) gate-serves
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    IvfPqIndex.ensure(spark, emb.filter(!$"vec_id".isin(3L, 7L)), s"$dir/idx",
      centroids = 2)
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "post-retract ensure(remaining) must gate-serve, not rebuild")
    // ledgered replay self-skips
    IvfPqIndex.retract(spark, goneV, s"$dir/idx", Some(1L))
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v)
  }
}
