package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The round-18 retraction policy (VERDICT r17 #2): every maintainer
  * family answers "what happens on takedown" in code. ADDITIVE stores
  * (DSIR counts, rollup) retract by EXACT SUBTRACTION — rows whose
  * count empties are deleted, the post-retraction targets persist
  * txn-keyed before any store write so a crash-replay re-applies
  * absolute values instead of re-subtracting, and the separate
  * retraction ledger commits last. SKETCH monitors (KLL, HLL, θ, MG)
  * are mergeable but NOT invertible, so their declared contract is
  * REBUILD-ON-RETRACT from the caller-supplied surviving corpus,
  * behind the same ledger, with the INGEST high-water mark preserved
  * across the rebuild. */
class RetractionPolicySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def tmp(p: String): String =
    java.nio.file.Files.createTempDirectory(p).toString

  test("dsir retract: exact subtraction ≡ from-scratch; vanished terms lose rows; snapshot pruned; ledgers separate") {
    val dir = tmp("graft-rp-dsir")
    val docs = Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", "unique snowflake words"),
      (3L, "fr", "le chat"),
      (4L, "en", "the dog ran")).toDF("doc_id", "lang", "text")
    val m = new DsirMaintainer(spark, s"$dir/c")
    m.bootstrap(docs.filter($"doc_id" <= 2))
    m.ingestBatch(docs.filter($"doc_id" > 2), Some(7L)) // ingest high-water = 7
    // retract doc 2: all three terms are unique to it → their rows
    // must VANISH, not zero out (a from-scratch store has no row)
    m.retract(docs.filter($"doc_id" === 2L), txnId = 1L)
    val ref = new DsirMaintainer(spark, s"$dir/ref")
    ref.bootstrap(docs.filter($"doc_id" =!= 2L))
    def counts(p: String) = UpsertStore.read(spark, p).get
      .orderBy("term").collect().map(_.toSeq).toSeq
    assert(counts(s"$dir/c") == counts(s"$dir/ref"),
      "subtracted counts diverged from a from-scratch bootstrap on the remaining corpus")
    // replay of the committed retraction: version-level no-op
    val v = UpsertStore.latestVersion(spark, s"$dir/c")
    m.retract(docs.filter($"doc_id" === 2L), txnId = 1L)
    assert(UpsertStore.latestVersion(spark, s"$dir/c") == v,
      "replayed committed retraction advanced the store")
    // the persisted pre-mutation snapshot was pruned after the commit
    assert(UpsertStore.read(spark, s"$dir/c__retract_pending").forall(_.isEmpty),
      "committed retraction left its pending snapshot behind")
    // separate ledgers: a retract id (1) must not gate the ingest
    // sequence (next batch id 8), and the ingest ledger survives
    m.ingestBatch(Seq((5L, "en", "fresh words")).toDF("doc_id", "lang", "text"),
      Some(8L))
    assert(UpsertStore.read(spark, s"$dir/c").get
      .filter($"term" === "fresh").count() == 1,
      "post-retraction ingest was dropped")
    val v2 = UpsertStore.latestVersion(spark, s"$dir/c")
    m.ingestBatch(Seq((5L, "en", "fresh words")).toDF("doc_id", "lang", "text"),
      Some(8L))
    assert(UpsertStore.latestVersion(spark, s"$dir/c") == v2,
      "ingest ledger lost across the retraction — replayed batch re-merged")
  }

  test("round 19 (VERDICT r18 #1): dsir retract dedups a duplicate takedown batch — subtraction applies once") {
    // the 28e6c0a guard, regression-pinned: a doc repeated in the
    // compliance batch (two overlapping complaints) must subtract its
    // term counts ONCE — pre-guard, the raw batch double-subtracted
    // and the store drifted below the from-scratch truth
    val dir = tmp("graft-rp-dsirdup")
    val docs = Seq(
      (1L, "en", "the cat sat"),
      (2L, "en", "the cat ran"),
      (3L, "en", "the dog ran")).toDF("doc_id", "lang", "text")
    val m = new DsirMaintainer(spark, s"$dir/c")
    m.bootstrap(docs)
    val goneDup = docs.filter($"doc_id" === 2L)
      .unionByName(docs.filter($"doc_id" === 2L))
    m.retract(goneDup, txnId = 1L)
    val ref = new DsirMaintainer(spark, s"$dir/ref")
    ref.bootstrap(docs.filter($"doc_id" =!= 2L))
    def counts(p: String) = UpsertStore.read(spark, p).get
      .orderBy("term").collect().map(_.toSeq).toSeq
    assert(counts(s"$dir/c") == counts(s"$dir/ref"),
      "a doc repeated in the takedown batch subtracted twice")
  }

  test("rollup retract: exact subtraction ≡ from-scratch on the remaining log; emptied days lose rows") {
    val dir = tmp("graft-rp-roll")
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val ts1 = java.sql.Timestamp.valueOf("2024-03-02 11:00:00")
    val events = Seq(
      ("click", ts0, 1.5), ("click", ts0, 2.5), ("view", ts0, 1.0),
      ("click", ts1, 4.0)).toDF("event_type", "ts", "value")
    val m = new RollupMaintainer(spark, s"$dir/r")
    m.bootstrap(events)
    // retract the day-2 click (its rollup row empties) and one of the
    // two day-1 clicks (its row subtracts)
    val gone = events.filter($"value" === 4.0 || $"value" === 2.5)
    m.retract(gone, txnId = 1L)
    val ref = new RollupMaintainer(spark, s"$dir/ref")
    ref.bootstrap(events.filter($"value" =!= 4.0 && $"value" =!= 2.5))
    assert(m.serve().collect().toSeq == ref.serve().collect().toSeq,
      "subtracted rollup diverged from a from-scratch bootstrap (2-dp serve)")
    val v = UpsertStore.latestVersion(spark, s"$dir/r")
    m.retract(gone, txnId = 1L)
    assert(UpsertStore.latestVersion(spark, s"$dir/r") == v,
      "replayed committed retraction advanced the rollup")
    assert(UpsertStore.read(spark, s"$dir/r__retract_pending").forall(_.isEmpty))
  }

  test("quantile monitor rebuild-on-retract: estimates rebuild, ingest ledger survives, replay no-op") {
    val dir = tmp("graft-rp-kll")
    val m = new QuantileMonitor(spark, s"$dir/q")
    m.bootstrap((1 to 100).map(i => ("a", i.toDouble)).toDF("grp", "v"))
    m.ingestBatch((101 to 200).map(i => ("a", i.toDouble)).toDF("grp", "v"),
      Some(3L)) // ingest high-water = 3
    // takedown: values > 150 must be forgotten — rebuild on survivors
    val remaining = (1 to 150).map(i => ("a", i.toDouble)).toDF("grp", "v")
    m.retract(remaining, txnId = 1L)
    val ref = new QuantileMonitor(spark, s"$dir/ref")
    ref.bootstrap(remaining)
    def est(mm: QuantileMonitor) = mm.estimates(Seq(0.5, 0.9)).collect().toSeq
    assert(est(m) == est(ref),
      "rebuilt monitor diverged from a from-scratch bootstrap on survivors")
    // the rebuild preserved the ingest high-water mark: a replayed
    // stream batch (id 3) must still self-skip
    val v = UpsertStore.latestVersion(spark, s"$dir/q")
    m.ingestBatch((101 to 200).map(i => ("a", i.toDouble)).toDF("grp", "v"),
      Some(3L))
    assert(UpsertStore.latestVersion(spark, s"$dir/q") == v,
      "rebuild reset the ingest ledger — a replayed stream batch re-merged")
    // replayed committed retraction: version-level no-op
    m.retract(remaining, txnId = 1L)
    assert(UpsertStore.latestVersion(spark, s"$dir/q") == v)
  }

  test("theta + heavy + distinct rebuild-on-retract: ledger semantics (replay no-op, ingest mark survives)") {
    val dir = tmp("graft-rp-sk")
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val events = (1 to 60).map(i => (ts0, i.toLong)).toDF("ts", "user_id")
    val th = new ThetaMaintainer(spark, s"$dir/t")
    th.bootstrap(events)
    th.ingestBatch((61 to 80).map(i => (ts0, i.toLong)).toDF("ts", "user_id"), Some(2L))
    th.retract(events.filter($"user_id" <= 40), txnId = 1L)
    val vt = UpsertStore.latestVersion(spark, s"$dir/t")
    th.retract(events.filter($"user_id" <= 40), txnId = 1L)
    assert(UpsertStore.latestVersion(spark, s"$dir/t") == vt,
      "theta: replayed committed retraction advanced the store")
    th.ingestBatch((61 to 80).map(i => (ts0, i.toLong)).toDF("ts", "user_id"), Some(2L))
    assert(UpsertStore.latestVersion(spark, s"$dir/t") == vt,
      "theta: rebuild reset the manifest ingest ledger")

    val docs = Seq(("en", "a b c d"), ("en", "a a b x")).toDF("lang", "text")
    val hm = new HeavyMaintainer(spark, s"$dir/h")
    hm.bootstrap(docs)
    hm.ingestBatch(Seq(("en", "z z z")).toDF("lang", "text"), Some(2L))
    hm.retract(docs.limit(1), txnId = 1L)
    val vh = UpsertStore.latestVersion(spark, s"$dir/h")
    hm.retract(docs.limit(1), txnId = 1L)
    assert(UpsertStore.latestVersion(spark, s"$dir/h") == vh,
      "heavy: replayed committed retraction advanced the store")
    hm.ingestBatch(Seq(("en", "z z z")).toDF("lang", "text"), Some(2L))
    assert(UpsertStore.latestVersion(spark, s"$dir/h") == vh,
      "heavy: rebuild reset the manifest ingest ledger")

    val dm = new DistinctMonitor(spark, s"$dir/d")
    dm.bootstrap((1 to 50).map(i => ("a", i.toLong)).toDF("grp", "id"))
    dm.ingestBatch((51 to 60).map(i => ("a", i.toLong)).toDF("grp", "id"), Some(2L))
    val rem = (1 to 30).map(i => ("a", i.toLong)).toDF("grp", "id")
    dm.retract(rem, txnId = 1L)
    val refD = new DistinctMonitor(spark, s"$dir/dref")
    refD.bootstrap(rem)
    assert(dm.estimates().select("grp", "est").collect().toSeq ==
      refD.estimates().select("grp", "est").collect().toSeq,
      "distinct: rebuilt estimates diverged from a from-scratch bootstrap")
    val vd = UpsertStore.latestVersion(spark, s"$dir/d")
    // row-carried ingest mark survived the rebuild: batch 2 self-skips
    dm.ingestBatch((51 to 60).map(i => ("a", i.toLong)).toDF("grp", "id"), Some(2L))
    assert(UpsertStore.latestVersion(spark, s"$dir/d") == vd,
      "distinct: rebuild reset the row-carried ingest ledger")
  }
}
