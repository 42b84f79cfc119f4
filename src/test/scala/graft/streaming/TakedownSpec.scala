package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.Dedup

/** The takedown lifecycle (round 17 — VERDICT r16 #1): retracting a
  * document set from the curation maintainer must leave EVERY stage
  * store ≡ a from-scratch bootstrap over the remaining corpus. The
  * fixture plants the hard transitions: a retracted exact-dup
  * CANONICAL whose surviving duplicate must be promoted (seen-table
  * re-point, decision flip, facts flip), a retracted near-dup BRIDGE
  * whose cluster must SPLIT (re-solved components, min-member
  * relabels, new representatives, new split buckets), and a retracted
  * plain doc. Also pinned: ledgered replay of a committed retraction
  * is a version-level no-op, and the retract composes with later
  * ingests. */
class TakedownSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  // near-dup chain with a BRIDGE: A~B (shared 24-token prefix,
  // J≈0.65), B~C (shared prefix + shared x-run, J≈0.70), A!~C
  // (J≈0.51 < 0.6) — retracting B must split {A,B,C} into {A}, {C}
  private val aToks = (1 to 30).map(i => s"a$i")
  private val textA = aToks.mkString(" ")
  private val textB = (aToks.take(24) ++ (1 to 6).map(i => s"x$i")).mkString(" ")
  private val textC = (aToks.take(21) ++ (1 to 9).map(i => s"x$i")).mkString(" ")
  private val textD = (1 to 30).map(i => s"d$i").mkString(" ")
  private val textQ = (1 to 30).map(i => s"q$i").mkString(" ")

  private val corpus = Seq(
    1L -> textD,  // exact-dup canonical — RETRACTED
    2L -> textA,  // chain end A
    3L -> textQ,  // plain kept doc
    11L -> textD, // surviving duplicate: must be PROMOTED to 'new'
    12L -> textB, // chain bridge B — RETRACTED → cluster splits
    21L -> textD, // second surviving duplicate (stays duplicate of 11)
    22L -> textC) // chain end C
  private val goneIds = Set(1L, 12L)

  private def docsDf(docs: Seq[(Long, String)]) =
    docs.toDF("doc_id", "text")

  private def writeCorpus(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("takedown-oracle").toString
    docs.map { case (i, t) => (i, t, "en", "t", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("retract ≡ from-scratch bootstrap on the remaining corpus (promotion + cluster split)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-takedown").toString
    val mm = new ManifestMaintainer(spark, "takedown-spec", s"$dir/store")
    mm.bootstrap(docsDf(corpus))
    // sanity on the pre-retract state: {2,12,22} one cluster, 11/21 dups
    val pre = mm.current.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(pre(11L) == "exact_dup" && pre(21L) == "exact_dup" && pre(12L) == "near_dup")

    val gone = docsDf(corpus.filter(c => goneIds(c._1)))
    mm.retract(gone, txnId = 1L)

    val after = mm.current.collect().map(r =>
      (r.getLong(0), r.getBoolean(1), r.getString(2), r.getString(3))).toSet
    val remainingDir = writeCorpus(corpus.filterNot(c => goneIds(c._1)))
    val fromScratch = Dedup.q156TrainingManifest.fn(spark, remainingDir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2), r.getString(3))).toSet
    assert(after == fromScratch,
      s"missing=${(fromScratch -- after).take(5)} extra=${(after -- fromScratch).take(5)}")

    // the transitions actually happened
    val reasons = after.map(t => t._1 -> t._3).toMap
    assert(!reasons.contains(1L) && !reasons.contains(12L),
      "retracted docs must vanish from the manifest")
    assert(reasons(11L) == "kept",
      s"surviving duplicate must be promoted to canonical: $reasons")
    assert(reasons(2L) == "kept" && reasons(22L) == "kept",
      s"bridge retraction must split the chain into two kept singletons: $reasons")
    // gate state: seen-table re-pointed, decisions flipped
    val dec = mm.gate.decisions().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(dec(11L) == (11L, "new") && dec(21L) == (11L, "duplicate"),
      s"gate must re-point the hash group to the min survivor: $dec")
    assert(!dec.contains(1L) && !dec.contains(12L))
    // cluster table: chain rows gone (both ends are now pairless)
    val ct = mm.clusterM.current.collect().map(_.getLong(0)).toSet
    assert(!ct.contains(12L) && !ct.contains(2L) && !ct.contains(22L),
      s"split singletons must leave the cluster table (absent = self): $ct")
  }

  test("ledgered replay of a committed retraction is a version-level no-op; later ingests compose") {
    val dir = java.nio.file.Files.createTempDirectory("graft-takedown-replay").toString
    val mm = new ManifestMaintainer(spark, "takedown-replay", s"$dir/store")
    mm.bootstrap(docsDf(corpus))
    val gone = docsDf(corpus.filter(c => goneIds(c._1)))
    mm.retract(gone, txnId = 1L)
    val before = mm.current.collect().map(_.toSeq).toSet
    val v = UpsertStore.latestVersion(spark, s"$dir/store__manifest")
    mm.retract(gone, txnId = 1L) // at-least-once delivery replays
    assert(UpsertStore.latestVersion(spark, s"$dir/store__manifest") == v,
      "replayed committed retraction advanced the manifest store")
    assert(mm.current.collect().map(_.toSeq).toSet == before)
    // ADVICE r17: the committed retraction pruned its persisted
    // blast-radius scope — only an IN-FLIGHT txn's scope is ever read,
    // so committed rows must not accumulate across takedowns
    assert(UpsertStore.read(spark, s"$dir/store__retract_scope")
      .forall(_.isEmpty),
      "committed retraction left its blast-radius scope rows behind")

    // a later batch ingests cleanly after the retraction — including a
    // RE-INGEST of the retracted canonical's content under a new id,
    // which must read as a duplicate of the PROMOTED canonical
    mm.ingestBatch(docsDf(Seq(31L -> textD)), Some(2L))
    val dec = mm.gate.decisions().collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(dec(31L) == (11L, "duplicate"),
      s"re-ingested content must dedup against the promoted canonical: $dec")
    val after = mm.current.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(after(31L) == "exact_dup")

    // full-corpus equivalence after retract + ingest
    val remainingDir = writeCorpus(
      corpus.filterNot(c => goneIds(c._1)) :+ (31L -> textD))
    val fromScratch = Dedup.q156TrainingManifest.fn(spark, remainingDir).collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getString(2), r.getString(3))).toSet
    val streamed = mm.current.collect().map(r =>
      (r.getLong(0), r.getBoolean(1), r.getString(2), r.getString(3))).toSet
    assert(streamed == fromScratch,
      s"missing=${(fromScratch -- streamed).take(5)} extra=${(streamed -- fromScratch).take(5)}")
  }

  test("retracting a whole exact-dup group empties its seen row — re-ingest reads as new") {
    val dir = java.nio.file.Files.createTempDirectory("graft-takedown-empty").toString
    val mm = new ManifestMaintainer(spark, "takedown-empty", s"$dir/store")
    mm.bootstrap(docsDf(corpus))
    // retract the ENTIRE textD group
    mm.retract(docsDf(corpus.filter(c => Set(1L, 11L, 21L)(c._1))), txnId = 1L)
    val dec = mm.gate.decisions().collect().map(_.getLong(0)).toSet
    assert(!dec.contains(1L) && !dec.contains(11L) && !dec.contains(21L))
    // the content comes back under a fresh id: it must be NEW again
    mm.ingestBatch(docsDf(Seq(40L -> textD)), Some(2L))
    val dec2 = mm.gate.decisions().collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(dec2(40L) == "new",
      s"content with no surviving copy must re-ingest as new: $dec2")
  }
}
