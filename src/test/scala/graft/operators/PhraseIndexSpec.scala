package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The positional phrase index ([[PhraseIndex]], q191 — round 16).
  * Pinned: serve ≡ a driver-side brute-force positional scan
  * (multi-term, repeated-term with OVERLAPPING occurrences,
  * single-term ≡ tf, absent phrase empty), extend ≡ from-scratch
  * build at both the store and serve level, and replay idempotence
  * (the same batch extended twice changes nothing — position arrays
  * recompute byte-identically under the same keys). */
class PhraseIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "a a a quick brown"),         // 'a a' overlaps: starts 0,1
    (2L, "the quick brown fox"),
    (3L, "quick brown quick brown"),   // 'quick brown' twice
    (4L, "brown quick"),               // reversed — NOT a phrase hit
    (5L, "a lone a"))

  /** Brute force: all starts s where every phrase token matches. */
  private def brute(phrase: String): Seq[(String, Long, Long)] = {
    val ps = phrase.toLowerCase.split("\\s+").toSeq
    docs.flatMap { case (id, text) =>
      val ts = text.toLowerCase.split("\\s+").toSeq
      val n = (0 to ts.length - ps.length)
        .count(s => ps.indices.forall(i => ts(s + i) == ps(i)))
      if (n > 0) Some((phrase, id, n.toLong)) else None
    }.sortBy(r => (r._1, r._2))
  }

  private def served(path: String, phrases: Seq[String]): Seq[(String, Long, Long)] =
    PhraseIndex.search(spark, path, phrases.toDF("query"))
      .orderBy("query", "doc_id")
      .as[(String, Long, Long)].collect().toSeq

  test("serve ≡ brute force: multi-term, overlapping repeated-term, single-term tf, absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase").toString
    PhraseIndex.build(spark, docs.toDF("doc_id", "text"), s"$dir/idx")
    val phrases = Seq("quick brown", "a a", "brown", "zz absent")
    assert(served(s"$dir/idx", phrases) ==
      phrases.flatMap(brute).sortBy(r => (r._1, r._2)))
    // the cases that make positions load-bearing, spelled out:
    val byQ = served(s"$dir/idx", phrases).groupBy(_._1)
    assert(byQ("a a").toSet == Set(("a a", 1L, 2L)),
      "'a a' in 'a a a' must count BOTH overlapping starts and skip 'a lone a'")
    assert(byQ("quick brown").map(r => r._2 -> r._3).toSet ==
      Set(1L -> 1L, 2L -> 1L, 3L -> 2L),
      "doc 4's reversed 'brown quick' must not match; doc 3 counts twice")
    assert(!byQ.contains("zz absent"))
  }

  test("searchNear ≡ brute-force anchor-NEAR: window boundary exact, missing term kills, single-term ≡ tf") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-near").toString
    PhraseIndex.build(spark, docs.toDF("doc_id", "text"), s"$dir/idx")
    def bruteNear(phrase: String, w: Int): Seq[(String, Long, Long)] = {
      val ps = phrase.toLowerCase.split("\\s+").toSeq.distinct
      docs.flatMap { case (id, text) =>
        val ts = text.toLowerCase.split("\\s+").toSeq
        val present = ps.forall(ts.contains)
        val anchors = ts.indices.filter(ts(_) == ps.head)
          .count(p => ps.tail.forall(t =>
            ts.indices.exists(q => ts(q) == t && math.abs(q - p) <= w)))
        if (present && anchors > 0) Some((phrase, id, anchors.toLong)) else None
      }.sortBy(r => (r._1, r._2))
    }
    def near(phrases: Seq[String], w: Int): Seq[(String, Long, Long)] =
      PhraseIndex.searchNear(spark, s"$dir/idx", phrases.toDF("query"), w)
        .orderBy("query", "doc_id").as[(String, Long, Long)].collect().toSeq
    val phrases = Seq("quick fox", "brown a", "brown", "quick zz")
    for (w <- Seq(1, 2, 3))
      assert(near(phrases, w) == phrases.flatMap(bruteNear(_, w)).sortBy(r => (r._1, r._2)),
        s"NEAR/$w diverged from brute force")
    // boundary spelled out: doc 2 'the quick brown fox' — quick@1,
    // fox@3 → NEAR/2 matches, NEAR/1 does not
    assert(near(Seq("quick fox"), 2).exists(_._2 == 2L))
    assert(!near(Seq("quick fox"), 1).exists(_._2 == 2L),
      "NEAR/1 must reject a distance-2 pair — window boundary off by one")
  }

  test("extend ≡ from-scratch build; replayed extend is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phrase-ext").toString
    val df = docs.toDF("doc_id", "text")
    val phrases = Seq("quick brown", "a a", "brown")

    PhraseIndex.build(spark, df, s"$dir/full")
    PhraseIndex.build(spark, df.filter($"doc_id" <= 3), s"$dir/inc")
    PhraseIndex.extend(spark, df.filter($"doc_id" > 3), s"$dir/inc")
    assert(served(s"$dir/inc", phrases) == served(s"$dir/full", phrases),
      "build(80%) + extend(20%) must serve exactly as a from-scratch build")

    val before = served(s"$dir/inc", phrases)
    PhraseIndex.extend(spark, df.filter($"doc_id" > 3), s"$dir/inc")
    assert(served(s"$dir/inc", phrases) == before,
      "a replayed extend recomputes identical position arrays — serve unchanged")
  }
}
