package graft.functions

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.{HeavyMaintainer, UpsertStore}

/** Misra–Gries heavy hitters ([[MgSummary]] and the q169/q170 surface):
  * the MG theorems — est ≤ true and true − est ≤ N/(k+1), for any
  * merge tree — are what the bound-flag oracle leans on, so they are
  * pinned here under FORCED eviction (k far below the distinct count),
  * for the live map, the serialized/merge path, and the maintainer's
  * arbitrary batch slicings. */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import HeavyHittersSpec._

  /** Skewed deterministic stream: token i appears ~ proportionally to
    * its rank, plus a long tail of singletons — 60 distinct terms. */
  private val stream: Seq[String] =
    (1 to 10).flatMap(i => Seq.fill(11 - i)(s"hot$i")) ++
      (1 to 50).map(i => s"tail$i")
  private val trueCounts: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
  private val n = stream.size.toLong

  private def checkBounds(est: Map[String, Long], k: Int): Unit = {
    val errCap = n / (k + 1)
    est.foreach { case (t, e) =>
      assert(e <= trueCounts(t), s"$t overestimated: $e > ${trueCounts(t)}")
    }
    trueCounts.foreach { case (t, c) =>
      assert(c - est.getOrElse(t, 0L) <= errCap,
        s"$t outside bound: true $c, est ${est.getOrElse(t, 0L)}, cap $errCap")
      if (c > errCap)
        assert(est.getOrElse(t, 0L) > 0, s"guaranteed hitter $t not detected")
    }
  }

  test("mg_sketch: bounds hold under forced eviction, any partitioning") {
    val k = 8 // 60 distinct terms → constant eviction
    for (parts <- Seq(1, 3, 7)) {
      val df = stream.toDF("term").repartition(parts)
      val est = df.agg(HeavyFunctions.mg_sketch(col("term"), k).as("mg"))
        .select(explode(col("mg"))).as[(String, Long)].collect().toMap
      assert(est.size <= k, s"more than k live counters: ${est.size}")
      checkBounds(est, k)
    }
  }

  test("mg_sketch_bytes + mg_sketch_merge: the store-advance fold keeps the bounds") {
    val k = 8
    // three shard summaries (grouped aggregate), folded distributively
    val shards = stream.zipWithIndex
      .map { case (t, i) => (i % 3, t) }.toDF("shard", "term")
      .groupBy("shard")
      .agg(HeavyFunctions.mg_sketch_bytes(col("term"), k).as("sk"))
    val folded = shards.agg(HeavyFunctions.mg_sketch_merge(col("sk"), k).as("sk"))
    val est = folded
      .select(explode(HeavyFunctions.mg_entries(col("sk"))).as("e"))
      .select(col("e.term"), col("e.est")).as[(String, Long)].collect().toMap
    checkBounds(est, k)
    val total = folded.select(HeavyFunctions.mg_n(col("sk")))
      .as[Long].collect()(0)
    assert(total == n, s"absorbed-count N drifted: $total != $n")
  }

  test("mg_entries: decode is (est desc, term asc) and agrees with the live map") {
    val k = 8
    val one = stream.toDF("term").coalesce(1)
    val viaMap = one.agg(HeavyFunctions.mg_sketch(col("term"), k).as("mg"))
      .select(explode(col("mg"))).as[(String, Long)].collect().toMap
    val decoded = one.agg(HeavyFunctions.mg_sketch_bytes(col("term"), k).as("sk"))
      .select(explode(HeavyFunctions.mg_entries(col("sk"))).as("e"))
      .select(col("e.term"), col("e.est")).as[(String, Long)].collect().toSeq
    assert(decoded.toMap == viaMap, "decoded entries diverge from the live map")
    val resorted = decoded.sortBy { case (t, c) => (-c, t) }
    assert(decoded == resorted, s"entries not (est desc, term asc): $decoded")
  }

  private val corpus = Seq(
    Doc(1, "en", "the cat sat on the mat the end"),
    Doc(2, "en", "the dog ate the bone"),
    Doc(3, "fr", "le chat et le chien et le loup"),
    Doc(4, "fr", "le pain et la mer"),
    Doc(5, "en", "a cat and a dog and the bird"),
    Doc(6, "de", "der hund und die katze und der igel"))

  private def served(m: HeavyMaintainer): Seq[(String, String, Long, Boolean, Boolean)] =
    m.serve(corpus.toDF()).as[(String, String, Long, Boolean, Boolean)]
      .collect().toSeq

  private def oneShot(dir: String, k: Int): Seq[(String, String, Long, Boolean, Boolean)] = {
    val ref = new HeavyMaintainer(spark, s"$dir/ref", k)
    ref.bootstrap(corpus.toDF())
    served(ref)
  }

  test("heavy maintainer: streamed summaries serve the one-shot contract; replay is add-safe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-m").toString
    val m = new HeavyMaintainer(spark, s"$dir/c")
    m.bootstrap(corpus.take(3).toDF())
    m.ingestBatch(corpus.slice(3, 5).toDF(), txnId = Some(0L))
    val v = UpsertStore.latestVersion(spark, s"$dir/c")
    m.ingestBatch(corpus.slice(3, 5).toDF(), txnId = Some(0L))
    assert(UpsertStore.latestVersion(spark, s"$dir/c") == v,
      "replayed batch advanced the store")
    m.ingestBatch(corpus.drop(5).toDF(), txnId = Some(1L))
    val got = served(m)
    assert(got == oneShot(dir, 2048),
      "streamed heavy-hitter serve diverged from the one-shot bootstrap")
    assert(got.nonEmpty && got.forall(r => r._4 && r._5),
      s"MG guarantees violated on the maintained store: $got")
  }

  test("heavy maintainer: bounds survive batch slicing even in eviction mode (tiny k)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-e").toString
    val k = 3 // far under every language's vocabulary → every merge truncates
    val m = new HeavyMaintainer(spark, s"$dir/c", k)
    m.bootstrap(corpus.take(2).toDF())
    m.ingestBatch(corpus.slice(2, 4).toDF(), txnId = Some(0L))
    m.ingestBatch(corpus.drop(4).toDF(), txnId = Some(1L))
    // Sketch CONTENTS legitimately differ from one-shot under
    // truncation, and `detected` is only guaranteed above the error
    // cap — so assert the THEOREMS, not row equality: within_bound
    // everywhere, detected wherever exact > ⌊N_lang/(k+1)⌋.
    val langTotals = corpus.groupBy(_.lang).view.mapValues(
      _.flatMap(_.text.toLowerCase.split("\\s+")).count(_.nonEmpty).toLong).toMap
    val got = served(m)
    assert(got.nonEmpty && got.forall(_._5),
      s"within_bound violated under eviction: $got")
    got.foreach { case (lang, term, cnt, detected, _) =>
      if (cnt > langTotals(lang) / (k + 1))
        assert(detected, s"guaranteed hitter ($lang, $term, $cnt) not detected")
    }
  }

  test("heavy maintainer foreachBatch wiring + checkpoint restart: nothing lost, nothing doubled") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-hh-fb").toString
    val m = new HeavyMaintainer(spark, s"$dir/c")
    m.bootstrap(corpus.take(2).toDF())
    val input = MemoryStream[Doc]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(corpus.slice(2, 4): _*)
    q.processAllAvailable()
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(corpus.drop(4): _*)
    q2.processAllAvailable()
    q2.stop()
    assert(served(m) == oneShot(dir, 2048),
      "post-restart heavy-hitter serve must equal the from-scratch bootstrap")
  }
}

object HeavyHittersSpec {
  case class Doc(doc_id: Long, lang: String, text: String)
}
