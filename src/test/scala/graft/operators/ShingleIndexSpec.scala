package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.UpsertStore

/** The materialized train-gram contamination index: probe semantics on
  * a hand-built corpus, the fingerprint gate, extend ≡ rebuild, txn
  * replay, and the dirty-refusal crash rule ([[ShingleIndex]]). */
class ShingleIndexSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // 10 tokens → three 8-grams per doc
  private val leaked = "a b c d e f g h i j"
  private def uniqueText(i: Long) = (1 to 10).map(t => s"u${i}x$t").mkString(" ")

  test("probe: a leaked eval doc reports its train source; clean docs are absent") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shidx").toString
    val train = docsDf((2L to 8L).map(i => i -> uniqueText(i)) :+ (1L -> leaked): _*)
    ShingleIndex.ensure(spark, train, s"$dir/idx")
    val eval = docsDf(100L -> leaked, 101L -> uniqueText(101L))
    val out = ShingleIndex.probe(spark, s"$dir/idx", eval)
      .as[(Long, Long, Long)].collect().toSeq
    // doc 100 shares all 3 of doc 1's 8-grams; doc 101 shares nothing
    assert(out == Seq((100L, 1L, 3L)), s"got $out")

    // a gram in > dfCap train docs is a stop gram: with cap 0 nothing matches
    assert(ShingleIndex.probe(spark, s"$dir/idx", eval, dfCap = 0).isEmpty,
      "cap 0 must prune every gram")

    // gate: same corpus again → no rebuild
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    ShingleIndex.ensure(spark, train, s"$dir/idx")
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "matching fingerprint must not rebuild")
    // changed corpus → rebuild
    ShingleIndex.ensure(spark, train.filter($"doc_id" =!= 5L), s"$dir/idx")
    assert(UpsertStore.latestVersion(spark, s"$dir/idx").get > v.get,
      "corpus change must rebuild")
  }

  test("extend ≡ rebuild; committed-txn replay skips; dirty meta refuses to probe") {
    val dir = java.nio.file.Files.createTempDirectory("graft-shidx-ext").toString
    val base = docsDf((1L to 6L).map(i => i -> uniqueText(i)): _*)
    val delta = docsDf(7L -> uniqueText(7L), 8L -> leaked)
    val eval = docsDf(100L -> leaked)

    ShingleIndex.ensure(spark, base, s"$dir/grown")
    ShingleIndex.extend(spark, delta, s"$dir/grown", txnId = Some(1L))
    ShingleIndex.ensure(spark, base.unionByName(delta), s"$dir/scratch")
    val grown = ShingleIndex.probe(spark, s"$dir/grown", eval)
      .as[(Long, Long, Long)].collect().toSeq
    val scratch = ShingleIndex.probe(spark, s"$dir/scratch", eval)
      .as[(Long, Long, Long)].collect().toSeq
    assert(grown == scratch && grown == Seq((100L, 1L, 3L)),
      s"grown=$grown scratch=$scratch")

    // the advanced fingerprint equals the full corpus's: gate hit
    val v = UpsertStore.latestVersion(spark, s"$dir/grown")
    ShingleIndex.ensure(spark, base.unionByName(delta), s"$dir/grown")
    assert(UpsertStore.latestVersion(spark, s"$dir/grown") == v,
      "full-corpus ensure after extend must hit the gate")

    // replayed txn is a no-op
    ShingleIndex.extend(spark, delta, s"$dir/grown", txnId = Some(1L))
    assert(UpsertStore.latestVersion(spark, s"$dir/grown") == v,
      "replayed txnId must self-skip")

    // dirty meta (simulated crash) refuses to probe; ensure recovers
    UpsertStore.replace(spark, s"$dir/grown__meta",
      spark.range(1).select(lit(1L).as("meta_id"), lit(-1L).as("corpus_n"),
        lit(0L).as("corpus_h"), lit(true).as("dirty"), lit(-1L).as("txn")),
      Seq("meta_id"))
    intercept[IllegalArgumentException] {
      ShingleIndex.probe(spark, s"$dir/grown", eval).count()
    }
    ShingleIndex.ensure(spark, base.unionByName(delta), s"$dir/grown")
    assert(ShingleIndex.probe(spark, s"$dir/grown", eval)
      .as[(Long, Long, Long)].collect().toSeq == Seq((100L, 1L, 3L)))
  }

  test("catalog registration serves the gram postings via SQL") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-shcat").toString)
    }
    val train = docsDf(1L -> leaked, 2L -> uniqueText(2L))
    ShingleIndex.registerCatalog(spark, "sh_idx", train)
    // doc 1 and doc 2 contribute 3 distinct 8-grams each
    val counts = spark.sql(
      "SELECT doc_id, count(*) AS n FROM graft.sh_idx GROUP BY doc_id ORDER BY doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(counts == Seq((1L, 3L), (2L, 3L)), s"got $counts")
    assert(spark.sql("SELECT max(dfreq) FROM graft.sh_idx__df").head().getLong(0) == 1L)
  }

  test("q108 index-served ≡ a from-scratch recompute of the same scan") {
    val sf = SharedSpark.sf0001
    val out = Pipeline.q108ContaminationIndexed.fn(spark, sf)
      .as[(Long, Long, Long)].collect().toSeq
    // independent recompute: q61's machinery restricted to the
    // train-df-pruned semantics, without the store
    val docs = graft.Tables.documents(spark, sf)
    val b = (col("doc_id") * lit(2654435761L)) % lit(4294967296L) % 100
    val train = ShingleIndex.grams(docs.filter(b < 80), 8)
    val stop = train.groupBy("g").agg(count(lit(1)).as("dfreq"))
      .filter(col("dfreq") > 50).select("g")
    val pruned = train.join(stop, Seq("g"), "left_anti")
      .select(col("doc_id").as("train_doc"), col("g"))
    val expect = ShingleIndex.grams(docs.filter(b >= 90), 8)
      .select(col("doc_id").as("test_doc"), col("g"))
      .join(pruned, "g")
      .groupBy("test_doc", "train_doc").agg(count(lit(1)).as("shared"))
      .groupBy("test_doc")
      .agg(count(lit(1)).as("n_train_docs"), max("shared").cast("long").as("max_shared"))
      .orderBy("test_doc")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == expect, s"served=${out.take(3)} scratch=${expect.take(3)}")
    assert(out.nonEmpty, "sf0.001 must contain at least one contaminated eval doc")
  }
}
