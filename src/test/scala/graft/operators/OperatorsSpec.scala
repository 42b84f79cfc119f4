package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.functions.VectorFunctions

/** Cross-cutting operator properties on sf0.001 (oracle equivalence is
  * the driver's gate; these pin the semantics the oracle can't see —
  * approximation quality, recall, invariants). */
class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sf0001

  test("as-of join: every match is the latest signup at-or-before the event (naive recheck)") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts", $"event_type").collect()
    val signups = events.filter(_.getAs[String]("event_type") == "signup")
      .map(r => (r.getAs[Long]("user_id"), r.getAs[java.sql.Timestamp]("ts").getTime,
        r.getAs[Long]("event_id")))
    val expected = events.map { r =>
      val t = r.getAs[java.sql.Timestamp]("ts").getTime
      val cand = signups.filter(s => s._1 == r.getAs[Long]("user_id") && s._2 <= t)
      val best = if (cand.isEmpty) None
        else Some(cand.maxBy(s => (s._2, s._3))._3)
      r.getAs[Long]("event_id") -> best
    }.toMap
    val got = AsOf.q30AsOfJoin.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[java.lang.Long]("last_signup_event_id")).map(_.toLong)).toMap
    assert(got.size == expected.size)
    val diffs = expected.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toSeq}")
  }

  test("minhash LSH finds every high-Jaccard pair surfaced by the exact n-gram query") {
    val exact = Dedup.q46DedupNgramJaccard.fn(spark, sf)
      .filter($"jaccard" >= 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.q47DedupMinhash.fn(spark, sf)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val missed = exact -- lsh
    assert(missed.isEmpty, s"LSH missed high-jaccard pairs: ${missed.take(5)}")
  }

  test("simhash near-dup pairs respect the declared hamming bound") {
    val pairs = Dedup.q48DedupSimhash.fn(spark, sf).collect()
    assert(pairs.forall(_.getAs[Long]("hamming") <= 6))
  }

  test("ANN-LSH recall@3 vs brute force (16 tables x 6 planes)") {
    val truth = Similarity.q50AnnBruteForce.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val lsh = Similarity.q51AnnLsh.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (lsh.getOrElse(q, Set.empty) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    info(s"LSH recall@3 (16x6) = $recall")
    assert(recall >= 0.35, s"LSH recall collapsed: $recall")
    // approximation may MISS true neighbors but must not invent ids
    val ids = Tables.embeddings(spark, sf).select("vec_id").as[Long].collect().toSet
    assert(lsh.values.flatten.forall(ids.contains))
  }

  test("exact dedup keeps one representative per distinct text") {
    val docs = Tables.documents(spark, sf)
    val distinctTexts = docs.select("text").distinct().count()
    assert(Dedup.q45DedupExact.fn(spark, sf).count() == distinctTexts)
  }

  test("langid emits exactly one prediction per doc, from the profile set") {
    val out = TextAnalysis.q43LangId.fn(spark, sf)
    assert(out.count() == Tables.documents(spark, sf).count())
    val langs = out.select("lang_pred").distinct().as[String].collect().toSet
    assert(langs.subsetOf(Set("en", "fr", "es", "de", "zh")))
  }

  test("multimodal features: deterministic, fixed dim, L1-normalized") {
    val a = Multimodal.q54Multimodal.fn(spark, sf).collect()
    val b = Multimodal.q54Multimodal.fn(spark, sf).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq, "decode must be deterministic")
    assert(a.forall(_.getAs[Long]("feature_dim") == 16L))
    assert(a.forall(r => math.abs(r.getAs[Double]("feature_l1") - 1.0) < 0.01))
  }

  test("schema parity: encoder-derived == explicit StructType (SURVEY §1.3)") {
    import org.apache.spark.sql.types._
    val fromEncoder = org.apache.spark.sql.Encoders.product[OperatorsSpec.Traffic].schema
    val explicit = StructType(Seq(
      StructField("measurement_time", LongType, nullable = false),
      StructField("number_of_vehicles", IntegerType, nullable = false)))
    assert(fromEncoder == explicit)
  }

  test("approx_count_distinct within 5% of exact (the 100 TB distinct path)") {
    val li = Tables.lineitem(spark, sf)
    val (approx, exact) = li.agg(
      approx_count_distinct("l_partkey").as("a"),
      countDistinct("l_partkey").as("e")).as[(Long, Long)].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.05, s"approx=$approx exact=$exact")
  }
  test("IVF ANN: recall@3 vs brute force is measured and bounded") {
    val truth = Similarity.q50AnnBruteForce.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ivf = Similarity.q55AnnIvf.fn(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val hits = truth.map { case (q, t) => (ivf.getOrElse(q, Set.empty) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    info(s"IVF recall@3 = $recall")
    assert(recall >= 0.5, s"IVF recall collapsed: $recall")
    // IVF results are always true similarities (exact re-rank inside cells)
    val bogus = ivf.values.flatten.toSet -- Tables.embeddings(spark, sf)
      .select("vec_id").as[Long].collect().toSet
    assert(bogus.isEmpty)
  }
}

object OperatorsSpec {
  case class Traffic(measurement_time: Long, number_of_vehicles: Int)
}
