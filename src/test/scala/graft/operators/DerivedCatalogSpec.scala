package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.UpsertStore

/** Catalog addressability of the derived stores (VERDICT r7 #5): the
  * pair graph / cluster table / vector index registered as `graft.`
  * catalog tables — store path becomes table identity instead of an
  * env var — with the fingerprint gates unchanged and SQL reads
  * staying current through incremental maintenance. */
class DerivedCatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SharedSpark.spark
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-dcat").toString)
    }
    s
  }
  import spark.implicits._

  private val tA = (1 to 30).map(i => s"a$i")
  private val textA = tA.mkString(" ")
  private val textA2 = (tA.take(26) ++ (27 to 30).map(i => s"x$i")).mkString(" ")
  private val textA3 = (tA.take(24) ++ (25 to 30).map(i => s"y$i")).mkString(" ")
  private val textC = (1 to 30).map(i => s"c$i").mkString(" ")

  test("pair graph + clusters are SQL-addressable, gate-served, and current after extend") {
    val docs = Seq(1L -> textA, 2L -> textC, 10L -> textA2).toDF("doc_id", "text")
    val path = PairGraph.registerCatalog(spark, "pg_demo", docs, "dcat-pairs", 0.6)

    val viaSql = spark.sql("SELECT doc_a, doc_b FROM graft.pg_demo")
      .as[(Long, Long)].collect().toSet
    assert(viaSql == Set((1L, 10L)), s"SQL read of the pair table: $viaSql")
    val clustersSql = spark.sql("SELECT doc_id, label FROM graft.pg_demo__clusters")
      .as[(Long, Long)].collect().toSet
    assert(clustersSql == Set((1L, 1L), (10L, 1L)), s"SQL cluster read: $clustersSql")

    // re-register with the same corpus: the gate serves, nothing rebuilds
    val v = UpsertStore.latestVersion(spark, path)
    assert(PairGraph.registerCatalog(spark, "pg_demo", docs, "dcat-pairs", 0.6) == path)
    assert(UpsertStore.latestVersion(spark, path) == v,
      "same-corpus re-register must hit the fingerprint gate")

    // incremental maintenance against the returned path keeps SQL current
    val delta = Seq(11L -> textA3).toDF("doc_id", "text")
    PairGraph.extend(spark, delta, "dcat-pairs", 0.6, Some(path))
    PairGraph.updateClusters(spark, delta, "dcat-pairs", 0.6, Some(path))
    val after = spark.sql("SELECT doc_id, label FROM graft.pg_demo__clusters")
      .as[(Long, Long)].collect().toSet
    assert(after == Set((1L, 1L), (10L, 1L), (11L, 1L)),
      s"SQL read must see the extended cluster state: $after")
  }

  test("trigram + simhash stores are SQL-addressable and gate-served (r15)") {
    val docs = Seq(1L -> "alpha beta gamma", 2L -> "the alphabet soup",
      3L -> textC).toDF("doc_id", "text")
    val triPath = TrigramIndex.registerCatalog(spark, "tri_demo", docs)
    val triDf = spark.sql("SELECT df FROM graft.tri_demo__df WHERE gram = 'alp'")
      .as[Long].collect().toSeq
    assert(triDf == Seq(2L), s"trigram df via SQL: $triDf")
    val vTri = UpsertStore.latestVersion(spark, triPath)
    assert(TrigramIndex.registerCatalog(spark, "tri_demo", docs) == triPath)
    assert(UpsertStore.latestVersion(spark, triPath) == vTri,
      "same-corpus trigram re-register must hit the fingerprint gate")

    val shDocs = Seq(1L -> textA, 2L -> textC).toDF("doc_id", "text")
    val shPath = SimhashIndex.registerCatalog(spark, "sh_demo", shDocs)
    assert(spark.sql("SELECT count(*) FROM graft.sh_demo").as[Long].head() == 2L)
    assert(spark.sql("SELECT count(DISTINCT chunk) FROM graft.sh_demo__chunks")
      .as[Long].head() == 8L, "8 banded chunks per fingerprint")
    val vSh = UpsertStore.latestVersion(spark, shPath)
    assert(SimhashIndex.registerCatalog(spark, "sh_demo", shDocs) == shPath)
    assert(UpsertStore.latestVersion(spark, shPath) == vSh,
      "same-corpus simhash re-register must hit the fingerprint gate")
  }

  test("vector index cells + centroids are SQL-addressable and gate-served") {
    val e = (i: Int) => Seq.tabulate(4)(j => if (j == i % 4) 1f else 0.05f * (i % 3))
    val emb = (0L to 9L).map(i => i -> e(i.toInt)).toDF("vec_id", "embedding")
    val path = VectorIndex.registerCatalog(spark, "vx_demo", emb, "dcat-vecs", 4)

    val cells = spark.sql("SELECT vec_id, cell FROM graft.vx_demo")
      .as[(Long, Long)].collect().toMap
    assert(cells.size == 10, s"one cell row per vector: $cells")
    val cents = spark.sql("SELECT centroid_id FROM graft.vx_demo__centroids")
      .as[Long].collect().toSet
    assert(cents == Set(0L, 1L, 2L, 3L), s"seed centroids: $cents")

    val v = UpsertStore.latestVersion(spark, path)
    VectorIndex.registerCatalog(spark, "vx_demo", emb, "dcat-vecs", 4)
    assert(UpsertStore.latestVersion(spark, path) == v,
      "same-corpus re-register must hit the fingerprint gate")

    VectorIndex.extend(spark, Seq(20L -> e(1)).toDF("vec_id", "embedding"),
      "dcat-vecs", 4, Some(path))
    val n = spark.sql("SELECT COUNT(*) AS n FROM graft.vx_demo").as[Long].head()
    assert(n == 11L, s"SQL read must see the extended cell table: $n")
  }

  test("VERDICT r15 #7: catalog stores report stats — hint-free serves still broadcast every probe join") {
    // the four catalog SQL serves carried 11 /*+ BROADCAST */ hints
    // until r16; stores now surface manifest-listed sizes
    // (BaseRelation.sizeInBytes on the V1 path; SupportsReportStatistics
    // on the V2 scan), which lets AQE's runtime re-plan broadcast every
    // EQUI-join without a hint — 8 hints deleted in r16. The last 3
    // (q100/q186 centroid CROSS JOINs, q106 single-row stats) died in
    // r17 (VERDICT r16 #6): Spark's V1ScanWrapper hides scan-level
    // stats from the STATIC planner and AQE never rewrites a
    // CartesianProduct, so instead each metadata-sized side now rides
    // as a grouping-free AGGREGATE (collect_list array exploded per
    // row / max() over the one stats row) — an Aggregate without
    // grouping keys is provably one row to the static planner, no scan
    // stats needed, so the cross joins broadcast hint-free. Zero
    // /*+ BROADCAST */ remain in main. The pin below is on the FINAL
    // adaptive plan, which is what executes.
    val sf = graft.SharedSpark.sf0001
    for ((name, q) <- Seq(
        "q100" -> Similarity.q100CatalogAnn, "q106" -> Retrieval.q106CatalogBm25,
        "q127" -> Similarity.q127CatalogPqSql, "q186" -> Similarity.q186CatalogIvfPqSql)) {
      val df = q.fn(spark, sf)
      assert(df.collect().nonEmpty, s"$name returned nothing")
      val finalPlan = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(finalPlan.contains("Broadcast"), s"$name lost its broadcasts:\n$finalPlan")
      assert(!finalPlan.contains("SortMergeJoin"),
        s"$name's final plan sort-merges a join the stats should broadcast:\n$finalPlan")
      assert(!finalPlan.contains("CartesianProduct"),
        s"$name's final plan has an unbroadcast cartesian:\n$finalPlan")
    }
  }
}
