package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.streaming.UpsertStore

/** Materialize-once pair graph: compute → persist → reuse, with the
  * corpus-fingerprint gate that keeps a stale graph from ever being
  * served (VERDICT r6 #2). */
class PairGraphSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._

  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("pairgraph_spec").toString
    s"$d/store"
  }

  test("stored pairs equal the direct computation, and the second call reuses the table") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    val direct = Dedup.exactNearDupPairs(docs, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val first = PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(first == direct, "persistence roundtrip must be invisible")
    val v1 = UpsertStore.latestVersion(spark, path)
    assert(v1.nonEmpty, "first call must materialize the store")
    val second = PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(second == direct)
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "matching fingerprint must NOT rewrite the store")
  }

  test("corpus change flips the fingerprint and forces a recompute") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
    val v1 = UpsertStore.latestVersion(spark, path).get

    // same doc_ids, one text changed: a stale graph would still "fit"
    // structurally — only the fingerprint can catch it
    val mutated = docs.withColumn("text",
      when($"doc_id" === docs.agg(min("doc_id")).head().getLong(0),
        concat($"text", lit(" MUTATED TAIL TOKENS"))).otherwise($"text"))
    val (n1, h1) = PairGraph.corpusFingerprint(docs)
    val (n2, h2) = PairGraph.corpusFingerprint(mutated)
    assert(n1 == n2 && h1 != h2, "fingerprint must move on content change")

    PairGraph.pairGraph(spark, mutated, sf, 0.6, Some(path))
    assert(UpsertStore.latestVersion(spark, path).get > v1,
      "fingerprint mismatch must rewrite the store")
  }

  test("incremental extend equals the from-scratch graph over the grown corpus") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    // split the corpus: first 80% is the "old" corpus, rest arrives later
    val cut = docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong
    val old = docs.filter($"doc_id" <= cut)
    val delta = docs.filter($"doc_id" > cut)
    assert(delta.count() > 0 && old.count() > 0)

    PairGraph.pairGraph(spark, old, sf, 0.6, Some(path))
    PairGraph.extend(spark, delta, sf, 0.6, Some(path))

    val viaExtend = PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
    val v1 = UpsertStore.latestVersion(spark, path)
    val stored = viaExtend
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    // serving the grown corpus hit the advanced fingerprint — no rewrite
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "extend must leave the store fingerprint-current for the grown corpus")
    val scratch = Dedup.exactNearDupPairs(docs, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(stored == scratch,
      s"extend diverged from scratch: missing=${(scratch -- stored).take(5)} " +
        s"extra=${(stored -- scratch).take(5)}")
  }

  test("extend refuses a mismatched tau and a missing store") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    intercept[RuntimeException] {
      PairGraph.extend(spark, docs, sf, 0.6, Some(path))
    }
    PairGraph.pairGraph(spark, docs, sf, 0.6, Some(path))
    intercept[IllegalArgumentException] {
      PairGraph.extend(spark, docs.limit(1), sf, 0.7, Some(path))
    }
  }

  test("incremental cluster update equals from-scratch components, and serving hits the gate") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    val cut = docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong
    val old = docs.filter($"doc_id" <= cut)
    val delta = docs.filter($"doc_id" > cut)

    PairGraph.clusters(spark, old, sf, 0.6, Some(path))
    PairGraph.extend(spark, delta, sf, 0.6, Some(path))
    PairGraph.updateClusters(spark, delta, sf, 0.6, Some(path))

    val cPath = s"${path}__clusters"
    val v1 = UpsertStore.latestVersion(spark, cPath)
    val served = PairGraph.clusters(spark, docs, sf, 0.6, Some(path))
      .as[(Long, Long)].collect().toSet
    assert(UpsertStore.latestVersion(spark, cPath) == v1,
      "updateClusters must leave the cluster table fingerprint-current " +
        "for the grown corpus — serving must NOT re-propagate")
    val scratch = Dedup.clusterAssignments(
      Dedup.exactNearDupPairs(docs, 0.6).select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(served == scratch,
      s"incremental clusters diverged: missing=${(scratch -- served).take(5)} " +
        s"extra=${(served -- scratch).take(5)}")
  }

  test("a delta doc can merge two old components and become the new min label") {
    // three texts engineered so M ~ A (J≈0.65) and M ~ B (J≈0.56) but
    // A !~ B (J=0.4) at tau=0.5 — the delta doc BRIDGES two existing
    // clusters, and its id (5) undercuts both old min labels, so every
    // member of both components must relabel
    val t = (1 to 30).map(i => s"t$i")
    val u = (19 to 30).map(i => s"u$i")
    val textA = t.mkString(" ")
    val textB = (t.take(18) ++ u).mkString(" ")
    val textM = (t.take(24) ++ u.drop(6)).mkString(" ")
    val textC = (1 to 30).map(i => s"v$i").mkString(" ")
    val old = Seq(10L -> textA, 11L -> textA, 20L -> textB, 21L -> textB,
      30L -> textC).toDF("doc_id", "text")
    val delta = Seq(5L -> textM).toDF("doc_id", "text")
    val full = old.unionByName(delta)
    val path = freshDir()

    val before = PairGraph.clusters(spark, old, sf, 0.5, Some(path))
      .as[(Long, Long)].collect().toSet
    assert(before == Set((10L, 10L), (11L, 10L), (20L, 20L), (21L, 20L)),
      s"expected two 2-doc components, got $before")

    PairGraph.extend(spark, delta, sf, 0.5, Some(path))
    PairGraph.updateClusters(spark, delta, sf, 0.5, Some(path))
    val after = PairGraph.clusters(spark, full, sf, 0.5, Some(path))
      .as[(Long, Long)].collect().toSet
    val scratch = Dedup.clusterAssignments(
      Dedup.exactNearDupPairs(full, 0.5).select("doc_a", "doc_b"))
      .as[(Long, Long)].collect().toSet
    assert(after == scratch, s"incremental merge diverged: $after vs $scratch")
    assert(after == Set((5L, 5L), (10L, 5L), (11L, 5L), (20L, 5L), (21L, 5L)),
      s"bridge doc must merge both components under the new min label: $after")

    // same merge through the DISTRIBUTED fallback (maxDriverEdges = 0
    // forces the star-edge propagation path) must agree exactly
    val path2 = freshDir()
    PairGraph.clusters(spark, old, sf, 0.5, Some(path2))
    PairGraph.extend(spark, delta, sf, 0.5, Some(path2))
    PairGraph.updateClusters(spark, delta, sf, 0.5, Some(path2), maxDriverEdges = 0)
    val viaFallback = PairGraph.clusters(spark, full, sf, 0.5, Some(path2))
      .as[(Long, Long)].collect().toSet
    assert(viaFallback == after,
      s"union-find and propagation paths diverged: $viaFallback vs $after")
  }

  test("a delta with no near-dup pairs leaves clusters untouched but advances the gate") {
    val t = (1 to 30).map(i => s"t$i")
    val old = Seq(10L -> t.mkString(" "), 11L -> t.mkString(" ")).toDF("doc_id", "text")
    val delta = Seq(40L -> (1 to 30).map(i => s"w$i").mkString(" ")).toDF("doc_id", "text")
    val path = freshDir()
    val before = PairGraph.clusters(spark, old, sf, 0.6, Some(path))
      .as[(Long, Long)].collect().toSet
    PairGraph.extend(spark, delta, sf, 0.6, Some(path))
    PairGraph.updateClusters(spark, delta, sf, 0.6, Some(path))
    val after = PairGraph.clusters(spark, old.unionByName(delta), sf, 0.6, Some(path))
      .as[(Long, Long)].collect().toSet
    assert(after == before, "pairless delta must not change any label")
  }

  test("updateClusters refuses to run out of step with extend") {
    val docs = Tables.documents(spark, sf)
    val path = freshDir()
    val cut = docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong
    PairGraph.clusters(spark, docs.filter($"doc_id" <= cut), sf, 0.6, Some(path))
    // no extend ran — cluster meta is NOT one delta behind the pair meta
    intercept[IllegalArgumentException] {
      PairGraph.updateClusters(spark, docs.filter($"doc_id" > cut), sf, 0.6, Some(path))
    }
  }

  test("store-resident corpus: manifest-version gate serves without rescan, rebuilds on corpus commit") {
    val docs = Tables.documents(spark, sf)
    val corpusPath = freshDir()
    val path = freshDir()
    UpsertStore.replace(spark, corpusPath, docs, Seq("doc_id"))

    val direct = Dedup.exactNearDupPairs(docs, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val first = PairGraph.pairGraphFromStore(spark, corpusPath, 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(first == direct)
    val v1 = UpsertStore.latestVersion(spark, path)
    PairGraph.pairGraphFromStore(spark, corpusPath, 0.6, Some(path)).count()
    assert(UpsertStore.latestVersion(spark, path) == v1,
      "unchanged corpus version must serve the stored graph, not rebuild")

    // any corpus commit bumps the manifest seq → gate miss → rebuild
    val minId = docs.agg(min("doc_id")).head().getLong(0)
    val mutated = docs.filter($"doc_id" === minId)
      .withColumn("text", concat($"text", lit(" MUTATED VIA STORE COMMIT")))
    UpsertStore.upsert(spark, corpusPath, mutated, Seq("doc_id"))
    val grown = UpsertStore.read(spark, corpusPath).get
    val expected = Dedup.exactNearDupPairs(grown, 0.6)
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    val served = PairGraph.pairGraphFromStore(spark, corpusPath, 0.6, Some(path))
      .select($"doc_a", $"doc_b", round($"jaccard", 4).as("j"))
      .as[(Long, Long, Double)].collect().toSet
    assert(UpsertStore.latestVersion(spark, path).get > v1.get,
      "corpus version bump must force a rebuild")
    assert(served == expected)
  }

  test("clusterAssignments: driver union-find and distributed propagation agree") {
    val pairs = Dedup.exactNearDupPairs(Tables.documents(spark, sf), 0.6)
      .select("doc_a", "doc_b")
    val viaDriver = Dedup.clusterAssignments(pairs)
      .as[(Long, Long)].collect().toSet
    val viaPropagation = Dedup.clusterAssignments(pairs, maxDriverEdges = 0)
      .as[(Long, Long)].collect().toSet
    assert(viaDriver == viaPropagation,
      s"paths diverged: onlyDriver=${(viaDriver -- viaPropagation).take(5)} " +
        s"onlyProp=${(viaPropagation -- viaDriver).take(5)}")
    assert(viaDriver.nonEmpty)
  }

  test("fingerprint is order- and partitioning-independent") {
    val docs = Tables.documents(spark, sf)
    val a = PairGraph.corpusFingerprint(docs)
    val b = PairGraph.corpusFingerprint(docs.repartition(7).sortWithinPartitions(desc("doc_id")))
    assert(a == b)
  }
}
