package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Semantics the oracle can't see for the retrieval layer: BM25's
  * ordering properties on a hand-built corpus, RRF's fusion preference,
  * and the plan shape (broadcast query/vocab sides — the posting join
  * must never shuffle the corpus on the tiny side's account). */
class RetrievalSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bm25: rare-term doc outranks common-term doc; tf raises the score; dl damps it") {
    // "zebra" appears in exactly one doc; "data" in all. A query for
    // both must rank the zebra doc first regardless of the common term.
    val docs = docsDf(
      1L -> "data data data data",
      2L -> "data zebra",
      3L -> "data table row",
      4L -> "data data table")
    val q = Seq((10L, "zebra"), (10L, "data")).toDF("query_id", "term")
    val scores = Retrieval.bm25Scores(docs, q)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(scores(2L) > scores(1L) && scores(2L) > scores(3L) && scores(2L) > scores(4L),
      s"zebra doc must win: $scores")

    // tf monotonicity at fixed dl: doc with 2x "data" beats doc with 1x
    val tfDocs = docsDf(1L -> "data data x y", 2L -> "data x y z")
    val tfQ = Seq((1L, "data")).toDF("query_id", "term")
    val tf = Retrieval.bm25Scores(tfDocs, tfQ)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(tf(1L) > tf(2L), s"higher tf must score higher: $tf")

    // length normalization: same tf, longer doc scores lower
    val dlDocs = docsDf(1L -> "data x", 2L -> "data x y z w v u t")
    val dl = Retrieval.bm25Scores(dlDocs, tfQ)
      .collect().map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(dl(1L) > dl(2L), s"longer doc must be damped: $dl")
  }

  test("bm25: idf is non-negative (Lucene variant) even for a term in every doc") {
    val docs = docsDf(1L -> "data", 2L -> "data", 3L -> "data")
    val q = Seq((1L, "data")).toDF("query_id", "term")
    val scores = Retrieval.bm25Scores(docs, q).collect()
    assert(scores.nonEmpty && scores.forall(_.getDouble(2) > 0),
      s"everywhere-term must still score positive: ${scores.toSeq}")
  }

  test("q101 on sf0.001: ranks are 1..k dense per query, self excluded, deterministic") {
    val sf = SharedSpark.sf0001
    val out = Retrieval.q101Bm25TopK.fn(spark, sf).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L), s"probe queries: ${byQ.keySet}")
    byQ.foreach { case (qid, rows) =>
      assert(rows.map(_.getLong(1)).toSeq == (1L to rows.length),
        s"ranks must be dense from 1 for $qid")
      assert(!rows.map(_.getLong(2)).contains(qid), s"self-match leaked for $qid")
    }
    val again = Retrieval.q101Bm25TopK.fn(spark, sf).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "must be deterministic")
  }

  test("q102 RRF: a doc on both lists outranks docs on one list at comparable ranks") {
    val sf = SharedSpark.sf0001
    val docs = graft.Tables.documents(spark, sf)
    val probeQ = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(split(lower(col("text")), "\\s+")).as("term"))
      .distinct()
    val sparse = Retrieval.bm25Scores(docs, probeQ)
      .filter(col("query_id") =!= col("doc_id"))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("score").desc, col("doc_id"))))
      .filter(col("rk") <= 20)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3).toLong).toMap
    val fused = Retrieval.q102HybridRrf.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // recompute the expected RRF ordering from the two declared sides
    // at full precision and check the emitted ranking agrees on top-3
    val emb = graft.Tables.embeddings(spark, sf)
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val dense = emb.select(col("vec_id").as("doc_id"), col("embedding").as("ce"))
      .crossJoin(broadcast(queries))
      .filter(col("query_id") =!= col("doc_id"))
      .withColumn("sim", graft.functions.VectorFunctions
        .cosine_similarity(col("qe"), col("ce")))
      .withColumn("rk", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("query_id").orderBy(col("sim").desc, col("doc_id"))))
      .filter(col("rk") <= 20)
      .select("query_id", "doc_id", "rk")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val expected = (0L to 2L).flatMap { qid =>
      val cand = (sparse.keySet ++ dense.keySet).filter(_._1 == qid).map(_._2)
      cand.map { d =>
        val s = sparse.get((qid, d)).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        val de = dense.get((qid, d)).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (qid, d, s + de)
      }.toSeq.sortBy { case (_, d, sc) => (-sc, d) }.take(3)
        .zipWithIndex.map { case ((q, d, _), i) => (q, i + 1L, d) }
    }.toSet
    val gotTop3 = fused.filter(_._2 <= 3).toSet
    assert(gotTop3 == expected, s"got $gotTop3\nwant $expected")
  }

  test("q103 semantic dedup: kept set is within-cell pairwise <= tau; every drop has a valid witness") {
    val sf = SharedSpark.sf0001
    val out = Similarity.q103SemanticDedup.fn(spark, sf).collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]), r.getBoolean(2)))
    val emb = graft.Tables.embeddings(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i); i += 1 }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    // recompute the cell assignment independently (same seed rule)
    val centIds = emb.keys.toSeq.sorted.take(16)
    val cell = emb.map { case (id, v) =>
      id -> centIds.map(c => (cos(v, emb(c)), c)).max._2
    }
    val kept = out.filter(_._3).map(_._1).toSet
    val keptPairs = for {
      a <- kept.toSeq; b <- kept.toSeq
      if a < b && cell(a) == cell(b) && cos(emb(a), emb(b)) > 0.4
    } yield (a, b)
    assert(keptPairs.isEmpty, s"kept near-dup pairs survived: ${keptPairs.take(3)}")
    out.filter(!_._3).foreach { case (id, wit, _) =>
      assert(wit.isDefined && wit.get < id, s"drop $id lacks a lower-id witness")
      assert(cell(wit.get) == cell(id), s"witness for $id is in another cell")
      assert(cos(emb(wit.get), emb(id)) > 0.4, s"witness for $id is below tau")
    }
    assert(out.exists(!_._3), "corpus has near-dups; the plan must drop some")
  }

  test("q103 zero-magnitude embedding: cosine pinned to -1.0 (oracle convention), never a dup witness") {
    // ADVICE r8/r9: unpinned, cosine(zero, x) is NaN, which Spark sorts
    // ABOVE every real value — the cell argmax and the dup filter would
    // both diverge from DuckDB. Pin the q103 expression sites to -1.0.
    import graft.functions.VectorFunctions
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val cents = emb.orderBy("vec_id").limit(2)
      .select(col("vec_id").as("centroid_id"), col("embedding").as("cemb"))
    // site 1: cell assignment — the zero vector's cs is exactly -1.0
    // against EVERY centroid (not NaN), so max_by ties break on
    // centroid_id deterministically, same as the oracle's MAX(cid) rule
    val asg = emb.crossJoin(broadcast(cents))
      .withColumn("cs",
        nanvl(VectorFunctions.cosine_similarity(col("embedding"), col("cemb")),
          lit(-1.0)))
    val zeroCs = asg.filter(col("vec_id") === 2L)
      .select("cs").collect().map(_.getDouble(0)).toSeq
    assert(zeroCs.nonEmpty && zeroCs.forall(_ == -1.0), s"zero-vec cs: $zeroCs")
    val zeroCell = asg.groupBy("vec_id")
      .agg(max_by(col("centroid_id"), struct(col("cs"), col("centroid_id"))).as("cell"))
      .filter(col("vec_id") === 2L).collect().head.getLong(1)
    assert(zeroCell == 1L, s"tie must break to max centroid id, got $zeroCell")
    // site 2: dup filter — a zero vector can never pass `> tau`
    val pairs = emb.select(col("vec_id").as("va"), col("embedding").as("ea"))
      .crossJoin(emb.select(col("vec_id").as("vb"), col("embedding").as("eb")))
      .filter(col("va") < col("vb"))
      .filter(nanvl(VectorFunctions.cosine_similarity(col("ea"), col("eb")),
        lit(-1.0)) > lit(0.4))
      .select("va", "vb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)), s"only the real near-dup pair may fire: $pairs")
  }

  test("plan shape: query and vocabulary sides broadcast; corpus side never does") {
    val sf = SharedSpark.sf0001
    val plan = Retrieval.q101Bm25TopK.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "postings join must broadcast the tiny sides")
    assert(!plan.contains("CartesianProduct"), "no cartesian anywhere")
    // VERDICT r10 #2: dl rides the tf aggregation, so scoring has NO
    // corpus-sized shuffle join left — every join must be broadcast
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"scoring must not shuffle-join the corpus side:\n$plan")
    // VERDICT r11 #1: the broadcast df relation must be bounded by the
    // query term set, not the vocabulary — the semi-join prune below
    // the df aggregate is the plan's witness (vocab grows with the
    // corpus; |query terms| doesn't)
    assert(plan.contains("LeftSemi"),
      s"df must be semi-join-pruned to the query terms before broadcast:\n$plan")
  }

  test("plan shape: stored-index serve prunes the df broadcast to the query terms") {
    val sf = SharedSpark.sf0001
    val docs = graft.Tables.documents(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("postings_plan").toString
    graft.operators.PostingsIndex.ensure(spark, docs, s"$dir/idx")
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
    val served = graft.operators.PostingsIndex.search(spark, s"$dir/idx", q)
    val plan = served.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"stored df must be semi-join-pruned to the query terms before broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"))
    // and the prune must not change a single score: serve ≡ recompute
    val scratch = Retrieval.bm25Scores(docs, q)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val idx = served.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(idx == scratch, "query-term-pruned df must leave every score unchanged")

    // q149's serve promise: tf/df/N all come off the store — the serve
    // plan must contain NO tokenization (no split/lower over text) and
    // no scan of the documents table, only store parquet reads
    val tfidfPlan = graft.operators.PostingsIndex
      .tfidfTopK(spark, s"$dir/idx", 3).queryExecution.executedPlan.toString
    assert(!tfidfPlan.contains("split(") && !tfidfPlan.contains("lower("),
      s"index-served TF-IDF must not re-tokenize:\n$tfidfPlan")
    assert(!tfidfPlan.contains("documents"),
      s"index-served TF-IDF must read only the store:\n$tfidfPlan")
  }

  test("postings extend ≡ rebuild; committed-txn replay skips; crash-retry converges") {
    val sf = SharedSpark.sf0001
    val docs = graft.Tables.documents(spark, sf)
    val base = java.nio.file.Files.createTempDirectory("postings_ext").toString
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
    val cut = docs.selectExpr("percentile(doc_id, 0.8)").head().getDouble(0).toLong
    val old = docs.filter(col("doc_id") <= cut)
    val delta = docs.filter(col("doc_id") > cut)
    def scores(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val scratch = scores(Retrieval.bm25Scores(docs, q))

    // extend ≡ rebuild, bit-for-bit (df counts, stats, scores)
    val p1 = s"$base/idx1"
    PostingsIndex.ensure(spark, old, p1)
    PostingsIndex.extend(spark, delta, p1)
    assert(scores(PostingsIndex.search(spark, p1, q)) == scratch,
      "extended index must score identically to a from-scratch build")

    // a replay of an already-committed txn must not double-apply
    val p2 = s"$base/idx2"
    PostingsIndex.ensure(spark, old, p2)
    PostingsIndex.extend(spark, delta, p2, txnId = Some(7L))
    PostingsIndex.extend(spark, delta, p2, txnId = Some(7L)) // replay
    assert(scores(PostingsIndex.search(spark, p2, q)) == scratch,
      "replayed extend must self-skip, not double-count df/stats")

    // crash mid-extend: dirty stats (pre-extend state preserved) + only
    // HALF the delta postings applied; the retry must converge exactly
    val p3 = s"$base/idx3"
    PostingsIndex.ensure(spark, old, p3)
    val halfTf = Retrieval.postings(delta.limit((delta.count() / 2).toInt))
    val preStats = graft.streaming.UpsertStore.read(spark, s"${p3}__stats").get.head()
    graft.streaming.UpsertStore.replace(spark, s"${p3}__stats",
      spark.range(1).select(lit(1L).as("meta_id"),
        lit(preStats.getAs[Long]("n")).as("n"),
        lit(preStats.getAs[Long]("total_dl")).as("total_dl"),
        lit(preStats.getAs[Double]("avgdl")).as("avgdl"),
        lit(preStats.getAs[Long]("corpus_n")).as("corpus_n"),
        lit(preStats.getAs[Long]("corpus_h")).as("corpus_h"),
        lit(true).as("dirty"), lit(-1L).as("txn")), Seq("meta_id"))
    graft.streaming.UpsertStore.upsert(spark, p3, halfTf, Seq("term", "doc_id"))
    intercept[IllegalArgumentException] { // partial state must refuse to serve
      PostingsIndex.search(spark, p3, q).count()
    }
    PostingsIndex.extend(spark, delta, p3) // the retry
    assert(scores(PostingsIndex.search(spark, p3, q)) == scratch,
      "crash-retry must converge to the from-scratch scores")
  }

  test("postings index: serve ≡ recompute; gate skips rebuild; corpus change rebuilds; dirty refuses") {
    val sf = SharedSpark.sf0001
    val docs = graft.Tables.documents(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("postings_spec").toString + "/idx"
    val q = docs.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(graft.operators.TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()

    PostingsIndex.ensure(spark, docs, path)
    val v1 = graft.streaming.UpsertStore.latestVersion(spark, path)
    val served = PostingsIndex.search(spark, path, q)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val scratch = Retrieval.bm25Scores(docs, q)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(served == scratch, "stored-index serve must equal from-scratch scores exactly")

    PostingsIndex.ensure(spark, docs, path)
    assert(graft.streaming.UpsertStore.latestVersion(spark, path) == v1,
      "matching fingerprint must not rebuild the index")

    // corpus mutation → fingerprint miss → rebuild
    val minId = docs.agg(min("doc_id")).head().getLong(0)
    val mutated = docs.withColumn("text",
      when(col("doc_id") === minId, concat(col("text"), lit(" xqzzy"))).otherwise(col("text")))
    PostingsIndex.ensure(spark, mutated, path)
    assert(graft.streaming.UpsertStore.latestVersion(spark, path).get > v1.get,
      "corpus change must rebuild")
    val df2 = PostingsIndex.search(spark, path,
      Seq((99L, "xqzzy")).toDF("query_id", "term")).collect()
    assert(df2.length == 1 && df2.head.getLong(1) == minId,
      "rebuilt index must see the new token")

    // a dirty stats row (simulated crash) must refuse to serve
    graft.streaming.UpsertStore.replace(spark, s"${path}__stats",
      spark.range(1).select(lit(1L).as("meta_id"), lit(-1L).as("n"),
        lit(-1.0).as("avgdl"), lit(-1L).as("corpus_n"), lit(0L).as("corpus_h"),
        lit(true).as("dirty")), Seq("meta_id"))
    intercept[IllegalArgumentException] {
      PostingsIndex.search(spark, path, q).count()
    }
    // and the next ensure recovers it
    PostingsIndex.ensure(spark, mutated, path)
    assert(PostingsIndex.search(spark, path, q).count() > 0)
  }

  test("q107 hybrid-from-stores ≡ q102 from-scratch, row for row") {
    val sf = SharedSpark.sf0001
    val stored = Retrieval.q107HybridStored.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val scratch = Retrieval.q102HybridRrf.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(stored == scratch,
      s"stored-serve hybrid must match the from-scratch fusion; " +
        s"stored=${stored.take(5)} scratch=${scratch.take(5)}")
  }

  test("q106 catalog SQL BM25 ≡ q101 from-scratch, row for row") {
    val sf = SharedSpark.sf0001
    val viaSql = Retrieval.q106CatalogBm25.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val scratch = Retrieval.q101Bm25TopK.fn(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viaSql == scratch,
      s"catalog SQL serve must match the from-scratch ranking; " +
        s"sql=${viaSql.take(5)} scratch=${scratch.take(5)}")
  }

  test("trigram index: serve == LIKE scan for any rareK; replayed extend is a no-op; absent pattern empty") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "quick brown foxes are rare"),
      (3L, "a slow red panda sleeps"),
      (4L, "the quick red panda jumps"),
      (5L, "brown bread and red wine")).toDF("doc_id", "text")
    val pats = Seq("quick brown", "red panda", "ck b", "purple cow")
    val dir = java.nio.file.Files.createTempDirectory("graft-tri").toString + "/idx"
    TrigramIndex.build(spark, docs.filter($"doc_id" <= 3), dir)
    TrigramIndex.extend(spark, docs.filter($"doc_id" > 3), dir, Some(0L))
    // replay with the same txn id: neither store may advance
    val vP = graft.streaming.UpsertStore.latestVersion(spark, dir)
    val vD = graft.streaming.UpsertStore.latestVersion(spark, s"${dir}__df")
    assert(vP.isDefined && vD.isDefined, "stores must exist at the suffix layout")
    TrigramIndex.extend(spark, docs.filter($"doc_id" > 3), dir, Some(0L))
    assert(graft.streaming.UpsertStore.latestVersion(spark, dir) == vP &&
      graft.streaming.UpsertStore.latestVersion(spark, s"${dir}__df") == vD,
      "replayed extend advanced a trigram store")
    val truth = pats.flatMap(p => docs.filter($"text".contains(p))
      .select($"doc_id").as[Long].collect().map(p -> _)).toSet
    // the candidate-superset property: ANY rarest-K subset + verify is exact
    for (k <- Seq(1, 2, 4, 100)) {
      val got = TrigramIndex.search(spark, dir, pats.toDF("query"), docs, rareK = k)
        .as[(String, Long)].collect().toSet
      assert(got == truth, s"rareK=$k diverged: got=$got truth=$truth")
    }
    assert(!truth.exists(_._1 == "purple cow"), "sanity: absent pattern must be empty")
  }

  test("regex→trigram compiler: required literals are sound for every supported construct") {
    def req(p: String) = TrigramIndex.requiredLiterals(p)
    // plain literal: one branch, one fragment
    assert(req("quick brown") == Some(Seq(Seq("quick brown"))))
    // top-level alternation → branch per alternative
    assert(req("abc|defg") == Some(Seq(Seq("abc"), Seq("defg"))))
    // embedded group splices into the run on both sides
    assert(req("key (agg|value) row") ==
      Some(Seq(Seq("key agg row"), Seq("key value row"))))
    assert(req("scan s(low|ort)") == Some(Seq(Seq("scan slow"), Seq("scan sort"))))
    // .* breaks the run into two AND-ed fragments
    assert(req("merge batch.*window") == Some(Seq(Seq("merge batch", "window"))))
    // X? / X* drop the optional atom and break around it
    assert(req("colou?r box") == Some(Seq(Seq("colo", "r box"))))
    // X+ keeps one occurrence but breaks contiguity after it
    assert(req("ab+cde") == Some(Seq(Seq("cde"))))
    // (..)+ requires some alt standalone, never spliced (x(ab|cd)+y
    // can match xabcdy — splicing would demand xaby/xcdy and LOSE it)
    assert(req("xxx(abc|def)+yyy") ==
      Some(Seq(Seq("xxx", "abc", "yyy"), Seq("xxx", "def", "yyy"))))
    // class / class-escape breaks; anchors don't
    assert(req("ta[bc]le grande") == Some(Seq(Seq("le grande"))))
    assert(req("^abc def$") == Some(Seq(Seq("abc def"))))
    assert(req("abc\\d+def") == Some(Seq(Seq("abc", "def"))))
    // escaped metachar is a literal char
    assert(req("a\\.b\\.cdef") == Some(Seq(Seq("a.b.cdef"))))
    // unprunable: every fragment under 3 chars
    assert(req("ta[bc]le").isEmpty)
    assert(req("(a|b)c").isEmpty)
    // one unprunable branch poisons the pattern (matches may hide there)
    assert(req("abcdef|xy").isEmpty)
  }

  test("regex serve == rlike scan (index path + declared fallback); empty through the index") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the table"),
      (2L, "quick red foxes are rare at this tacle"),   // tacle: [bc] class hit
      (3L, "a slow red panda sleeps on a bench"),
      (4L, "the quick red panda jumps the queue"),
      (5L, "brown bread and red wine on the table")).toDF("doc_id", "text")
    val pats = Seq(
      "quick (brown|red) fox",  // group splice, multi-branch
      "quick.*panda",           // fragment break
      "ta[bc]le",               // unprunable → declared full-scan fallback
      "(purple|green) cow")     // absent → empty through the index
    val dir = java.nio.file.Files.createTempDirectory("graft-trirx").toString + "/idx"
    TrigramIndex.build(spark, docs, dir)
    val got = TrigramIndex.regexSearch(spark, dir, pats, docs)
      .as[(String, Long)].collect().toSet
    val truth = pats.flatMap(p => docs.filter($"text".rlike(p))
      .select($"doc_id").as[Long].collect().map(p -> _)).toSet
    assert(got == truth, s"regex serve diverged: got=$got truth=$truth")
    assert(truth.exists(_._1 == "ta[bc]le"), "sanity: fallback pattern has matches")
    assert(!truth.exists(_._1 == "(purple|green) cow"), "sanity: absent pattern empty")
  }
}
