package graft.javaapi

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.TrafficPipeline

/** Multi-language parity (the reference's core teaching point — one
  * pipeline, three APIs): the Java entry point must produce the SAME
  * results and schemas as the Scala declarations, because both declare
  * the same Catalyst plan. */
class JavaApiParitySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def raw = Seq(
    "1000,3", "2000,5", "3000,2", "61000,7 \n", "62000, 4", "garbage", "99,"
  ).toDF("value")

  test("Java parse == Scala parse (incl. trailing-whitespace and malformed rows)") {
    val s = TrafficPipeline.parse(raw).collect().map(_.toSeq).toSeq
    val j = GraftJava.parse(raw).collect().map(_.toSeq).toSeq
    assert(j == s)
    assert(j.size == 5) // two malformed rows dropped
  }

  test("Java explicit StructType == Scala parse output schema (SURVEY §1.3 duality)") {
    val scalaSchema = TrafficPipeline.parse(raw).schema
    val javaSchema = GraftJava.parsedSchema()
    assert(javaSchema.fieldNames.toSeq == scalaSchema.fieldNames.toSeq)
    assert(javaSchema.fields.map(_.dataType).toSeq ==
      scalaSchema.fields.map(_.dataType).toSeq)
  }

  test("Java aggregate and SQL aggregate == Scala aggregate (batch)") {
    val parsed = TrafficPipeline.parse(raw)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("as_of_time").collect().map(_.toSeq).toSeq
    val s = rows(TrafficPipeline.aggregate(parsed))
    assert(rows(GraftJava.aggregate(parsed, "60 seconds", "5 seconds")) == s)
    assert(rows(GraftJava.aggregateSql(spark, parsed)) == s)
  }

  test("Java streaming wiring runs the Scala engine end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-javaapi").toString
    val sink = GraftJava.parquetSink(spark, s"$dir/sink",
      java.util.List.of("as_of_time"))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("1000,3", "2000,5", "61000,7")
    val q = GraftJava.run(mem.toDF(), sink, s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination(60000)
    val out = sink.read(spark)
    assert(out.count() > 0)
    // window rows aggregate the parsed records (sanity: totals visible)
    val maxVeh = out.agg(org.apache.spark.sql.functions.max("max_num_veh"))
      .head().getInt(0)
    assert(maxVeh == 7)
  }

  test("Java catalog registration serves the derived stores via SQL (q99/q100 path)") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-jcat").toString)
    }
    val tA = (1 to 30).map(i => s"a$i")
    val docs = Seq(
      1L -> tA.mkString(" "),
      2L -> (1 to 30).map(i => s"c$i").mkString(" "),
      10L -> (tA.take(26) ++ (27 to 30).map(i => s"x$i")).mkString(" ")
    ).toDF("doc_id", "text")
    GraftJava.registerPairGraph(spark, "j_pg", docs, "java-parity", 0.6)
    val pairs = spark.sql("SELECT doc_a, doc_b FROM graft.j_pg")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L)), s"Java-registered pair table via SQL: $pairs")

    val e = (i: Int) => Array.tabulate(4)(j => if (j == i % 4) 1f else 0f)
    val emb = (0 until 12).map(i => (i.toLong, e(i))).toDF("vec_id", "embedding")
    GraftJava.registerVectorIndex(spark, "j_vx", emb, "java-parity", 4)
    assert(spark.sql("SELECT count(*) FROM graft.j_vx").head().getLong(0) == 12L)
    assert(spark.sql("SELECT count(*) FROM graft.j_vx__centroids")
      .head().getLong(0) == 4L)

    // the sparse-retrieval twin (round 11: the q106 serve path)
    GraftJava.registerPostingsIndex(spark, "j_bm", docs)
    val alphaTf = spark.sql(
      "SELECT doc_id, tf FROM graft.j_bm WHERE term = 'a1'")
      .as[(Long, Long)].collect().toSet
    assert(alphaTf == Set((1L, 1L), (10L, 1L)),
      s"Java-registered postings table via SQL: $alphaTf")
    val stats = spark.sql("SELECT n, avgdl FROM graft.j_bm__stats").head()
    assert(stats.getLong(0) == 3L && stats.getDouble(1) == 30.0,
      s"stats row: $stats")

    // the compressed-ANN twin (round 11: the q127 serve path) — 64-dim
    // vectors so the 8×8 subspace split applies
    val pq = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 64 + j) % 7).toDouble)))
      .toDF("vec_id", "emb")
    GraftJava.registerPqIndex(spark, "j_pq", pq)
    assert(spark.sql("SELECT count(*) FROM graft.j_pq").head().getLong(0) == 40L)
    val codeLen = spark.sql("SELECT size(codes) FROM graft.j_pq LIMIT 1")
      .head().getInt(0)
    assert(codeLen == 8, s"packed code width: $codeLen")
    assert(spark.sql("SELECT count(DISTINCT m) FROM graft.j_pq__codebooks")
      .head().getLong(0) == 8L)

    // the contamination twin (round 13: the q160 serve path) — eval
    // doc 100 shares exactly one 8-gram (w1..w8) with train doc 1
    val train = Seq(
      1L -> (1 to 10).map(i => s"w$i").mkString(" "),
      2L -> (1 to 10).map(i => s"z$i").mkString(" ")).toDF("doc_id", "text")
    GraftJava.registerShingleIndex(spark, "j_grams", train)
    Seq(100L -> ((1 to 8).map(i => s"w$i") ++ Seq("q9", "q10")).mkString(" "))
      .toDF("doc_id", "text").createOrReplaceTempView("j_eval")
    val hits = spark.sql(
      """WITH ev0 AS (SELECT doc_id, split(lower(text), '\\s+') AS toks FROM j_eval),
        |ev AS (SELECT doc_id AS test_doc,
        |              explode(array_distinct(transform(sequence(1, size(toks) - 7),
        |                i -> xxhash64(concat_ws(' ', slice(toks, i, 8)))))) AS g
        |       FROM ev0 WHERE size(toks) >= 8),
        |stop AS (SELECT g FROM graft.j_grams__df WHERE dfreq > 50),
        |pruned AS (SELECT p.g, p.doc_id AS train_doc
        |           FROM graft.j_grams p LEFT ANTI JOIN stop ON p.g = stop.g)
        |SELECT test_doc, train_doc, COUNT(*) AS shared
        |FROM ev JOIN pruned ON ev.g = pruned.g
        |GROUP BY 1, 2""".stripMargin)
      .as[(Long, Long, Long)].collect().toSet
    assert(hits == Set((100L, 1L, 1L)),
      s"Java-registered gram index adjudicated via SQL: $hits")

    // the distinct-set twin (round 14: the q175 serve path) — exact-
    // mode data (30/30 users < k=64): day-1 users 1..30, day-2 users
    // 21..50 ⇒ intersect exactly 10, a-not-b 20, union 50
    def tsv(x: String) = java.sql.Timestamp.valueOf(x)
    val evs = ((1 to 30).map(u => (tsv("2026-03-01 10:00:00"), u.toLong)) ++
      (21 to 50).map(u => (tsv("2026-03-02 10:00:00"), u.toLong)))
      .toDF("ts", "user_id")
    GraftJava.registerThetaStore(spark, "j_theta", evs, 64)
    val ops = spark.sql(
      """SELECT theta_intersect_estimate(a.sk, b.sk),
        |       theta_anotb_estimate(b.sk, a.sk),
        |       theta_union_estimate(a.sk, b.sk)
        |FROM graft.j_theta a JOIN graft.j_theta b
        |  ON b.day_ms = a.day_ms + 86400000""".stripMargin)
      .as[(Double, Double, Double)].collect().toSeq
    assert(ops == Seq((10.0, 20.0, 50.0)),
      s"Java-registered theta store set ops via SQL: $ops")

    // the composed-ANN twin (round 15: the q186 serve path) — reuses
    // the PQ corpus; 8 coarse cells over 40 vectors
    GraftJava.registerIvfPqIndex(spark, "j_ivfpq", pq, 8)
    assert(spark.sql("SELECT count(*) FROM graft.j_ivfpq").head().getLong(0) == 40L)
    assert(spark.sql("SELECT size(codes) FROM graft.j_ivfpq LIMIT 1")
      .head().getInt(0) == 8)
    assert(spark.sql("SELECT count(*) FROM graft.j_ivfpq__centroids")
      .head().getLong(0) == 8L)
    assert(spark.sql("SELECT count(DISTINCT m) FROM graft.j_ivfpq__codebooks")
      .head().getLong(0) == 8L)

    // the substring-index twin (round 15: the q179 serve path) —
    // 'alpha' (grams alp/lph/pha) is contained in docs 1 and 2 only
    val tri = Seq(1L -> "alpha beta gamma", 2L -> "the alphabet soup",
      3L -> "zzz qqq").toDF("doc_id", "text")
    GraftJava.registerTrigramIndex(spark, "j_tri", tri)
    val triHits = spark.sql(
      """WITH pg AS (SELECT DISTINCT explode(transform(
        |              sequence(1, length('alpha') - 2),
        |              i -> substring('alpha', i, 3))) AS gram),
        |cand AS (SELECT doc_id FROM pg JOIN graft.j_tri p USING (gram)
        |         GROUP BY doc_id
        |         HAVING COUNT(*) = (SELECT COUNT(*) FROM pg))
        |SELECT doc_id FROM cand ORDER BY doc_id""".stripMargin)
      .as[Long].collect().toSeq
    assert(triHits == Seq(1L, 2L),
      s"Java-registered trigram index served via SQL: $triHits")
    val dfAlp = spark.sql("SELECT df FROM graft.j_tri__df WHERE gram = 'alp'")
      .as[Long].collect().toSeq
    assert(dfAlp == Seq(2L), s"trigram df store via SQL: $dfAlp")

    // the exact-phrase twin (round 16: the q193 serve path) — 'quick
    // brown' occurs once in doc 1, twice in doc 2; doc 3's reversed
    // 'brown quick' must not match
    val phr = Seq(1L -> "the quick brown fox", 2L -> "quick brown quick brown",
      3L -> "brown quick zzz").toDF("doc_id", "text")
    GraftJava.registerPhraseIndex(spark, "j_phr", phr)
    val phrHits = spark.sql(
      """WITH qt AS (
        |  SELECT t.qi, t.term
        |  FROM (SELECT 1) LATERAL VIEW posexplode(split('quick brown', '\\s+')) t AS qi, term),
        |votes AS (
        |  SELECT p.doc_id, e.pos - qt.qi AS start
        |  FROM qt JOIN graft.j_phr p ON qt.term = p.term
        |  LATERAL VIEW explode(p.positions) e AS pos),
        |starts AS (
        |  SELECT doc_id, start FROM votes
        |  GROUP BY doc_id, start
        |  HAVING COUNT(*) = (SELECT COUNT(*) FROM qt))
        |SELECT doc_id, COUNT(*) AS n_hits FROM starts
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
      .as[(Long, Long)].collect().toSeq
    assert(phrHits == Seq(1L -> 1L, 2L -> 2L),
      s"Java-registered phrase index served via SQL: $phrHits")

    // the materialized-join-view twin (round 16: the q196 serve path) —
    // order 11 waits on customer 2, who arrives through the returned
    // maintainer's ingestRight; the SQL read sees the maintained join
    val jvOrders = Seq((10L, 1L, 5.0), (11L, 2L, 6.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val jvCust = Seq((1L, "ann", "auto")).toDF("c_custkey", "c_name", "c_mktsegment")
    val jv = GraftJava.registerJoinView(spark, "j_jv", jvOrders, jvCust)
    assert(spark.sql("SELECT o_orderkey FROM graft.j_jv").as[Long].collect().toSeq
      == Seq(10L), "bootstrap view must hold only the matched order")
    jv.ingestRight(Seq((2L, "bob", "bike")).toDF("c_custkey", "c_name", "c_mktsegment"))
    val jvPost = spark.sql(
      "SELECT o_orderkey, c_name FROM graft.j_jv ORDER BY 1")
      .as[(Long, String)].collect().toSeq
    assert(jvPost == Seq(10L -> "ann", 11L -> "bob"),
      s"Java-registered join view after dimension ingest: $jvPost")

    // the near-dup-probe twin (round 15: the q180 serve path) — eval
    // doc 10 near-duplicates train doc 1 (26/30 tokens shared) and
    // shares nothing with train doc 2; simhash64 lands in the session
    // registry as part of registration
    GraftJava.registerSimhashIndex(spark, "j_sh", docs.filter($"doc_id" =!= 10L))
    docs.filter($"doc_id" === 10L).createOrReplaceTempView("j_eval_sh")
    val shPairs = spark.sql(
      """WITH sh AS (
        |  SELECT doc_id, simhash64(sh0) AS fp
        |  FROM (SELECT doc_id,
        |               array_distinct(transform(sequence(1, size(toks) - 2),
        |                 i -> concat_ws(' ', element_at(toks, i),
        |                      element_at(toks, i + 1), element_at(toks, i + 2)))) AS sh0
        |        FROM (SELECT doc_id, split(lower(text), '\\s+') AS toks
        |              FROM j_eval_sh)
        |        WHERE size(toks) >= 3)),
        |ech AS (
        |  SELECT DISTINCT chunk, chunk_val, fp AS fp_e
        |  FROM sh LATERAL VIEW posexplode(transform(sequence(0, 7),
        |    ch -> (fp >> (ch * 8)) & 255)) pe AS chunk, chunk_val),
        |fpp AS (
        |  SELECT DISTINCT ech.fp_e, sc.simhash AS fp_i
        |  FROM ech JOIN graft.j_sh__chunks sc
        |    ON ech.chunk = sc.chunk AND ech.chunk_val = sc.chunk_val
        |  WHERE bit_count(ech.fp_e ^ sc.simhash) <= 16)
        |SELECT e.doc_id AS test_doc, i.doc_id AS train_doc
        |FROM fpp JOIN sh e ON e.fp = fpp.fp_e
        |         JOIN graft.j_sh i ON i.simhash = fpp.fp_i""".stripMargin)
      .as[(Long, Long)].collect().toSet
    assert(shPairs == Set((10L, 1L)),
      s"Java-registered simhash index probed via SQL: $shPairs")
  }

  test("round 18: Java takedown verbs drive the retraction inverses by store path") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-jcat-td").toString)
    }
    // contamination family: the registered train index flags eval 100
    // against train 1; a Java-driven takedown of train 1 must stop the
    // adjudication and self-skip on replay
    val train = Seq(
      1L -> (1 to 10).map(i => s"w$i").mkString(" "),
      2L -> (1 to 10).map(i => s"z$i").mkString(" ")).toDF("doc_id", "text")
    val gp = GraftJava.registerShingleIndex(spark, "j_td_grams", train)
    assert(spark.sql("SELECT count(*) FROM graft.j_td_grams WHERE doc_id = 1")
      .head().getLong(0) > 0)
    GraftJava.retractShingleIndex(spark, train.filter($"doc_id" === 1L), gp, 8, 1L)
    assert(spark.sql("SELECT count(*) FROM graft.j_td_grams WHERE doc_id = 1")
      .head().getLong(0) == 0L,
      "retracted train doc still serves gram postings via SQL")
    val v = graft.streaming.UpsertStore.latestVersion(spark, gp)
    GraftJava.retractShingleIndex(spark, train.filter($"doc_id" === 1L), gp, 8, 1L)
    assert(graft.streaming.UpsertStore.latestVersion(spark, gp) == v,
      "replayed committed takedown advanced the store")

    // sparse-retrieval family: df rows and corpus stats must retreat
    val docs = Seq(
      1L -> "alpha beta gamma",
      2L -> "alpha delta epsilon",
      3L -> "zeta eta theta").toDF("doc_id", "text")
    val pb = GraftJava.registerPostingsIndex(spark, "j_td_bm", docs)
    GraftJava.retractPostings(spark, docs.filter($"doc_id" === 1L), pb, 1L)
    assert(spark.sql("SELECT count(*) FROM graft.j_td_bm WHERE doc_id = 1")
      .head().getLong(0) == 0L)
    assert(spark.sql("SELECT df FROM graft.j_td_bm__df WHERE term = 'alpha'")
      .as[Long].collect().toSeq == Seq(1L),
      "df must recount to the surviving posting")
    assert(spark.sql("SELECT count(*) FROM graft.j_td_bm__df WHERE term = 'beta'")
      .head().getLong(0) == 0L,
      "a vanished term must lose its df row")
    assert(spark.sql("SELECT n FROM graft.j_td_bm__stats").head().getLong(0) == 2L,
      "corpus stats must retreat by exact integers")
  }

  test("round 19: Java curation takedown through the composition; DSIR/rollup twins; external-query ANN serve") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-jcat-man").toString)
    }
    val scratch = java.nio.file.Files.createTempDirectory("graft-jman").toString
    // docs 1 and 4 are exact copies — 1 is canonical, 4 its duplicate
    // (30-token texts: the manifest's quality rule must keep them)
    def toks(p: String) = (1 to 30).map(i => s"$p$i").mkString(" ")
    val corpus = Seq(
      1L -> toks("d"), 2L -> toks("u"), 3L -> toks("v"), 4L -> toks("d"))
      .toDF("doc_id", "text")
    val mm = GraftJava.registerManifest(spark, "j_td_man", scratch, corpus)
    assert(spark.sql(
      "SELECT keep FROM graft.j_td_man__manifest WHERE doc_id = 4")
      .head().getBoolean(0) == false,
      "construction check: the duplicate must start dropped")
    // the compliance verb: retract the CANONICAL through the whole
    // composition by registered path
    GraftJava.retractManifest(spark, corpus.filter($"doc_id" === 1L),
      scratch, mm.storePath, 1L)
    assert(spark.sql(
      "SELECT count(*) FROM graft.j_td_man__manifest WHERE doc_id = 1")
      .head().getLong(0) == 0L, "manifest row of the retracted doc must go")
    assert(spark.sql(
      "SELECT keep FROM graft.j_td_man__manifest WHERE doc_id = 4")
      .head().getBoolean(0),
      "the surviving exact copy must be PROMOTED to kept")
    assert(spark.sql(
      "SELECT first_doc_id FROM graft.j_td_man__gate").as[Long].collect()
      .forall(_ != 1L),
      "the gate's canonical must re-point away from the retracted doc")
    // replayed committed takedown: composition-level no-op
    val vm = graft.streaming.UpsertStore.latestVersion(spark,
      s"${mm.storePath}__manifest")
    GraftJava.retractManifest(spark, corpus.filter($"doc_id" === 1L),
      scratch, mm.storePath, 1L)
    assert(graft.streaming.UpsertStore.latestVersion(spark,
      s"${mm.storePath}__manifest") == vm,
      "replayed committed composition takedown advanced the manifest")

    // DSIR twin: exact subtraction by path, ≡ from-scratch
    val docs = Seq((1L, "en", "the cat sat"), (2L, "en", "unique snowflake"),
      (3L, "fr", "le chat")).toDF("doc_id", "lang", "text")
    val dsirPath = s"$scratch/dsir"
    new graft.streaming.DsirMaintainer(spark, dsirPath).bootstrap(docs)
    GraftJava.retractDsir(spark, docs.filter($"doc_id" === 2L), dsirPath, "en", 1L)
    val ref = s"$scratch/dsir_ref"
    new graft.streaming.DsirMaintainer(spark, ref).bootstrap(docs.filter($"doc_id" =!= 2L))
    assert(graft.streaming.UpsertStore.read(spark, dsirPath).get
      .orderBy("term").collect().toSeq ==
      graft.streaming.UpsertStore.read(spark, ref).get
        .orderBy("term").collect().toSeq,
      "Java-driven DSIR takedown diverged from a from-scratch bootstrap")

    // rollup twin: additive inverse by path
    val ts0 = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val events = Seq(("click", ts0, 1.5), ("click", ts0, 2.5), ("view", ts0, 1.0))
      .toDF("event_type", "ts", "value")
    val rollPath = s"$scratch/rollup"
    val rm = new graft.streaming.RollupMaintainer(spark, rollPath)
    rm.bootstrap(events)
    GraftJava.retractRollup(spark, events.filter($"value" === 2.5), rollPath, 1L)
    val rref = new graft.streaming.RollupMaintainer(spark, s"$scratch/rollup_ref")
    rref.bootstrap(events.filter($"value" =!= 2.5))
    assert(rm.serve().collect().toSeq == rref.serve().collect().toSeq,
      "Java-driven rollup takedown diverged from a from-scratch bootstrap")

    // external-query ANN serve from Java ≡ the Scala call
    val emb = (0L to 11L).map(i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j + 1).abs + 0.1))).toDF("vec_id", "emb")
    val annPath = s"$scratch/ivfpq"
    graft.operators.IvfPqIndex.ensure(spark, emb, annPath, centroids = 2)
    val queries = Seq((100L, Array.tabulate(8)(j => math.sin(8 + j + 1).abs + 0.2)))
      .toDF("query_id", "qe")
    val viaJava = GraftJava.serveIvfPqQueries(spark, emb, annPath, queries, -1, 3)
      .as[(Long, Long, Long)].collect().toSeq
    val viaScala = graft.operators.IvfPqIndex.searchQueries(spark, emb, annPath, queries)
      .as[(Long, Long, Long)].collect().toSeq
    assert(viaJava == viaScala && viaJava.nonEmpty,
      "Java external-query serve must equal the Scala serve")
  }

  test("Java-created catalog table time-travels with VERSION AS OF (q161 path)") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-jcat").toString)
    }
    spark.sql("CREATE TABLE graft.j_tt (k INT, v STRING) TBLPROPERTIES ('keys'='k')")
    spark.sql("INSERT INTO graft.j_tt VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.j_tt VALUES (2, 'B'), (3, 'c')")
    val pinned = spark.sql("SELECT k, v FROM graft.j_tt VERSION AS OF 0")
      .as[(Int, String)].collect().toSet
    val tip = spark.sql("SELECT k, v FROM graft.j_tt")
      .as[(Int, String)].collect().toSet
    assert(pinned == Set(1 -> "a", 2 -> "b"), s"pinned@0: $pinned")
    assert(tip == Set(1 -> "a", 2 -> "B", 3 -> "c"), s"tip: $tip")
  }
}
