package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL surface for the custom expressions (function registry +
  * SparkSessionExtensions builders). */
class GraftFunctionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("registered SQL functions: cosine_similarity, rolling_hash, top_k_by_score") {
    GraftFunctions.register(spark)
    val cos = spark.sql(
      """SELECT cosine_similarity(
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |  array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c""".stripMargin)
      .head().getDouble(0)
    assert(math.abs(cos - 1.0) < 1e-12)

    val rh = spark.sql("SELECT rolling_hash('abc') AS h").head().getLong(0)
    val manual = "abc".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    assert(rh == manual)

    val topk = spark.sql(
      """SELECT top_k_by_score(s, i, 2) AS t FROM VALUES
        |  (1.0D, 10L), (3.0D, 30L), (2.0D, 20L) AS v(s, i)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(topk.map(r => (r.getLong(0), r.getDouble(1))) == Seq((30L, 3.0), (20L, 2.0)))

    val mh = spark.sql(
      "SELECT size(minhash_signature(array('a','b','c'), 16, 42L)) AS n")
      .head().getInt(0)
    assert(mh == 16)
  }

  test("normalize_text == the regex chain, byte for byte, on corpus + edges") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    GraftFunctions.register(spark)
    val edges = Seq(
      "", "   ", "a", "  a  ", "A  B!!C", "x\t\ny", "a1 B2  c3 ", "!!!",
      "The  quick,  BROWN fox!? 42  ", " leading and trailing ", "a-b_c.d e")
      .toDF("text")
    val corpus = Tables.documents(spark, SharedSpark.sf0001).select("text")
      .unionByName(edges)
    val regexForm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    val mismatches = corpus
      .select(col("text"),
        graft.functions.TextFunctions.normalize_text(col("text")).as("fast"),
        regexForm.as("slow"))
      .filter(col("fast") =!= col("slow"))
      .collect()
    assert(mismatches.isEmpty,
      s"normalize_text diverged on: ${mismatches.take(3).mkString("; ")}")
    // SQL name registered too
    assert(spark.sql("SELECT normalize_text('  A!  b2 ') AS n").head().getString(0) == "a b2")
  }

  test("extensions builder set is total (every builder constructs from SQL)") {
    GraftFunctions.register(spark)
    // hyperplane_bucket + simhash64 + dot_product through SQL
    val row = spark.sql(
      """SELECT dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT))) AS d,
        |       simhash64(array('x', 'y')) AS s,
        |       hyperplane_bucket(array(CAST(1.0 AS FLOAT)), 4, 1, 7L) AS b""".stripMargin)
      .head()
    assert(row.getDouble(0) == 8.0)
    assert(row.getInt(2) >= 0 && row.getInt(2) < 16)
  }

  test("bare decimal-literal arrays implicit-cast into the vector functions") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(3.0, 4.0), array(3.0, 4.0)) AS c, " +
        "dot_product(array(3.0, 4.0), array(1.0, 2.0)) AS d").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-6)
    assert(math.abs(r.getDouble(1) - 11.0) < 1e-5)
    // non-numeric arrays still fail analysis
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT cosine_similarity(array('a'), array('b'))").collect()
    }
    assert(e.getMessage.contains("DATATYPE_MISMATCH"))
  }

  test("shingles generator from SQL: LATERAL VIEW near-dup pipeline == Column API") {
    GraftFunctions.register(spark)
    Tables.documents(spark, SharedSpark.sf0001).createOrReplaceTempView("gf_docs")
    // the whole exact near-dup op, typed as warehouse SQL: tokenize →
    // shingle fan-out (custom generator) → inverted-index self-join →
    // exact Jaccard ≥ τ — the semantics the q46/q47 family pins
    val viaSql = spark.sql(
      """WITH sh AS (
        |  SELECT doc_id, shingle
        |  FROM (SELECT doc_id, split(lower(text), '\\s+') AS toks FROM gf_docs)
        |  LATERAL VIEW shingles(toks, 3) AS shingle),
        |sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
        |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id)
        |SELECT doc_a, doc_b
        |FROM inter
        |JOIN sizes sa ON inter.doc_a = sa.doc_id
        |JOIN sizes sb ON inter.doc_b = sb.doc_id
        |WHERE i / (sa.sz + sb.sz - i) >= 0.6""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaApi = graft.operators.Dedup
      .exactNearDupPairs(Tables.documents(spark, SharedSpark.sf0001), 0.6)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaSql == viaApi,
      s"SQL-only pipeline diverged: only-sql=${(viaSql -- viaApi).take(3)} " +
        s"only-api=${(viaApi -- viaSql).take(3)}")
    assert(viaApi.nonEmpty, "corpus should contain near-dup pairs")
  }

  test("round 19 (VERDICT r18 #5): top_k_pool_tie_closed — boundary ties close, pool is score-pure, refusal past the cap") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.functions.TopKFunctions
    // 10 strictly-better rows, an 80-wide tie group the nominal c=50
    // cuts INSIDE (ids ordered adversarially high), 40 strict losers;
    // repartition(7) forces the partial/merge path
    val rows = (1 to 10).map(i => (100.0 - i, i.toLong)) ++
      (0 until 80).map(j => (1.0, 1000L - j)) ++
      (0 until 40).map(j => (0.5, 2000L + j))
    val pool = rows.toDF("s", "i").repartition(7)
      .agg(TopKFunctions.top_k_pool_tie_closed(col("s"), col("i"), 50, 200).as("p"))
      .select(explode(col("p"))).select("col.id", "col.score")
      .as[(Long, Double)].collect()
    assert(pool.length == 90, s"pool must be top-c CLOSED over the boundary tie, got ${pool.length}")
    assert(pool.count(_._2 == 1.0) == 80, "the boundary tie group must be complete")
    assert(pool.forall(_._2 >= 1.0), "strict losers must stay out")
    // no boundary tie ⇒ identical to the plain top-k aggregate
    val distinctRows = (1 to 60).map(i => (i.toDouble, (1000 - i).toLong))
    val a = distinctRows.toDF("s", "i").repartition(5)
      .agg(TopKFunctions.top_k_pool_tie_closed(col("s"), col("i"), 20, 80).as("p"))
      .select(explode(col("p"))).select("col.id").as[Long].collect().toSeq
    val b = distinctRows.toDF("s", "i").repartition(5)
      .agg(TopKFunctions.top_k_by_score(col("s"), col("i"), 20).as("p"))
      .select(explode(col("p"))).select("col.id").as[Long].collect().toSeq
    assert(a == b, "without boundary ties the closed pool must equal plain top-k")
    // a tie group wider than maxKeep REFUSES loudly instead of serving
    // an id-arbitrary pool
    val wide = (0 until 300).map(j => (1.0, j.toLong))
    val e = intercept[Exception] {
      wide.toDF("s", "i").repartition(7)
        .agg(TopKFunctions.top_k_pool_tie_closed(col("s"), col("i"), 50, 100).as("p"))
        .collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(e).contains("tie group exceeds"),
      s"expected the loud pool-tie refusal, got: ${chain(e).take(400)}")
  }

  test("non-literal k in top_k_by_score fails with a clear message") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_by_score(s, i, CAST(i AS INT)) FROM VALUES (1.0D, 1L) AS v(s, i)")
        .collect()
    }
    assert(e.getMessage.contains("integer literal") || e.getMessage.contains("k"))
  }
}
