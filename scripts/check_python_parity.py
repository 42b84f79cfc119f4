#!/usr/bin/env python3
"""Python-entry-point parity gate (VERDICT r6 #3).

Asserts the PySpark twin (src/main/python/graft_pyspark.py) and the JVM
engine agree:

 1. python-declared parse+aggregate == GraftJava.parse+aggregate, row
    for row and schema for schema, on a deterministic batch that
    includes the reference's edge rows (trailing whitespace, malformed
    line);
 2. the SQL path agrees with both;
 3. a declared engine query runs from Python via the bridge;
 4. the upsert verb set and the `graft-upsert` DataFrame write path
    converge to the same table from Python;
 5. the streaming traffic pipeline runs end-to-end driven from Python
    (rate source -> parse -> window agg -> keyed sink).

Run:  sbt -batch package && python3 scripts/check_python_parity.py
"""
import glob
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "src", "main", "python"))

jars = [j for j in glob.glob(os.path.join(REPO, "target", "scala-2.13", "*.jar"))
        if "sources" not in j and "javadoc" not in j]
if not jars:
    sys.exit("graft jar not found -- run `sbt -batch package` first")
JAR = max(jars, key=os.path.getmtime)

from pyspark.sql import SparkSession  # noqa: E402

spark = (SparkSession.builder
         .master("local[4]")
         .appName("graft-python-parity")
         .config("spark.driver.extraClassPath", JAR)
         .config("spark.jars", JAR)
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.legacy.parquet.nanosAsLong", "true")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("WARN")

import graft_pyspark as g  # noqa: E402

failures = []


def check(name, ok, detail=""):
    print(("PASS " if ok else "FAIL ") + name + (f"  {detail}" if detail else ""))
    if not ok:
        failures.append(name)


# 1+2: batch parity on a deterministic frame with the reference's edge rows
raw = spark.createDataFrame(
    [("1000,5",), ("6000,7 ",), (" 12000 , 9",), ("garbage",), ("61000,11",)],
    "value string")
py_rows = sorted(g.aggregate(g.parse(raw)).collect())
jvm = spark._jvm.graft.javaapi.GraftJava
from pyspark.sql import DataFrame  # noqa: E402
jvm_df = DataFrame(jvm.aggregate(jvm.parse(raw._jdf), "60 seconds", "5 seconds"), spark)
jvm_rows = sorted(jvm_df.collect())
check("python parse+aggregate == GraftJava parse+aggregate",
      py_rows == jvm_rows and len(py_rows) > 0, f"{len(py_rows)} window rows")
check("schemas identical",
      g.aggregate(g.parse(raw)).schema == jvm_df.schema)
sql_rows = sorted(g.aggregate_sql(spark, g.parse(raw)).collect())
check("SQL path agrees", sql_rows == py_rows)

# 3: declared query through the bridge
names = g.query_names(spark)
check("query inventory visible from Python", len(names) >= 90, f"{len(names)} queries")
q01 = g.run_query(spark, "q01_pricing_summary", "/root/testdata/sf0.001")
check("declared query runs from Python", q01.count() > 0,
      f"q01 rows={q01.count()}")

# 4: upsert write paths converge (the reference's two-methods note,
# kafka_to_kudu.py:41-52)
with tempfile.TemporaryDirectory() as td:
    verb_path, fmt_path = os.path.join(td, "verbs"), os.path.join(td, "fmt")
    base = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    upd = spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string")
    sink = g.UpsertSink(spark, verb_path, ["k"])
    sink.upsert(base)
    sink.upsert(upd)
    base.write.format("graft-upsert").option("path", fmt_path) \
        .option("keys", "k").mode("append").save()
    upd.write.format("graft-upsert").option("path", fmt_path) \
        .option("keys", "k").mode("append").save()
    via_verbs = sorted(sink.read().collect())
    via_fmt = sorted(spark.read.format("graft-upsert").option("path", fmt_path)
                     .load().collect())
    check("verb-set and DataFrame write paths converge",
          via_verbs == via_fmt == sorted(
              spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")],
                                    "k int, v string").collect()))

# 5: streaming end-to-end driven from Python
with tempfile.TemporaryDirectory() as td:
    sink = g.UpsertSink(spark, os.path.join(td, "sink"), ["as_of_time"])
    source = (spark.readStream.format("rate").option("rowsPerSecond", "200").load()
              .selectExpr("concat(cast(unix_millis(timestamp) as string), ',', "
                          "cast(value % 50 as string)) as value"))
    q = g.run_traffic_pipeline(source, sink, os.path.join(td, "ckpt"),
                               trigger_interval="2 seconds")
    rows = 0
    try:
        for _ in range(30):
            time.sleep(1)
            try:
                rows = sink.read().count()
            except Exception:
                rows = 0  # sink has no committed version yet
            if rows > 0:
                break
    finally:
        q.stop()
    check("streaming pipeline driven from Python lands keyed upserts",
          rows > 0, f"sink rows={rows}")

# 6: round-8 catalog serve path from Python — register the pair graph
# over a deterministic corpus and read it back through plain SQL
with tempfile.TemporaryDirectory() as td:
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.UpsertCatalog")
    spark.conf.set("spark.sql.catalog.graft.path", td)
    t_a = " ".join(f"a{i}" for i in range(1, 31))
    t_a2 = " ".join([f"a{i}" for i in range(1, 27)] + [f"x{i}" for i in range(27, 31)])
    t_c = " ".join(f"c{i}" for i in range(1, 31))
    docs = spark.createDataFrame([(1, t_a), (2, t_c), (10, t_a2)],
                                 "doc_id long, text string")
    g.register_pair_graph(spark, "py_pg", docs, "py-parity", 0.6)
    pairs = sorted((r.doc_a, r.doc_b) for r in
                   spark.sql("SELECT doc_a, doc_b FROM graft.py_pg").collect())
    labels = sorted((r.doc_id, r.label) for r in
                    spark.sql("SELECT doc_id, label FROM graft.py_pg__clusters")
                    .collect())
    check("catalog-registered pair graph readable via SQL from Python",
          pairs == [(1, 10)] and labels == [(1, 1), (10, 1)],
          f"pairs={pairs} labels={labels}")

    # 7: round-11 sparse-retrieval serve path — register the BM25
    # postings index and read postings + stats back through plain SQL.
    # Same catalog instance as #6: the UpsertCatalog caches its
    # warehouse path at instantiation, so a second conf.set would be
    # silently ignored (table reads would point at the old tempdir).
    bm_docs = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha alpha gamma"), (3, "delta")],
        "doc_id long, text string")
    g.register_postings_index(spark, "py_bm", bm_docs)
    tf = sorted((r.term, r.doc_id, r.tf) for r in
                spark.sql("SELECT term, doc_id, tf FROM graft.py_bm "
                          "WHERE term = 'alpha'").collect())
    stats = spark.sql("SELECT n, avgdl FROM graft.py_bm__stats").collect()[0]
    check("catalog-registered postings index readable via SQL from Python",
          tf == [("alpha", 1, 1), ("alpha", 2, 2)]
          and stats.n == 3 and abs(stats.avgdl - 2.0) < 1e-12,
          f"tf={tf} stats={stats}")

    # 8: round-11 compressed-ANN serve path — register the PQ index
    # and read codes + codebooks back through plain SQL (the q127
    # surface). 64-dim vectors so the 8x8 subspace split applies.
    pq_emb = spark.createDataFrame(
        [(i, [float((i * 64 + j) % 7) for j in range(64)]) for i in range(40)],
        "vec_id long, emb array<double>")
    g.register_pq_index(spark, "py_pq", pq_emb)
    n_codes = spark.sql("SELECT count(*) AS n FROM graft.py_pq").collect()[0].n
    width = spark.sql("SELECT size(codes) AS w FROM graft.py_pq LIMIT 1").collect()[0].w
    n_sub = spark.sql(
        "SELECT count(DISTINCT m) AS n FROM graft.py_pq__codebooks").collect()[0].n
    check("catalog-registered PQ index readable via SQL from Python",
          n_codes == 40 and width == 8 and n_sub == 8,
          f"codes={n_codes} width={width} subspaces={n_sub}")

    # 9: round-13 contamination serve path (the q160 surface) --
    # register the train-split gram index and adjudicate an eval doc in
    # PLAIN SQL by table name.  Eval doc 100 shares exactly one 8-gram
    # (w1..w8) with train doc 1 and nothing with train doc 2.
    tr = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(1, 11))),
         (2, " ".join(f"z{i}" for i in range(1, 11)))],
        "doc_id long, text string")
    g.register_shingle_index(spark, "py_grams", tr)
    ev_text = " ".join([f"w{i}" for i in range(1, 9)] + ["q9", "q10"])
    spark.createDataFrame([(100, ev_text)], "doc_id long, text string") \
        .createOrReplaceTempView("py_eval")
    rows = spark.sql("""
        WITH ev0 AS (SELECT doc_id, split(lower(text), '\\\\s+') AS toks
                     FROM py_eval),
        ev AS (SELECT doc_id AS test_doc,
                      explode(array_distinct(transform(
                        sequence(1, size(toks) - 7),
                        i -> xxhash64(concat_ws(' ', slice(toks, i, 8)))))) AS g
               FROM ev0 WHERE size(toks) >= 8),
        stop AS (SELECT g FROM graft.py_grams__df WHERE dfreq > 50),
        pruned AS (SELECT p.g, p.doc_id AS train_doc
                   FROM graft.py_grams p LEFT ANTI JOIN stop ON p.g = stop.g)
        SELECT test_doc, train_doc, COUNT(*) AS shared
        FROM ev JOIN pruned ON ev.g = pruned.g
        GROUP BY 1, 2""").collect()
    hits = sorted((r.test_doc, r.train_doc, r.shared) for r in rows)
    check("catalog-registered gram index adjudicates contamination via SQL",
          hits == [(100, 1, 1)], f"hits={hits}")

    # 10: round-13 time-travel read (the q161 surface) -- a catalog
    # table created and written FROM PYTHON SQL, then read pinned at
    # the pre-update commit with VERSION AS OF.
    spark.sql("CREATE TABLE graft.py_tt (k INT, v STRING) "
              "TBLPROPERTIES ('keys'='k')")
    spark.sql("INSERT INTO graft.py_tt VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft.py_tt VALUES (2, 'B'), (3, 'c')")
    pinned = sorted((r.k, r.v) for r in
                    spark.sql("SELECT k, v FROM graft.py_tt VERSION AS OF 0")
                    .collect())
    tip = sorted((r.k, r.v) for r in
                 spark.sql("SELECT k, v FROM graft.py_tt").collect())
    check("VERSION AS OF catalog read from Python pins the pre-update commit",
          pinned == [(1, "a"), (2, "b")]
          and tip == [(1, "a"), (2, "B"), (3, "c")],
          f"pinned={pinned} tip={tip}")

    # 11: round-14 theta-store serve path (the q175 surface) --
    # register per-day theta sketches from Python and run the set-op
    # estimates in PLAIN SQL by table name.  Exact-mode data (30/30
    # users, k=64): day-1 users 1..30, day-2 users 21..50 -> the
    # intersect estimate must be EXACTLY 10 and a-not-b exactly 20.
    from datetime import datetime
    evs = ([(datetime(2026, 3, 1, 10), u) for u in range(1, 31)] +
           [(datetime(2026, 3, 2, 10), u) for u in range(21, 51)])
    g.register_theta_store(
        spark, "py_theta",
        spark.createDataFrame(evs, "ts timestamp, user_id long"), 64)
    r = spark.sql("""
        SELECT theta_intersect_estimate(a.sk, b.sk) AS i,
               theta_anotb_estimate(b.sk, a.sk) AS d,
               theta_union_estimate(a.sk, b.sk) AS u
        FROM graft.py_theta a JOIN graft.py_theta b
          ON b.day_ms = a.day_ms + 86400000""").collect()
    got = (r[0].i, r[0].d, r[0].u) if r else None
    check("catalog-registered theta store answers set ops via SQL",
          got == (10.0, 20.0, 50.0), f"got={got}")

    # 12b/16: round-15 composed-ANN serve path (the q186 surface) --
    # register the IVF-PQ index from Python and read all three tables
    # by name.  Reuses check #8's 64-dim corpus shape.
    g.register_ivfpq_index(spark, "py_ivfpq", pq_emb, 8)
    n_rows = spark.sql("SELECT count(*) AS n FROM graft.py_ivfpq").collect()[0].n
    w = spark.sql("SELECT size(codes) AS w FROM graft.py_ivfpq LIMIT 1").collect()[0].w
    n_cells = spark.sql("SELECT count(DISTINCT cell) AS n FROM graft.py_ivfpq"
                        ).collect()[0].n
    n_cents = spark.sql("SELECT count(*) AS n FROM graft.py_ivfpq__centroids"
                        ).collect()[0].n
    n_books = spark.sql("SELECT count(DISTINCT m) AS n FROM graft.py_ivfpq__codebooks"
                        ).collect()[0].n
    check("catalog-registered IVF-PQ index readable via SQL from Python",
          n_rows == 40 and w == 8 and n_cents == 8
          and 1 <= n_cells <= 8 and n_books == 8,
          f"rows={n_rows} width={w} cells={n_cells} cents={n_cents} books={n_books}")

    # 12: round-15 substring-index serve path (the q179 surface) --
    # register the trigram store from Python and intersect posting
    # lists in PLAIN SQL by table name.  'alpha' (grams alp/lph/pha)
    # is contained in docs 1 and 2 only.
    tri_docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "the alphabet soup"), (3, "zzz qqq")],
        "doc_id long, text string")
    g.register_trigram_index(spark, "py_tri", tri_docs)
    hits = [r.doc_id for r in spark.sql("""
        WITH pg AS (SELECT DISTINCT explode(transform(
                      sequence(1, length('alpha') - 2),
                      i -> substring('alpha', i, 3))) AS gram),
        cand AS (SELECT doc_id FROM pg JOIN graft.py_tri p USING (gram)
                 GROUP BY doc_id
                 HAVING COUNT(*) = (SELECT COUNT(*) FROM pg))
        SELECT doc_id FROM cand ORDER BY doc_id""").collect()]
    df_alp = spark.sql(
        "SELECT df FROM graft.py_tri__df WHERE gram = 'alp'").collect()
    check("catalog-registered trigram index serves substring search via SQL",
          hits == [1, 2] and [r.df for r in df_alp] == [2],
          f"hits={hits} df(alp)={df_alp}")

    # 13: round-15 near-dup-probe serve path (the q180 surface) --
    # register the simhash store from Python (simhash64 lands in the
    # session registry) and bucket-probe an eval doc in PLAIN SQL by
    # table name.  Eval doc 10 near-duplicates train doc 1 (26 of 30
    # tokens shared) and shares nothing with train doc 2.
    sh_train = spark.createDataFrame([(1, t_a), (2, t_c)],
                                     "doc_id long, text string")
    g.register_simhash_index(spark, "py_sh", sh_train)
    spark.createDataFrame([(10, t_a2)], "doc_id long, text string") \
        .createOrReplaceTempView("py_eval_sh")
    pairs = [(r.test_doc, r.train_doc) for r in spark.sql("""
        WITH sh AS (
          SELECT doc_id, simhash64(sh0) AS fp
          FROM (SELECT doc_id,
                       array_distinct(transform(sequence(1, size(toks) - 2),
                         i -> concat_ws(' ', element_at(toks, i),
                              element_at(toks, i + 1), element_at(toks, i + 2)))) AS sh0
                FROM (SELECT doc_id, split(lower(text), '\\\\s+') AS toks
                      FROM py_eval_sh)
                WHERE size(toks) >= 3)),
        ech AS (
          SELECT DISTINCT chunk, chunk_val, fp AS fp_e
          FROM sh LATERAL VIEW posexplode(transform(sequence(0, 7),
            ch -> (fp >> (ch * 8)) & 255)) pe AS chunk, chunk_val),
        fpp AS (
          SELECT DISTINCT ech.fp_e, sc.simhash AS fp_i
          FROM ech JOIN graft.py_sh__chunks sc
            ON ech.chunk = sc.chunk AND ech.chunk_val = sc.chunk_val
          WHERE bit_count(ech.fp_e ^ sc.simhash) <= 16)
        SELECT e.doc_id AS test_doc, i.doc_id AS train_doc
        FROM fpp JOIN sh e ON e.fp = fpp.fp_e
                 JOIN graft.py_sh i ON i.simhash = fpp.fp_i
        ORDER BY test_doc, train_doc""").collect()]
    check("catalog-registered simhash index answers near-dup probe via SQL",
          pairs == [(10, 1)], f"pairs={pairs}")

    # 17: round-16 exact-phrase serve path (the q193 surface) --
    # register the positional store from Python and run the phrase
    # intersection in PLAIN SQL by table name.  'quick brown' occurs
    # once in doc 1, twice in doc 2 (overlap-free), never in doc 3;
    # doc 3's reversed 'brown quick' must not match.
    ph_docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "quick brown quick brown"),
         (3, "brown quick zzz")],
        "doc_id long, text string")
    g.register_phrase_index(spark, "py_phr", ph_docs)
    ph = [(r.doc_id, r.n_hits) for r in spark.sql("""
        WITH qt AS (
          SELECT t.qi, t.term
          FROM (SELECT 1) LATERAL VIEW posexplode(split('quick brown', '\\\\s+')) t AS qi, term),
        votes AS (
          SELECT p.doc_id, e.pos - qt.qi AS start
          FROM qt JOIN graft.py_phr p ON qt.term = p.term
          LATERAL VIEW explode(p.positions) e AS pos),
        starts AS (
          SELECT doc_id, start FROM votes
          GROUP BY doc_id, start
          HAVING COUNT(*) = (SELECT COUNT(*) FROM qt))
        SELECT doc_id, COUNT(*) AS n_hits FROM starts
        GROUP BY doc_id ORDER BY doc_id""").collect()]
    check("catalog-registered phrase index answers positional phrase SQL",
          ph == [(1, 1), (2, 2)], f"phrase hits={ph}")

    # 18: round-16 materialized-join-view serve path (the q196
    # surface) -- register the view from Python, ingest a dimension
    # delta through the returned maintainer handle, and read the
    # maintained join in PLAIN SQL by table name.  Order 11 waits on
    # customer 2, who arrives via ingestRight.
    jv_orders = spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 6.0)],
        "o_orderkey long, o_custkey long, o_totalprice double")
    jv_cust = spark.createDataFrame(
        [(1, "ann", "auto")], "c_custkey long, c_name string, c_mktsegment string")
    jv = g.register_join_view(spark, "py_jv", jv_orders, jv_cust)
    pre = [r.o_orderkey for r in spark.sql(
        "SELECT o_orderkey FROM graft.py_jv ORDER BY 1").collect()]
    jv.ingestRight(spark.createDataFrame(
        [(2, "bob", "bike")],
        "c_custkey long, c_name string, c_mktsegment string")._jdf,
        spark._jvm.scala.Option.empty())
    post = [(r.o_orderkey, r.c_name) for r in spark.sql(
        "SELECT o_orderkey, c_name FROM graft.py_jv ORDER BY 1").collect()]
    check("catalog-registered join view maintains and serves via SQL",
          pre == [10] and post == [(10, "ann"), (11, "bob")],
          f"pre={pre} post={post}")

    # 19: round-18 takedown verbs from Python -- the compliance tool
    # that files a right-to-be-forgotten batch is usually a Python
    # script.  Register the train-gram index, retract train doc 1 via
    # the bridge, and assert (a) its postings stop serving by SQL,
    # (b) a replayed committed takedown is a version-level no-op.
    td_train = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(1, 11))),
         (2, " ".join(f"z{i}" for i in range(1, 11)))],
        "doc_id long, text string")
    td_path = g.register_shingle_index(spark, "py_td_grams", td_train)
    pre_n = spark.sql(
        "SELECT count(*) FROM graft.py_td_grams WHERE doc_id = 1").head()[0]
    g.retract_shingle_index(spark, td_train.filter("doc_id = 1"), td_path,
                            n=8, txn_id=1)
    post_n = spark.sql(
        "SELECT count(*) FROM graft.py_td_grams WHERE doc_id = 1").head()[0]
    v1 = spark._jvm.graft.streaming.UpsertStore.latestVersion(
        spark._jsparkSession, td_path)
    g.retract_shingle_index(spark, td_train.filter("doc_id = 1"), td_path,
                            n=8, txn_id=1)
    v2 = spark._jvm.graft.streaming.UpsertStore.latestVersion(
        spark._jsparkSession, td_path)
    check("python takedown verb retracts and self-skips on replay",
          pre_n > 0 and post_n == 0 and str(v1) == str(v2),
          f"pre={pre_n} post={post_n} v1={v1} v2={v2}")

    # 20: round-19 curation takedown from Python -- the verb a
    # compliance tool calls FIRST is the COMPOSITION's (gate ->
    # clusters -> facts -> manifest), and its effect must read in
    # plain SQL: the retracted canonical's manifest row goes, its
    # surviving exact copy is PROMOTED to kept.
    man_corpus = spark.createDataFrame(
        [(1, " ".join(f"d{i}" for i in range(1, 31))),
         (2, " ".join(f"u{i}" for i in range(1, 31))),
         (3, " ".join(f"v{i}" for i in range(1, 31))),
         (4, " ".join(f"d{i}" for i in range(1, 31)))],
        "doc_id long, text string")
    man_scratch = tempfile.mkdtemp(prefix="py-td-man")
    man_path = g.register_manifest(spark, "py_td_man", man_scratch, man_corpus)
    pre_keep4 = spark.sql(
        "SELECT keep FROM graft.py_td_man__manifest WHERE doc_id = 4").head()[0]
    g.retract_manifest(spark, man_corpus.filter("doc_id = 1"),
                       man_scratch, man_path, 1)
    gone1 = spark.sql(
        "SELECT count(*) FROM graft.py_td_man__manifest WHERE doc_id = 1").head()[0]
    post_keep4 = spark.sql(
        "SELECT keep FROM graft.py_td_man__manifest WHERE doc_id = 4").head()[0]
    canon = [r[0] for r in spark.sql(
        "SELECT first_doc_id FROM graft.py_td_man__gate").collect()]
    check("python curation takedown: manifest row gone, canonical promoted",
          pre_keep4 is False and gone1 == 0 and post_keep4 is True
          and 1 not in canon,
          f"pre4={pre_keep4} gone1={gone1} post4={post_keep4} canon={canon}")

    # 21: round-19 external-query ANN serve from Python -- a retrieval
    # caller brings its own (query_id, qe) vectors; no self-exclusion.
    import math
    ext_emb = spark.createDataFrame(
        [(i, [abs(math.sin(i * 8 + j + 1)) + 0.1 for j in range(8)])
         for i in range(12)],
        "vec_id long, emb array<double>")
    ext_path = g.register_ivfpq_index(spark, "py_ext_ann", ext_emb, centroids=2)
    ext_q = spark.createDataFrame(
        [(100, [abs(math.sin(8 + j + 1)) + 0.2 for j in range(8)])],
        "query_id long, qe array<double>")
    ext_res = g.serve_ivfpq_queries(spark, ext_emb, ext_path, ext_q).collect()
    check("python external-query ANN serve returns ranked neighbors",
          len(ext_res) == 3 and all(r.query_id == 100 for r in ext_res)
          and [r.rk for r in ext_res] == [1, 2, 3],
          f"rows={ext_res}")

spark.stop()
if failures:
    sys.exit(f"{len(failures)} parity check(s) failed: {failures}")
print("ALL PYTHON PARITY CHECKS PASSED")
