package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.streaming.UpsertStore

/** THE "TAKEDOWN DAY" COMPOSITION (round 17 — VERDICT r16 #1's
  * headline): one declared query that drives a takedown /
  * right-to-be-forgotten request through the WHOLE serving surface —
  * curation state, sparse retrieval, substring, phrase, and dense ANN
  * — and proves, against a single from-scratch DuckDB replay, that
  * every serve stops returning the retracted documents and that the
  * CURATION CONSEQUENCES of removal (a surviving exact duplicate
  * promoted to canonical, near-dup clusters re-solved, newly-elected
  * representatives ENTERING the kept set and therefore the indexes)
  * come out exactly as a rebuild on the remaining corpus would.
  *
  * Flow (the compliance shape a production pipeline runs daily):
  *  1. the curation maintainer bootstraps on the corpus; BM25,
  *     trigram, and phrase indexes build on its KEPT docs
  *     (curate-then-index); the IVF-PQ store builds on embeddings.
  *  2. The takedown set is chosen by DETERMINISTIC rules that hit the
  *     hard transitions: the smallest exact-dup CANONICAL that has a
  *     surviving duplicate (forces the gate re-point + promotion),
  *     the smallest near-dup cluster REPRESENTATIVE with a successor
  *     (forces re-election), two plain doc ids, and three vec_ids for
  *     the dense side.
  *  3. `ManifestMaintainer.retract` propagates the deletion through
  *     gate → pairs/clusters → facts → manifest; the index stores
  *     then follow the KEPT-SET DIFF: `retract(kept_before ∖
  *     kept_after)` removes the retracted docs, `extend(kept_after ∖
  *     kept_before)` indexes the docs the retraction PROMOTED into
  *     the kept set — the associative inverse pair that keeps every
  *     store ≡ a from-scratch build on the post-takedown kept set.
  *     The ANN store takes a keyed tombstone delete (no retrain — the
  *     quantizer's fixed-sample geometry is membership-independent).
  *  4. Serves, all from the committed stores: manifest rows, BM25
  *     top-10 for the kept probe docs (doc_id < 3), a substring serve
  *     (one present + one absent pattern), a phrase serve (one
  *     present + one absent phrase), ANN top-3 for vec_id < 5.
  *
  * Output is one tall (kind, k1, k2, v) frame, every value
  * hash-exact against the oracle's replay over `documents MINUS
  * gone` / `embeddings MINUS gone_vecs` — including the manifest
  * reasons, so the promotion and re-election are oracle-proven, not
  * just spec-pinned.
  *
  * Scale shape: the retraction is blast-radius-sized (gone docs'
  * posting lists, affected hash groups and clusters); the keyed-store
  * deletes are the only full-table rewrites — the compaction-
  * equivalent price of a takedown batch, paid once per day's batch,
  * not per document.
  *
  * Round 18 (VERDICT r17 #4): the corpus is SCOPED to the first 40%
  * of the doc_id range — the bootstrap half of the old shape re-paid
  * what q190 already proves — and the composition is STAGE-PARALLEL:
  * the dense (IVF-PQ) leg depends only on embeddings and spans the
  * whole text-side path as one concurrent chain, the three text-index
  * families boot / retract-extend / serve as parallel per-store
  * stages, and the curation maintainer's own retract overlaps its
  * gate and cluster sides. The committed `graft.TakedownProfile`
  * breakdown shows what remains is the TAKEDOWN path (gate re-point +
  * cluster re-solve + scoped manifest refresh + per-family df-recount
  * inverses), i.e. blast-radius-sized fixed store-commit work — the
  * honest per-batch price the design names, now the dominant term
  * exactly as a takedown query should be.
  */
object Takedown {
  import QueryDef.sql

  private val takedownSql: String =
    s"""WITH RECURSIVE corpus AS MATERIALIZED (
       |  SELECT * FROM documents
       |  WHERE doc_id <= (SELECT (MAX(doc_id) * 2) // 5 FROM documents)),
       |${Dedup.manifestCtesFor("corpus", "f")},
       |d1 AS (SELECT MIN(keep_doc) AS id FROM (
       |         SELECT sha256(text) AS h, MIN(doc_id) AS keep_doc, COUNT(*) AS c
       |         FROM corpus GROUP BY 1) WHERE c > 1),
       |d2 AS (SELECT MIN(rep) AS id FROM (
       |         SELECT cluster_id, MIN(doc_id) AS rep, COUNT(*) AS c
       |         FROM fstaged WHERE NOT is_exact_dup AND verdict = 'keep'
       |         GROUP BY 1) WHERE c > 1),
       |gone AS MATERIALIZED (SELECT id FROM d1 WHERE id IS NOT NULL
       |         UNION SELECT id FROM d2 WHERE id IS NOT NULL
       |         UNION SELECT UNNEST([10, 11]) AS id),
       |remaining AS MATERIALIZED (
       |  SELECT * FROM corpus WHERE doc_id NOT IN (SELECT id FROM gone)),
       |${Dedup.manifestCtesFor("remaining")},
       |man AS (SELECT doc_id, (reason = 'kept') AS keep, reason FROM reasons),
       |kept AS (SELECT r.doc_id, r.text
       |         FROM remaining r JOIN man USING (doc_id) WHERE man.keep),
       |ktoks AS (SELECT doc_id, t AS term
       |          FROM kept, unnest(string_split_regex(lower(text), '\\s+')) AS u(t)),
       |ktf AS (SELECT doc_id, term, COUNT(*) AS tf FROM ktoks GROUP BY 1, 2),
       |kdl AS (SELECT doc_id, COUNT(*) AS dl FROM ktoks GROUP BY 1),
       |kstats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM kdl),
       |kdft AS (SELECT term, COUNT(*) AS df FROM ktf GROUP BY 1),
       |kq AS (SELECT DISTINCT doc_id AS query_id, term FROM ktoks WHERE doc_id < 3),
       |contrib AS (
       |  SELECT kq.query_id, ktf.doc_id,
       |         ln(1 + (s.n - kdft.df + 0.5) / (kdft.df + 0.5))
       |           * ktf.tf * 2.2 / (ktf.tf + 1.2 * (1 - 0.75 + 0.75 * kdl.dl / s.avgdl)) AS c
       |  FROM kq JOIN ktf USING (term)
       |          JOIN kdl ON ktf.doc_id = kdl.doc_id
       |          JOIN kdft ON ktf.term = kdft.term
       |          CROSS JOIN kstats s),
       |scores AS (SELECT query_id, doc_id, ROUND(SUM(c), 6) AS score
       |           FROM contrib GROUP BY 1, 2),
       |sparse AS (SELECT query_id, doc_id,
       |                  ROW_NUMBER() OVER (PARTITION BY query_id
       |                                     ORDER BY score DESC, doc_id) AS rk
       |           FROM scores WHERE query_id <> doc_id),
       |subs AS (SELECT k.doc_id, p.pat
       |         FROM kept k, (VALUES ('key agg row'), ('zz missing zz')) p(pat)
       |         WHERE contains(k.text, p.pat)),
       |kpos AS (SELECT doc_id, unnest(lst) AS term,
       |                generate_subscripts(lst, 1) - 1 AS p
       |         FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS lst
       |               FROM kept)),
       |phq AS (SELECT q, unnest(string_split_regex(q, ' ')) AS term,
       |               generate_subscripts(string_split_regex(q, ' '), 1) - 1 AS qi
       |        FROM (VALUES ('key agg row'), ('zz missing zz')) v(q)),
       |phnq AS (SELECT q, COUNT(*) AS nq FROM phq GROUP BY 1),
       |phv AS (SELECT phq.q, kpos.doc_id, kpos.p - phq.qi AS st
       |        FROM phq JOIN kpos USING (term)),
       |phs AS (SELECT q, doc_id, st, COUNT(*) AS votes
       |        FROM phv GROUP BY 1, 2, 3),
       |phrase AS (SELECT phs.q, phs.doc_id, COUNT(*) AS n_hits
       |           FROM phs JOIN phnq ON phs.q = phnq.q AND phs.votes = phnq.nq
       |           GROUP BY 1, 2),
       |remv AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
       |         FROM embeddings WHERE vec_id NOT IN (7, 8, 9)),
       |annq AS (SELECT vec_id AS query_id, e AS qe FROM remv WHERE vec_id < 5),
       |anns AS (SELECT query_id, r.vec_id AS neighbor_id,
       |                list_cosine_similarity(qe, r.e) AS sim
       |         FROM annq CROSS JOIN remv r WHERE query_id <> r.vec_id),
       |annr AS (SELECT query_id, neighbor_id,
       |                ROW_NUMBER() OVER (PARTITION BY query_id
       |                                   ORDER BY sim DESC, neighbor_id) AS rk
       |         FROM anns)
       |SELECT 'manifest' AS kind, doc_id AS k1, CAST(0 AS BIGINT) AS k2, reason AS v FROM man
       |UNION ALL
       |SELECT 'bm25', query_id, CAST(rk AS BIGINT), CAST(doc_id AS VARCHAR)
       |FROM sparse WHERE rk <= 10
       |UNION ALL
       |SELECT 'substr', doc_id, CAST(0 AS BIGINT), pat FROM subs
       |UNION ALL
       |SELECT 'phrase', doc_id, CAST(n_hits AS BIGINT), q FROM phrase
       |UNION ALL
       |SELECT 'ann', query_id, CAST(rk AS BIGINT), CAST(neighbor_id AS VARCHAR)
       |FROM annr WHERE rk <= 3
       |ORDER BY kind, k1, k2, v""".stripMargin

  /** Stage pool + await-all-failure aggregation: the shared
    * [[graft.Stage]] contract (round 19 — one spelling engine-wide;
    * this object's private copy was its origin). */
  private def par[A](fs: (() => A)*): Seq[A] = graft.Stage.par(fs: _*)

  val q199TakedownDay: QueryDef = sql("q199_takedown_day", takedownSql) { (s, d) =>
    import s.implicits._
    // corpus SCOPE (round 18 — VERDICT r17 #4): the first 40% of the
    // doc_id range (integer arithmetic, mirrored in the oracle). The
    // takedown path's cost is blast-radius-sized FIXED store-commit
    // work — the r18 TakedownProfile shows it dominating the corpus-
    // sized bootstrap even unscoped — so the scope exists to stop the
    // declared query re-paying the bootstrap q190 already proves,
    // while keeping every hard transition: the 40% prefix contains an
    // exact-dup group at sf0.1 (promotion) and its own near-dup
    // clusters (split + re-election); smaller SFs have no dup group
    // at ANY scope (d1 is null there, as before).
    val docsAll = Tables.documents(s, d).select("doc_id", "text")
    val cut = (docsAll.agg(max("doc_id")).head().getLong(0) * 2L) / 5L
    val docs = docsAll.filter(col("doc_id") <= cut)
    val base = graft.Scratch.dir("graft_takedown_day")

    // The DENSE leg (IVF-PQ boot → tombstone retract → ANN serve)
    // depends only on the embeddings table — not on the curation
    // state or the kept set — so the WHOLE chain runs as one
    // concurrent stage spanning the text-side composition, and joins
    // at the final union. Its stores are its own (single-writer per
    // store holds).
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val annLeg = graft.Stage.detach {
      IvfPqIndex.ensure(s, emb, s"$base/ivfpq")
      IvfPqIndex.retract(s, emb.filter(col("vec_id").isin(7L, 8L, 9L)),
        s"$base/ivfpq", Some(1L))
      val remEmb = emb.filter(!col("vec_id").isin(7L, 8L, 9L))
      IvfPqIndex.search(s, remEmb, s"$base/ivfpq", col("vec_id") < 5)
        .select(lit("ann").as("kind"), col("query_id").as("k1"),
          col("rk").as("k2"), col("neighbor_id").cast("string").as("v"))
        .localCheckpoint()
    }

    // the detached dense leg must never outlive a failed query (ADVICE
    // r18): any text-side failure first DRAINS annLeg (no cooperative
    // cancel on a Spark job chain — awaiting is the honest barrier),
    // attaching its own failure, if any, as suppressed.
    try {
    // 1. curation state + serving indexes on the PRE-takedown kept
    // set. The three text-index families are disjoint stores →
    // parallel boot (the manifest bootstrap must finish first: it
    // defines the kept set they index).
    val mm = new graft.streaming.ManifestMaintainer(s, d, s"$base/manifest")
    mm.bootstrap(docs)
    // corpus-fraction frame scanned by three concurrent boot chains —
    // DISK-pinned, not localCheckpointed (round 20, ADVICE r19)
    val keptBefore = graft.Stage.pinDisk(docs
      .join(mm.current.filter(col("keep")).select("doc_id"), Seq("doc_id")))
    par(
      () => PostingsIndex.ensure(s, keptBefore, s"$base/postings"),
      () => TrigramIndex.build(s, keptBefore, s"$base/trigram"),
      () => PhraseIndex.build(s, keptBefore, s"$base/phrase"))

    // 2. the takedown set, by the oracle's deterministic rules
    val d1 = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_doc"), count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(min("keep_doc")).head()
    val facts = UpsertStore.read(s, s"$base/manifest__facts").get
    val staged = facts.join(mm.clusterM.current, Seq("doc_id"), "left")
      .select(col("doc_id"), col("is_exact_dup"), col("verdict"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
    val d2 = staged.filter(!col("is_exact_dup") && col("verdict") === "keep")
      .groupBy("cluster_id").agg(min("doc_id").as("rep"), count(lit(1)).as("c"))
      .filter(col("c") > 1).agg(min("rep")).head()
    val goneIds = (Seq(10L, 11L) ++
      (if (d1.isNullAt(0)) Nil else Seq(d1.getLong(0))) ++
      (if (d2.isNullAt(0)) Nil else Seq(d2.getLong(0)))).distinct
    val gone = docs.filter(col("doc_id").isin(goneIds: _*)).localCheckpoint()

    // 3. propagate: curation first, then the indexes follow the
    // kept-set DIFF (removals retract, promotions extend) — one
    // retract→extend chain per store family, chains in parallel (the
    // single-writer contract is per store; each chain owns one)
    mm.retract(gone, txnId = 1L)
    val keptAfter = graft.Stage.pinDisk(docs
      .join(mm.current.filter(col("keep")).select("doc_id"), Seq("doc_id")))
    val removals = keptBefore
      .join(keptAfter.select("doc_id"), Seq("doc_id"), "left_anti").localCheckpoint()
    val additions = keptAfter
      .join(keptBefore.select("doc_id"), Seq("doc_id"), "left_anti").localCheckpoint()
    val extendToo = !additions.isEmpty
    par(
      () => {
        PostingsIndex.retract(s, removals, s"$base/postings", Some(1L))
        if (extendToo) PostingsIndex.extend(s, additions, s"$base/postings", Some(2L))
      },
      () => {
        TrigramIndex.retract(s, removals, s"$base/trigram", Some(1L))
        if (extendToo) TrigramIndex.extend(s, additions, s"$base/trigram", Some(2L))
      },
      () => {
        PhraseIndex.retract(s, removals, s"$base/phrase", Some(1L))
        if (extendToo) PhraseIndex.extend(s, additions, s"$base/phrase", Some(2L))
      })

    // 4. serves from the committed post-takedown stores — read-only,
    // one per store family, materialized in parallel and unioned
    val manifestRows = mm.current.select(lit("manifest").as("kind"),
      col("doc_id").as("k1"), lit(0L).as("k2"), col("reason").as("v"))
    val queries = keptAfter.filter(col("doc_id") < 3)
      .select(col("doc_id").as("query_id"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
      .distinct()
    val served = par(
      () => Retrieval.topKRanks(
          PostingsIndex.search(s, s"$base/postings", queries)
            .filter(col("query_id") =!= col("doc_id")), 10)
        .select(lit("bm25").as("kind"), col("query_id").as("k1"),
          col("rk").as("k2"), col("doc_id").cast("string").as("v"))
        .localCheckpoint(),
      () => TrigramIndex.search(s, s"$base/trigram",
          Seq("key agg row", "zz missing zz").toDF("query"), keptAfter)
        .select(lit("substr").as("kind"), col("doc_id").as("k1"),
          lit(0L).as("k2"), col("query").as("v"))
        .localCheckpoint(),
      () => PhraseIndex.search(s, s"$base/phrase",
          Seq("key agg row", "zz missing zz").toDF("query"))
        .select(lit("phrase").as("kind"), col("doc_id").as("k1"),
          col("n_hits").as("k2"), col("query").as("v"))
        .localCheckpoint())
    val annRows = concurrent.Await.result(
      annLeg, concurrent.duration.Duration.Inf)
    val out = (served :+ annRows).foldLeft(manifestRows)(_ unionByName _)
      .orderBy("kind", "k1", "k2", "v")
      .localCheckpoint()
    keptBefore.unpersist(blocking = false)
    keptAfter.unpersist(blocking = false)
    out
    } catch {
      case t: Throwable =>
        scala.util.Try(concurrent.Await.result(annLeg,
          concurrent.duration.Duration.Inf)).failed
          // the failed stage may BE annLeg — never self-suppress
          .foreach(s => if (s ne t) t.addSuppressed(s))
        throw t
    }
  }

  val all: Seq[QueryDef] = Seq(q199TakedownDay)
}
