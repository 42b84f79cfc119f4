package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** THE "CRAWL DAY" COMPOSITION (VERDICT r15 #8): one declared query
  * that drives a raw document batch through the WHOLE production
  * pipeline — ingest gate → quality scorer → near-dup clustering →
  * curation manifest → kept-delta extends of the serving indexes
  * (BM25 postings, trigram substring, IVF-PQ ANN) — and then serves
  * one retrieval answer and one dedup answer FROM THE STORES, all of
  * it oracle-replayed in a single DuckDB text. ContinuousPipelineSpec
  * proves the shared-restart STATE discipline for the maintainers
  * running together; this query is the OUTPUT-level integration proof
  * the spec can't give: the composed artifact of a full day's
  * curation + indexing hash-matches a from-scratch replay.
  *
  * Flow (the batch-curation shape a 100 TB/day pipeline runs):
  *  1. history = first 80% of the corpus; the crawl-day batch is the
  *     rest. [[graft.streaming.ManifestMaintainer]] bootstraps on
  *     history and folds the day in (gate + cluster + facts + manifest
  *     refresh inside) — streamed ≡ one-shot is q159's pinned
  *     contract, so the oracle replays the manifest from scratch.
  *  2. The day closes: the manifest's KEPT docs flow to the serving
  *     indexes as bootstrap(kept history) + ingest(kept crawl) —
  *     the postings and trigram maintainers each take the kept delta
  *     (curate-then-index, so retrieval never serves a document
  *     curation dropped). The embeddings table's own 80/20 split is
  *     the same day's vector delta into the IVF-PQ maintainer.
  *  3. Serves, all from the committed stores: the manifest rows (the
  *     dedup answer), BM25 top-10 for the kept probe docs (doc_id < 3
  *     — the retrieval answer), a substring serve (one present + one
  *     absent pattern), a positional PHRASE serve (round 17 — the
  *     sixteenth maintainer joins the composition, same kept-delta
  *     lifecycle), and the ANN top-3 for vec_id < 5.
  *
  * Output is one tall frame (kind, k1, k2, v) — each serve keeps its
  * own key shape inside the shared schema, every value hash-exact:
  *   ('manifest', doc_id, 0, reason)   ('bm25', query_id, rk, doc_id)
  *   ('substr', doc_id, 0, pattern)    ('phrase', doc_id, n_hits, q)
  *   ('ann', query_id, rk, neighbor)
  *
  * Scale shape: every stage is its standalone query's plan (priced in
  * SCALING.md individually); the composition adds NO new shuffle — the
  * kept-set semi-join against the manifest is the only inter-stage
  * edge, and it is keep-fraction-sized.
  */
object CrawlDay {
  import QueryDef.sql

  import graft.Stage.par

  private def T[A](l: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    if (sys.env.contains("GRAFT_PROFILE_CRAWL"))
      System.err.println(f"[crawl] $l%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    r
  }

  private val crawlDaySql: String =
    s"""WITH RECURSIVE ${Dedup.manifestCtes},
       |man AS (SELECT doc_id, (reason = 'kept') AS keep, reason FROM reasons),
       |kept AS (SELECT d.doc_id, d.text
       |         FROM documents d JOIN man USING (doc_id) WHERE man.keep),
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
       |annq AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
       |         FROM embeddings WHERE vec_id < 5),
       |annc AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce
       |         FROM embeddings),
       |anns AS (SELECT query_id, neighbor_id, list_cosine_similarity(qe, ce) AS sim
       |         FROM annq CROSS JOIN annc WHERE query_id <> neighbor_id),
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

  val q190CrawlDay: QueryDef = sql("q190_crawl_day", crawlDaySql) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut = math.floor(0.8 * maxId).toLong
    val base = graft.Scratch.dir("graft_crawl_day")

    // The DENSE leg (IVF-PQ bootstrap → ingest → ANN serve) depends
    // only on the embeddings table — not on the curation state or the
    // kept set — so the whole chain runs as one concurrent stage
    // spanning the text-side composition (round 19, guide §2.6 — the
    // q199 annLeg shape applied here: the four serving-index builds
    // used to run strictly serially, leaving most of local[32] idle in
    // each one's fixed-cost tail). Its stores are its own. Detached
    // through the BOUNDED stage pool (round 20 — VERDICT r19 #4).
    val annLeg = graft.Stage.detach {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      val maxV = emb.agg(max("vec_id")).head().getLong(0)
      val cutV = math.floor(0.8 * maxV).toLong
      val im = new graft.streaming.IvfPqMaintainer(s, s"$base/ivfpq")
      T("ivfpq boot+ingest") {
        im.bootstrap(emb.filter(col("vec_id") <= cutV))
        im.ingestBatch(emb.filter(col("vec_id") > cutV), Some(0L))
      }
      T("ann serve")(im.serve(emb, col("vec_id") < 5)
        .select(lit("ann").as("kind"), col("query_id").as("k1"),
          col("rk").as("k2"), col("neighbor_id").cast("string").as("v"))
        .localCheckpoint())
    }

    // the detached dense leg must never outlive a failed query (the
    // q199 ADVICE r18 rule): any text-side failure first DRAINS annLeg,
    // attaching its failure, if any, as suppressed.
    try {
      // 1. curation: gate → clusters → quality facts → manifest, the
      // crawl-day batch folded into the bootstrapped history stores.
      // This stage must finish first: it defines the kept set the
      // serving indexes index.
      val mm = new graft.streaming.ManifestMaintainer(s, d, s"$base/manifest")
      T("manifest boot")(mm.bootstrap(docs.filter(col("doc_id") <= cut)))
      T("manifest ingest")(mm.ingestBatch(docs.filter(col("doc_id") > cut), Some(0L)))
      val manifest = mm.current

      // 2. the day's KEPT docs flow to the serving indexes (the kept
      // semi-join is the only inter-stage edge — keep-fraction-sized).
      // Materialized ONCE, to executor-local DISK (round 20 — ADVICE
      // r19: a corpus-fraction frame scanned by three concurrent
      // chains must not pin MEMORY_AND_DISK blocks against the
      // unified execution pool); unpersisted after the serves land.
      val keptDocs = graft.Stage.pinDisk(docs
        .join(manifest.filter(col("keep")).select("doc_id"), Seq("doc_id")))
      // the three text-index families are disjoint stores → their
      // bootstrap→ingest chains run as parallel stages (q199's shape)
      val pm = new graft.streaming.PostingsMaintainer(s, s"$base/postings")
      val tm = new graft.streaming.TrigramMaintainer(s, s"$base/trigram")
      val phm = new graft.streaming.PhraseMaintainer(s, s"$base/phrase")
      par(
        () => T("postings boot+ingest") {
          pm.bootstrap(keptDocs.filter(col("doc_id") <= cut))
          pm.ingestBatch(keptDocs.filter(col("doc_id") > cut), Some(0L))
        },
        () => T("trigram boot+ingest") {
          tm.bootstrap(keptDocs.filter(col("doc_id") <= cut))
          tm.ingestBatch(keptDocs.filter(col("doc_id") > cut), Some(0L))
        },
        // round 17 (VERDICT r16 #7): the positional phrase family in
        // the composition — same kept-delta lifecycle as the others
        () => T("phrase boot+ingest") {
          phm.bootstrap(keptDocs.filter(col("doc_id") <= cut))
          phm.ingestBatch(keptDocs.filter(col("doc_id") > cut), Some(0L))
        })

      // 3. serves from the committed stores, one tall frame — the
      // three text serves are read-only on disjoint stores, so they
      // materialize in parallel too (the q199 serve shape)
      val manifestRows = manifest.select(lit("manifest").as("kind"),
        col("doc_id").as("k1"), lit(0L).as("k2"), col("reason").as("v"))
      val queries = keptDocs.filter(col("doc_id") < 3)
        .select(col("doc_id").as("query_id"),
          explode(TextAnalysis.tokens(col("text"))).as("term"))
        .distinct()
      val served = par(
        () => T("bm25 serve")(Retrieval.topKRanks(
            pm.search(queries).filter(col("query_id") =!= col("doc_id")), 10)
          .select(lit("bm25").as("kind"), col("query_id").as("k1"),
            col("rk").as("k2"), col("doc_id").cast("string").as("v"))
          .localCheckpoint()),
        () => T("substr serve")(tm.serve(
            Seq("key agg row", "zz missing zz").toDF("query"), keptDocs)
          .select(lit("substr").as("kind"), col("doc_id").as("k1"),
            lit(0L).as("k2"), col("query").as("v"))
          .localCheckpoint()),
        () => T("phrase serve")(phm.serve(
            Seq("key agg row", "zz missing zz").toDF("query"))
          .select(lit("phrase").as("kind"), col("doc_id").as("k1"),
            col("n_hits").as("k2"), col("query").as("v"))
          .localCheckpoint()))
      val annRows = concurrent.Await.result(
        annLeg, concurrent.duration.Duration.Inf)
      val out = (served :+ annRows).foldLeft(manifestRows)(_ unionByName _)
        .orderBy("kind", "k1", "k2", "v")
        .localCheckpoint()
      keptDocs.unpersist(blocking = false) // serves are all materialized
      out
    } catch {
      case t: Throwable =>
        scala.util.Try(concurrent.Await.result(annLeg,
          concurrent.duration.Duration.Inf)).failed
          .foreach(s => if (s ne t) t.addSuppressed(s))
        throw t
    }
  }

  val all: Seq[QueryDef] = Seq(q190CrawlDay)
}
