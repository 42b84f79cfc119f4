package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.functions.TextFunctions

/** Deduplication operators over `documents` — exact, n-gram Jaccard,
  * MinHash+LSH, and SimHash. Each is shaped for 100 TB:
  *
  *  - exact dedup groups by a 256-bit content hash, so the shuffle
  *    carries 32 bytes per doc, never the full text;
  *  - the n-gram inverted index prunes shingles by document frequency
  *    before the self-join (stop-shingle removal), bounding the join
  *    fan-out;
  *  - MinHash/LSH reduces each doc to a k-long signature and only
  *    bucket-collisions are compared — candidate generation is an
  *    equi-join on (band, band_signature), fully shuffle-parallel;
  *  - SimHash bands the 64-bit fingerprint into 4×16-bit chunks
  *    (pigeonhole: hamming ≤ 3 ⇒ at least one chunk equal).
  */
object Dedup {
  import QueryDef.{rowsOnly, sql}
  import Distributed.parallelized

  /** Word-3-gram shingle ARRAY per document (empty when < 3 tokens).
    * Shingling (not unigrams) is what makes LSH selective: unigram sets
    * over a small vocabulary are near-identical for ALL documents, so
    * every pair would band-collide; 3-gram space is |V|³. */
  def shingleArray(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    documents
      .withColumn("toks", toks)
      .withColumn("shingles",
        when(size(col("toks")) >= 3, expr(
          "array_distinct(transform(sequence(1, size(toks) - 2), " +
            "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))"))
          .otherwise(array().cast("array<string>")))
      .drop("toks")
  }

  /** [[shingleArray]] restricted to docs that can have shingles at all
    * (≥ 3 tokens), with the filter on the RAW text. Filtering on
    * `size(shingles) > 0` instead pushes the whole shingle chain into
    * the scan predicate and re-derives it per row in interpreted mode
    * — the q80 pushdown tax, measured 5.4 s alone at bench SF vs
    * ~0.1 s for this token-count predicate. Same survivor set by
    * construction: shingles are empty iff the doc has < 3 tokens. */
  private[graft] def shingleArrayNonEmpty(documents: DataFrame): DataFrame =
    shingleArray(documents.filter(size(TextAnalysis.tokens(col("text"))) >= 3))

  /** Distinct word-3-gram shingles per document (docs with ≥ 3 tokens),
    * one row each — via the custom [[graft.functions.ShingleGenerator]]
    * UDTF, which streams shingles and dedups per document without
    * materializing the intermediate array (same output as the
    * transform+explode+distinct composition, pinned by the q46 oracle).
    */
  def shingles(documents: DataFrame): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    documents.select(
      col("doc_id"),
      graft.functions.GeneratorFunctions.shingles(toks, 3))
  }

  /** Exact dedup via content hash: one row per distinct content, keeping
    * the smallest doc_id. */
  val q45DedupExact: QueryDef = sql(
    "q45_dedup_exact",
    """SELECT sha256(text) AS content_hash,
      |       CAST(MIN(doc_id) AS BIGINT) AS keep_doc_id,
      |       COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY sha256(text)
      |ORDER BY keep_doc_id""".stripMargin) { (s, d) =>
    Tables.documents(s, d)
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_doc_id")
  }

  /** Near-dup detection by exact n-gram Jaccard over an inverted shingle
    * index (df-pruned). SQL-expressible → fully oracle-checked. */
  val q46DedupNgramJaccard: QueryDef = sql(
    "q46_dedup_ngram_jaccard",
    """WITH tok AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      |  FROM documents WHERE len(string_split_regex(lower(text), '\s+')) >= 3),
      |sh0 AS (
      |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
      |  FROM tok, unnest(range(1, len(toks) - 1)) AS u(i)),
      |df AS (SELECT shingle, COUNT(*) AS dfreq FROM sh0 GROUP BY shingle),
      |sh AS (SELECT s.doc_id, s.shingle FROM sh0 s JOIN df USING (shingle) WHERE dfreq <= 50),
      |sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM sh GROUP BY doc_id),
      |pairs AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY a.doc_id, b.doc_id)
      |SELECT doc_a, doc_b,
      |       ROUND(CAST(shared AS DOUBLE) / (sa.nsh + sb.nsh - shared), 4) AS jaccard
      |FROM pairs
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE CAST(shared AS DOUBLE) / (sa.nsh + sb.nsh - shared) >= 0.1
      |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    // every downstream step needs only shingle IDENTITY (df counts,
    // set sizes, pair intersections), so the 3-word shingle strings
    // collapse to xxhash64 longs before ANY shuffle — the inverted
    // index and self-join move 8 B/entry instead of ~25 B. A 64-bit
    // collision over ~10⁵ distinct shingles (P ≈ 1e-11) would surface
    // as an oracle hash mismatch, so the driver gate guards the trick.
    // NOT `parallelized`: the shingle+hash stage here is cheap enough
    // that the guard repartition's extra text shuffle costs more than
    // the single-split scan at bench SF (measured +0.5 s), and at
    // warehouse scale file splits parallelize the scan anyway
    val sh = shingles(Tables.documents(s, d))
      .select(col("doc_id"), xxhash64(col("shingle")).as("sh"))
      .cache()
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("dfreq"))
    // stop-shingle REMOVAL, not keep-join: the >50-df shingles are few
    // (they're the reason for pruning), so broadcasting them as an
    // anti-join list replaces a full shuffle join of every (doc,
    // shingle) row against the df table
    val pruned = sh.join(
      broadcast(dfreq.filter(col("dfreq") > 50).select("sh")),
      Seq("sh"), "left_anti").select("doc_id", "sh")
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val a = pruned.select(col("doc_id").as("doc_a"), col("sh"))
    val b = pruned.select(col("doc_id").as("doc_b"), col("sh"))
    val pairs = a.join(b, Seq("sh")).filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    val jac = col("shared").cast("double") /
      (col("na") + col("nb") - col("shared"))
    pairs
      .join(sizes.select(col("doc_id").as("doc_a"), col("nsh").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("nsh").as("nb")), "doc_b")
      .filter(jac >= 0.1)
      .select(col("doc_a"), col("doc_b"), round(jac, 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** EXACT set-similarity join via PREFIX FILTERING (AllPairs:
    * Bayardo et al. WWW 2007; PPJoin: Xiao et al. WWW 2008) — the
    * guaranteed-complete alternative to both q46 (whose df≤50 cap
    * CHANGES semantics to make the inverted-index self-join tractable)
    * and q47's MinHash (probabilistic recall). Order every doc's
    * shingle set by a global (df asc, hash) total order and emit only
    * the PREFIX of length n − ⌈t·n⌉ + 1: for J(x,y) ≥ t the overlap
    * is ≥ t/(1+t)·(|x|+|y|) ≥ ⌈t·|x|⌉ (since |y| ≥ t·|x|), and two
    * sets sharing ≥ α tokens must collide inside their (n−α+1)-length
    * prefixes — so every qualifying pair survives candidate
    * generation, with NO df cap and NO hashing risk beyond the shared
    * xxhash64-identity trick the oracle gate guards. Candidates then
    * verify with an exact intersection count restricted to candidate
    * docs. Scale shape: at t=0.5 each doc ships half its shingles
    * into the join, and those are its RAREST half (df-ascending
    * order), so posting lists in the self-join are the short ones —
    * the candidate count is output-bound, not corpus²; the verify
    * join touches only candidate pairs. The one vocab-sized extra
    * cost vs q46 is the df join that assigns the global order. */
  val q173SetSimPrefixJoin: QueryDef = sql(
    "q173_setsim_prefix_join",
    exactPairsSql(0.5, "SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM jp")) { (s, d) =>
    val t = 0.5
    // one shingle pass feeds the digest, the df census, the prefix
    // emission, and the verify arrays — materialized once below
    val arr0 = shingleArrayNonEmpty(Tables.documents(s, d))
      .select(col("doc_id"), hashedShingleCols.as("hsh"))
    // DEDUP-FIRST (the q48/q56 lesson, prefix-join edition): docs with
    // IDENTICAL shingle sets collapse to one representative before any
    // pairwise machinery — on a duplicate-dense corpus the copies
    // multiply every df count and posting list, and candidate volume
    // grows quadratically in copy count (measured 20.8× at the 10×
    // key-offset replica before this collapse). Identical sets expand
    // back afterwards: J = 1 pairs within a group, and each surviving
    // representative pair fans out to its groups' member cross product
    // — output-bound by definition, never candidate-bound.
    // localCheckpoint, not persist (ADVICE r14): the query fn returns a
    // lazy plan with no unpersist site — the checkpoint materializes
    // the group table once (it feeds four downstream reads) and the
    // ContextCleaner frees the blocks when the result is dropped.
    val groups = arr0
      .withColumn("dig", expr("xxhash64(array_sort(hsh))"))
      .groupBy("dig")
      .agg(min("doc_id").as("rep"), collect_list("doc_id").as("members"),
        first("hsh").as("hsh"), count(lit(1)).as("sz"))
      .localCheckpoint()
    val arr = groups.select(col("rep").as("doc_id"), col("hsh"))
    val sh = arr.select(col("doc_id"), explode(col("hsh")).as("sh"))
    val dfreq = sh.groupBy("sh").agg(count(lit(1)).as("dfreq"))
    val docs = sh.join(dfreq, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("dfreq"), col("sh")))).as("ord"),
        count(lit(1)).as("n"))
    // prefix WITH its 1-based position in the (df asc, hash) order —
    // the position feeds PPJoin's positional filter below
    val pref = docs.select(col("doc_id"), col("n"),
        posexplode(expr(
          s"slice(ord, 1, CAST(greatest(1L, n - CAST(ceil($t * n) AS BIGINT) + 1L) AS INT))")))
      .select(col("doc_id"), col("n"), (col("pos") + 1).as("i"),
        col("col.sh").as("sh"))
    // PPJoin positional filter: for the FIRST shared token (positions
    // i*, j* in the shared order) the overlap is ≤ 1 + min(na−i*,
    // nb−j*); a qualifying pair needs overlap ≥ ⌈t/(1+t)·(na+nb)⌉ and
    // its first shared token provably sits inside both prefixes, so
    // filtering every collision row keeps completeness
    val aMin = ceil(lit(t / (1 + t)) * (col("na") + col("nb")))
    val cand = pref.select(col("doc_id").as("doc_a"), col("n").as("na"),
        col("i").as("ia"), col("sh"))
      .join(pref.select(col("doc_id").as("doc_b"), col("n").as("nb"),
        col("i").as("ib"), col("sh")), Seq("sh"))
      .filter(col("doc_a") < col("doc_b") &&
        col("nb") >= ceil(lit(t) * col("na")) &&
        col("nb") <= floor(col("na") / lit(t)) &&
        lit(1) + least(col("na") - col("ia"), col("nb") - col("ib")) >= aMin)
      .select("doc_a", "doc_b").distinct()
    // candidate-only verify on the per-doc hash ARRAYS (the q48
    // verifyExact shape) — candidate-row-sized, never posting-sized
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    val repPairs = cand
      .join(arr.select(col("doc_id").as("doc_a"), col("hsh").as("sh_a")), "doc_a")
      .join(arr.select(col("doc_id").as("doc_b"), col("hsh").as("sh_b")), "doc_b")
      .withColumn("j", jac)
      .filter(col("j") >= t)
      .select(col("doc_a"), col("doc_b"), col("j"))
    // expand back to doc pairs: identical-set groups pair at J = 1
    // internally; a representative pair fans out to both groups'
    // member cross product (same sets ⇒ same jaccard for every copy)
    val intra = groups.filter(col("sz") > 1)
      .select(col("members"), explode(col("members")).as("x"))
      .select(col("x"), explode(col("members")).as("y"))
      .filter(col("x") < col("y"))
      .select(col("x").as("doc_a"), col("y").as("doc_b"), lit(1.0).as("j"))
    val cross = repPairs
      .join(groups.select(col("rep").as("doc_a"), col("members").as("ma")), "doc_a")
      .join(groups.select(col("rep").as("doc_b"), col("members").as("mb")), "doc_b")
      .select(col("mb"), col("j"), explode(col("ma")).as("x"))
      .select(col("x"), col("j"), explode(col("mb")).as("y"))
      .select(least(col("x"), col("y")).as("doc_a"),
        greatest(col("x"), col("y")).as("doc_b"), col("j"))
    cross.unionByName(intra)
      .select(col("doc_a"), col("doc_b"), round(col("j"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** The cross-split exact near-dup pairs at J ≥ 0.6 — the shared
    * oracle of the simhash-index pair q176/q177: eval docs (> the 80%
    * cut) against indexed docs (≤ the cut). */
  private val q176Sql: String =
    s"""WITH ${pairsCtes(0.6, "documents")},
       |c AS (SELECT CAST(floor(0.8 * max(doc_id)) AS BIGINT) AS cut FROM documents)
       |SELECT CASE WHEN doc_a > cut THEN doc_a ELSE doc_b END AS test_doc,
       |       CASE WHEN doc_a > cut THEN doc_b ELSE doc_a END AS train_doc,
       |       ROUND(jac, 4) AS jaccard
       |FROM jp, c WHERE (doc_a <= cut) <> (doc_b <= cut)
       |ORDER BY test_doc, train_doc""".stripMargin

  /** Near-dup probe of an eval split against the STORED banded-SimHash
    * index ([[SimhashIndex]]) — q48's machinery as a derived store:
    * build on the first 60% of the corpus, extend with the next 20%
    * (keyed upserts, txn-ledgered), then probe the eval 20% — bucket-
    * matched chunk postings, Hamming ≤ 16 prefilter on DISTINCT
    * fingerprints, exact-Jaccard verify on candidates only (train-side
    * shingles recomputed for candidate docs, never stored). The oracle
    * is the brute-force cross-split pair set at J ≥ 0.6, so the driver
    * proves the index path loses nothing the full self-join finds.
    * Scale: serve touches only buckets the eval set occupies — the
    * question "is this batch near-duplicating the corpus" stops being
    * corpus-sized. */
  val q176SimhashIndexServe: QueryDef = sql(
    "q176_simhash_index_serve", q176Sql) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cutA = math.floor(0.6 * maxId).toLong
    val cutB = math.floor(0.8 * maxId).toLong
    val path = graft.Scratch.dir("graft_simhash") + "/index"
    SimhashIndex.build(s, docs.filter(col("doc_id") <= cutA), path)
    SimhashIndex.extend(s,
      docs.filter(col("doc_id") > cutA && col("doc_id") <= cutB), path, Some(0L))
    SimhashIndex.serve(s, path, docs.filter(col("doc_id") > cutB),
        docs.filter(col("doc_id") <= cutB))
      .orderBy("test_doc", "train_doc")
  }

  /** q176's index maintained CONTINUOUSLY — the THIRTEENTH maintainer
    * ([[graft.streaming.SimhashMaintainer]]): bootstrap on the first
    * 60%, fold the next 20% in as two delta batches (`ingestBatch` IS
    * the foreachBatch body; the streaming-harness variant with
    * checkpoint restart is SimhashMaintainSpec's job), then probe the
    * eval 20% against the committed stores. Both stores are idempotent
    * by key, so replay safety needs no ledger skip (the gate/postings
    * discipline — contrast the additive MG/DSIR folds). Shares q176's
    * from-scratch oracle: streamed extends ≡ one-shot build,
    * hash-proven by the driver. */
  val q177SimhashMaintain: QueryDef = sql(
    "q177_simhash_maintain", q176Sql) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cutA = math.floor(0.6 * maxId).toLong
    val cutM = math.floor(0.7 * maxId).toLong
    val cutB = math.floor(0.8 * maxId).toLong
    val store = graft.Scratch.dir("graft_simhash_maint") + "/index"
    val m = new graft.streaming.SimhashMaintainer(s, store)
    m.bootstrap(docs.filter(col("doc_id") <= cutA))
    m.ingestBatch(docs.filter(col("doc_id") > cutA && col("doc_id") <= cutM), Some(0L))
    m.ingestBatch(docs.filter(col("doc_id") > cutM && col("doc_id") <= cutB), Some(1L))
    m.serve(docs.filter(col("doc_id") > cutB), docs.filter(col("doc_id") <= cutB))
      .orderBy("test_doc", "train_doc")
  }

  /** q176's near-dup probe in PURE SQL over the CATALOG-registered
    * simhash store (VERDICT r14 #3) — the q106/q160/q175 idiom applied
    * to the last derived-store family without a by-name SQL surface:
    * [[SimhashIndex.registerCatalog]] exposes the doc→fingerprint
    * table as `graft.<t>` and the banded chunk postings as
    * `graft.<t>__chunks`, and the whole probe — shingle + `simhash64`
    * the eval split (the custom expression is SQL-registered via
    * [[graft.GraftFunctions]]), bucket-join the stored chunk postings,
    * Hamming-prefilter with `bit_count`, exact-Jaccard verify on
    * candidates via hashed-shingle `array_intersect`/`array_union` —
    * is one SQL text an auditor can run by table name. Shares q176's
    * brute-force cross-split oracle: catalog read + SQL-registered
    * expressions + stored postings ≡ the Column-API serve,
    * hash-proven. Scale shape is q176's: only buckets the eval set
    * occupies join, and the verify re-shingles candidate docs alone
    * (the shingle CTE is lazily evaluated per reference — Catalyst
    * prunes the train-side shingle pass to candidate rows). */
  val q180CatalogSimhashSql: QueryDef = sql(
    "q180_catalog_simhash_sql", q176Sql) { (s, d) =>
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    graft.GraftFunctions.register(s)
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val maxId = docs.agg(max("doc_id")).head().getLong(0)
    val cut = math.floor(0.8 * maxId).toLong
    val t = s"sh_${PairGraph.dirKey64(d)}"
    SimhashIndex.registerCatalog(s, t, docs.filter(col("doc_id") <= cut))
    Tables.registerAll(s, d)
    s.sql(
      s"""WITH sh AS (
         |  SELECT doc_id,
         |         transform(sh0, x -> xxhash64(x)) AS hsh,
         |         simhash64(sh0) AS fp
         |  FROM (
         |    SELECT doc_id,
         |           array_distinct(transform(sequence(1, size(toks) - 2),
         |             i -> concat_ws(' ', element_at(toks, i),
         |                  element_at(toks, i + 1), element_at(toks, i + 2)))) AS sh0
         |    FROM (SELECT doc_id, split(lower(text), '\\\\s+') AS toks
         |          FROM documents WHERE doc_id > $cut)
         |    WHERE size(toks) >= 3)),
         |ech AS (
         |  SELECT DISTINCT chunk, chunk_val, fp AS fp_e
         |  FROM sh LATERAL VIEW posexplode(transform(sequence(0, 7),
         |    ch -> (fp >> (ch * 8)) & 255)) pe AS chunk, chunk_val),
         |fpp AS (
         |  SELECT DISTINCT ech.fp_e, sc.simhash AS fp_i
         |  FROM ech JOIN graft.`${t}__chunks` sc
         |    ON ech.chunk = sc.chunk AND ech.chunk_val = sc.chunk_val
         |  WHERE bit_count(ech.fp_e ^ sc.simhash) <= 16),
         |cand AS (
         |  SELECT e.doc_id AS test_doc, i.doc_id AS train_doc
         |  FROM fpp JOIN sh e ON e.fp = fpp.fp_e
         |           JOIN graft.`$t` i ON i.simhash = fpp.fp_i),
         |tsh AS (
         |  SELECT doc_id,
         |         transform(array_distinct(transform(sequence(1, size(toks) - 2),
         |           i -> concat_ws(' ', element_at(toks, i),
         |                element_at(toks, i + 1), element_at(toks, i + 2)))),
         |           x -> xxhash64(x)) AS hsh
         |  FROM (SELECT doc_id, split(lower(text), '\\\\s+') AS toks
         |        FROM documents WHERE doc_id <= $cut)
         |  WHERE size(toks) >= 3),
         |ver AS (
         |  SELECT cand.test_doc, cand.train_doc,
         |         size(array_intersect(a.hsh, b.hsh))
         |           / size(array_union(a.hsh, b.hsh)) AS j
         |  FROM cand JOIN sh a ON a.doc_id = cand.test_doc
         |            JOIN tsh b ON b.doc_id = cand.train_doc)
         |SELECT test_doc, train_doc, ROUND(j, 4) AS jaccard
         |FROM ver WHERE j >= 0.6
         |ORDER BY test_doc, train_doc""".stripMargin)
  }

  /** CTE chain computing exact-Jaccard pairs `jp(doc_a, doc_b, jac)`
    * at threshold `tau` over full (un-pruned) 3-gram shingle sets of
    * `src` — the shared ground-truth core of the q47/q48/q56 oracles
    * (each composes its own SELECT, q56 its own source CTEs). */
  private def pairsCtes(tau: Double, src: String, p: String = ""): String =
    s"""${p}tok AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS toks
       |  FROM $src WHERE len(string_split_regex(lower(text), '\\s+')) >= 3),
       |${p}sh0 AS (
       |  SELECT DISTINCT doc_id, toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2] AS shingle
       |  FROM ${p}tok, unnest(range(1, len(toks) - 1)) AS u(i)),
       |${p}sizes AS (SELECT doc_id, COUNT(*) AS nsh FROM ${p}sh0 GROUP BY doc_id),
       |${p}pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
       |  FROM ${p}sh0 a JOIN ${p}sh0 b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id),
       |${p}jp AS (
       |  SELECT doc_a, doc_b,
       |         CAST(shared AS DOUBLE) / (sa.nsh + sb.nsh - shared) AS jac
       |  FROM ${p}pairs
       |  JOIN ${p}sizes sa ON sa.doc_id = doc_a
       |  JOIN ${p}sizes sb ON sb.doc_id = doc_b
       |  WHERE CAST(shared AS DOUBLE) / (sa.nsh + sb.nsh - shared) >= $tau)""".stripMargin

  private def exactPairsSql(tau: Double, select: String): String =
    s"""WITH ${pairsCtes(tau, "documents")}
       |$select
       |ORDER BY doc_a, doc_b""".stripMargin

  /** One 64-bit hash per LSH band over a MinHash signature column
    * named `sig` (slice → xxhash64, band index mixed in). The SINGLE
    * definition shared by q47, the dedup-first pipeline, and the
    * streaming near-dup index — a drifting copy would silently desync
    * batch vs streaming dedup decisions. */
  private[graft] def bandHashes(bands: Int, rows: Int): Column =
    expr(s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))")

  /** Exact Jaccard between the HASHED shingle sets (`hsh`, array<long>)
    * of candidate pairs: intersection/union on the (small) surviving
    * pair set only. Set identity over xxhash64'd shingles equals set
    * identity over the strings up to a 64-bit collision (P ≈ 1e-11 at
    * ~10⁵ distinct shingles) — and the q46/q47 oracles would catch one. */
  private def verifyExact(cand: DataFrame, sh: DataFrame): DataFrame = {
    val jac = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
      size(array_union(col("sh_a"), col("sh_b"))).cast("double")
    cand
      .join(sh.select(col("doc_id").as("doc_a"), col("hsh").as("sh_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("hsh").as("sh_b")), "doc_b")
      .withColumn("jaccard", jac)
  }

  /** Hash each shingle to a long INSIDE the projection that computes
    * the sketches, so the per-doc cache holds `(doc_id, hsh:
    * array<long>, <sketch cols>)` — ~8 B/shingle — instead of the
    * ~25 B/shingle string arrays. The r5 bench showed string-array
    * caches evicting under memory pressure and the verify stage
    * recomputing shingling from raw text (q56 8.7× regression). */
  private[graft] def hashedShingleCols: Column =
    expr("transform(shingles, s -> xxhash64(s))")

  /** MinHash + LSH banding over 3-gram shingles: k=32 signature,
    * 16 bands × 2 rows (candidate prob ≈ 1-(1-J²)¹⁶ — >0.999 for
    * J ≥ 0.6 pairs on this corpus, whose near-dups sit at J ≈ 0.99).
    * Bands are hashed to ONE long before the self-join, so the shuffle
    * carries (band, hash, doc_id) triples — never the signature arrays;
    * candidates re-join signatures for the estimate prefilter, then the
    * surviving pairs (only) are verified by EXACT Jaccard over their
    * shingle sets. The emitted result is therefore exact near-dup pairs
    * at J ≥ 0.6 — oracle-checked against a brute-force DuckDB
    * self-join; a missed LSH candidate would surface as a row-count
    * mismatch, so the driver gate doubles as a recall check.
    *
    * Docs with < 3 tokens have empty shingle sets and are excluded up
    * front (an empty set has no Jaccard neighbors; unfiltered, every
    * short-doc pair would band-collide on the empty signature). */
  /** The banded candidate join BEFORE dedup/prefilter/verify — the top
    * of q47's funnel, exposed so the scale probe (DedupProbe) can
    * measure candidate volume against true-pair volume directly. */
  private[graft] def bandedCandidatesPreDistinct(documents: DataFrame): DataFrame = {
    val k = 32; val bands = 16; val rows = k / bands
    val sigs = shingleArrayNonEmpty(documents)
      .select(col("doc_id"),
        TextFunctions.minhash_signature(col("shingles"), k, seed = 42L).as("sig"))
    val banded = sigs.select(
      col("doc_id"), posexplode(bandHashes(bands, rows)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
  }

  /** The per-doc SKETCH the whole near-dup family shares: one
    * projection derives BOTH downstream forms of the shingle set
    * (hashed set `hsh` for the exact verify, MinHash signature `sig`
    * for banding), so only long arrays are ever cached or persisted —
    * never the shingle strings. Docs with < 3 tokens (empty shingle
    * set) are excluded here, once, for every consumer. */
  private[graft] def shSketch(documents: DataFrame, k: Int = 32): DataFrame =
    shingleArray(parallelized(documents))
      // barrier: unwrapped, this filter pushes BELOW the repartition to
      // the scan with the whole shingling expression substituted in —
      // single-core re-derivation on a 1-split input (8.5 s vs 0.7 s)
      .filter(graft.functions.BarrierFunctions.no_pushdown(size(col("shingles")) > 0))
      .select(col("doc_id"), hashedShingleCols.as("hsh"),
        TextFunctions.minhash_signature(col("shingles"), k, seed = 42L).as("sig"))

  /** q47's pair chain, extracted for reuse (q89 clusters over it):
    * MinHash banding → estimate prefilter → exact-Jaccard verify at
    * `tau`, emitting (doc_a, doc_b, jaccard) over RAW documents (exact
    * duplicates included — they verify at J = 1.0). */
  private[graft] def exactNearDupPairs(documents: DataFrame, tau: Double): DataFrame =
    exactNearDupPairsFromSketch(shSketch(documents).cache(), tau)

  /** Same chain over an ALREADY-prepared (doc_id, hsh, sig) sketch —
    * lets [[PairGraph]] compute sketches once for both the pair chain
    * and the persisted sketch index. */
  private[graft] def exactNearDupPairsFromSketch(sh: DataFrame, tau: Double): DataFrame = {
    val bands = 16; val rows = 2
    val banded = sh.select(
      col("doc_id"), posexplode(bandHashes(bands, rows)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    val cand = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    prefilterAndVerify(cand, sh, tau)
  }

  /** Incremental pair discovery: band-join the DELTA docs' sketches
    * against the full sketch set (old ∪ delta) and verify — the
    * [[PairGraph.extend]] probe. Probe-side rows carry both
    * orientations of a pair (a delta doc's id may sort either side of
    * an old doc's), so candidates are canonicalized to (min, max)
    * before the distinct. Cost ∝ |delta| × collision rate, never
    * |corpus|². */
  private[graft] def deltaPairs(deltaSh: DataFrame, allSh: DataFrame,
                                tau: Double): DataFrame = {
    val bands = 16; val rows = 2
    def banded(s: DataFrame) = s.select(
      col("doc_id"), posexplode(bandHashes(bands, rows)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    val cand = banded(deltaSh)
      .select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(banded(allSh).select(col("band"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") =!= col("doc_b"))
      .select(least(col("doc_a"), col("doc_b")).as("doc_a"),
        greatest(col("doc_a"), col("doc_b")).as("doc_b"))
      .distinct()
    prefilterAndVerify(cand, allSh, tau)
  }

  /** Estimate prefilter + exact-Jaccard verify over candidate pairs,
    * with sketches supplied as (doc_id, hsh, sig). */
  private def prefilterAndVerify(cand: DataFrame, sh: DataFrame,
                                 tau: Double): DataFrame = {
    val k = 32
    val sigs = sh.select(col("doc_id"), col("sig"))
    val est = expr(s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST($k AS DOUBLE)")
    val prefiltered = cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .filter(est >= 0.3)
      .select("doc_a", "doc_b")
    verifyExact(prefiltered, sh.select("doc_id", "hsh"))
      .filter(col("jaccard") >= tau)
  }

  val q47DedupMinhash: QueryDef = sql(
    "q47_dedup_minhash",
    exactPairsSql(0.6,
      "SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM jp")) { (s, d) =>
    exactNearDupPairs(Tables.documents(s, d), 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup: 64-bit fingerprints over shingle sets, banded
    * into 8×8-bit chunks for candidate generation (pigeonhole: hamming
    * ≤ 7 ⇒ at least one chunk equal — J ≥ 0.6 pairs on this corpus
    * measure hamming ≤ 12 but always share a chunk, vs ~32 for random
    * pairs), prefiltered by Hamming ≤ 16, then verified by EXACT
    * Jaccard ≥ 0.6 over the candidate pairs' shingle sets — same
    * discipline as q47, different sketch. Oracle-checked against the
    * brute-force exact pairs, so the driver gate doubles as a recall
    * check for the banding. 8-bit chunks trade more raw candidates
    * (256 values/chunk) for the wider hamming guarantee — so the chunk
    * join runs over DISTINCT fingerprints with the hamming prefilter
    * on fingerprint pairs, and only surviving pairs expand to doc
    * pairs (see inline note). Short docs (< 3 tokens, empty shingle
    * set) are excluded up front — they'd otherwise all share the
    * all-zero fingerprint. */
  val q48DedupSimhash: QueryDef = sql(
    "q48_dedup_simhash",
    exactPairsSql(0.6, "SELECT doc_a, doc_b FROM jp")) { (s, d) =>
    val sh = shingleArrayNonEmpty(Tables.documents(s, d))
      .select(col("doc_id"), hashedShingleCols.as("hsh"),
        TextFunctions.simhash64(col("shingles")).as("simhash"))
      .cache()
    val fps = sh.select(col("doc_id"), col("simhash"))
    // The chunk join runs over DISTINCT fingerprints, never docs: each
    // 8-bit chunk has only 256 buckets, so doc-level chunk collisions
    // grow O(n_docs² / 256) — a corpus with duplicate clusters pays the
    // quadratic term on every copy (measured 10× probe: 39M candidate
    // rows at 50 k docs). Distinct fingerprints collapse exact copies
    // before the quadratic step (the q56 lesson at fingerprint level);
    // the hamming prefilter then runs on fingerprint PAIRS, and only
    // surviving pairs (output-sized) expand back to doc pairs.
    val fpd = fps.select("simhash").distinct()
    val chunks = fpd.select(
      col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 7), c -> (simhash >> (c * 8)) & 255)")))
      .select(col("simhash"), col("pos").as("chunk"), col("col").as("chunk_val"))
    val l = chunks.select(col("chunk"), col("chunk_val"), col("simhash").as("fp_a"))
    val r = chunks.select(col("chunk"), col("chunk_val"), col("simhash").as("fp_b"))
    // keep fp_a == fp_b: an identical-fingerprint GROUP still expands
    // to its C(group, 2) doc pairs below
    val fpPairs = l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("fp_a") <= col("fp_b"))
      .filter(expr("bit_count(fp_a ^ fp_b)") <= 16)
      .select("fp_a", "fp_b")
      .distinct()
    // expand both orientations so (doc_a < doc_b) pairs whose
    // fingerprints sort the other way are not dropped
    val expanded = fpPairs.unionByName(
      fpPairs.filter(col("fp_a") =!= col("fp_b"))
        .select(col("fp_b").as("fp_a"), col("fp_a").as("fp_b")))
    val cand = expanded
      .join(fps.select(col("simhash").as("fp_a"), col("doc_id").as("doc_a")), "fp_a")
      .join(fps.select(col("simhash").as("fp_b"), col("doc_id").as("doc_b")), "fp_b")
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
    verifyExact(cand, sh.select("doc_id", "hsh"))
      .filter(col("jaccard") >= 0.6)
      .select("doc_a", "doc_b")
      .orderBy("doc_a", "doc_b")
  }

  /** The composed 100 TB near-dup pipeline (SCALING.md "dedup-first"):
    * exact dedup FIRST collapses identical texts to one representative
    * per content group, THEN MinHash/LSH banding runs over the (much
    * smaller) representative set, and group sizes are carried through
    * so downstream removal can expand membership. This kills the
    * n²-in-cluster-size candidate blowup a viral document causes when
    * banding raw docs: c identical copies contribute C(c,2)·bands
    * candidate rows to one hot bucket; after the collapse they
    * contribute one row, and the near-dup join cost depends on the
    * number of DISTINCT contents only.
    *
    * Fully SQL-expressible (grouping + the exact-pair join), so the
    * whole composition is oracle-checked end-to-end. */
  val q56NearDupPipeline: QueryDef = sql(
    "q56_neardup_pipeline",
    s"""WITH g AS (
       |  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
       |  FROM documents GROUP BY text),
       |documents_r AS (
       |  SELECT g.doc_id, d.text
       |  FROM g JOIN documents d ON d.doc_id = g.doc_id),
       |${pairsCtes(0.6, "documents_r")}
       |SELECT jp.doc_a, jp.doc_b, ROUND(jp.jac, 4) AS jaccard,
       |       ga.n_copies AS n_copies_a, gb.n_copies AS n_copies_b
       |FROM jp
       |JOIN g ga ON ga.doc_id = jp.doc_a
       |JOIN g gb ON gb.doc_id = jp.doc_b
       |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
    nearDupPipeline(Tables.documents(s, d))
  }

  /** See [[q56NearDupPipeline]]. Exposed for ScaleProbe and streaming
    * composition: documents → exact collapse → banded near-dup over
    * representatives → (rep_a, rep_b, jaccard, group sizes). */
  def nearDupPipeline(documents: DataFrame, tau: Double = 0.6): DataFrame = {
    val k = 32; val bands = 16; val rows = k / bands
    // exact collapse: one representative (min doc_id) per distinct
    // content; hash-groupBy on sha256 so the shuffle carries 32 B/doc
    val reps = documents
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("n_copies"),
        first("text").as("text"))
      .drop("content_hash")
    val sh = shingleArrayNonEmpty(reps)
      .select(col("doc_id"), hashedShingleCols.as("hsh"),
        TextFunctions.minhash_signature(col("shingles"), k, seed = 42L).as("sig"),
        col("n_copies"))
      .cache()
    val sigs = sh.select(col("doc_id"), col("sig"))
    val banded = sigs.select(
      col("doc_id"),
      posexplode(bandHashes(bands, rows)))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    val cand = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
      .join(banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b")),
        Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    verifyExact(cand, sh.select("doc_id", "hsh"))
      .filter(col("jaccard") >= tau)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .join(sh.select(col("doc_id").as("doc_a"), col("n_copies").as("n_copies_a")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("n_copies").as("n_copies_b")), "doc_b")
      .select("doc_a", "doc_b", "jaccard", "n_copies_a", "n_copies_b")
      .orderBy("doc_a", "doc_b")
  }

  /** Connected components over an undirected pair graph by iterative
    * MIN-label propagation: every node starts labeled with itself;
    * each round, labels flow across edges and each node keeps the
    * minimum seen; converges in O(component diameter) rounds.
    * Duplicate-cluster graphs are near-cliques (diameter 1-2), so 2-3
    * joins settle even a 100 TB corpus — this is the GLOBAL step that
    * turns pairwise near-dup verdicts into cluster-aware removal
    * (greedy pair-dropping can disagree with transitive closure on
    * chains; components never do). Each round is one shuffle join +
    * one aggregate; `localCheckpoint` truncates the growing lineage. */
  def clusterAssignments(pairs: DataFrame, maxIters: Int = 20,
                         maxDriverEdges: Int = 500000): DataFrame = {
    // Adaptive solve (the PairGraph.updateClusters pattern): a
    // near-dup pair graph is output-sized — orders of magnitude
    // smaller than the corpus that produced it — and the iterative
    // propagation below pays ~2 fixed-cost jobs per round plus
    // checkpoints. Under the edge budget (≈24 MB of collected rows) a
    // bounded collect + driver union-find settles the components
    // exactly, in one job; past it, the distributed propagation takes
    // over unchanged. Both paths label each component by its min
    // member, so the choice is invisible to consumers (and the
    // PairGraphSpec bridge test pins their agreement).
    val spark = pairs.sparkSession
    val head = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .limit(maxDriverEdges + 1).collect()
    if (head.length <= maxDriverEdges) {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      head.foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        if (ra != rb) parent(if (ra < rb) rb else ra) = math.min(ra, rb)
      }
      import spark.implicits._
      val nodes = head.flatMap(r => Seq(r.getLong(0), r.getLong(1))).distinct
      return nodes.map(x => (x, find(x))).toSeq.toDF("doc_id", "label")
    }
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("label", col("doc_id")).localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIters) {
      val propagated = edges.join(labels, edges("src") === labels("doc_id"))
        .select(col("dst").as("doc_id"), col("label"))
      // convergence check FOLDED into the propagation pass: each doc's
      // previous label rides the union (null on propagated rows; every
      // doc appears exactly once in `labels`, so min(__old) recovers
      // it), and the min-label aggregate emits a per-doc changed flag.
      // Reading the flag back is a narrow scan of the just-checkpointed
      // blocks — not the extra join + shuffle + count per round the
      // check used to cost.
      val next = labels.withColumn("__old", col("label"))
        .unionByName(propagated.withColumn("__old", lit(null).cast("long")))
        .groupBy("doc_id")
        .agg(min("label").as("label"), min("__old").as("__old"))
        .withColumn("__chg", when(col("label") < col("__old"), 1L).otherwise(0L))
        // LAZY checkpoint: the changed-flag read below is the action
        // that materializes it — one job per round, not two (eager
        // checkpoint + flag read), while still truncating lineage for
        // the next round
        .localCheckpoint(eager = false)
      // coalesce: an EMPTY edge set (legal for an incremental update
      // whose delta has no pairs) sums to null, not 0
      changed = next.agg(coalesce(sum("__chg"), lit(0L))).head().getLong(0)
      labels = next.select("doc_id", "label")
      iter += 1
    }
    labels
  }

  /** Near-dup CLUSTERS: connected components over the exact-verified
    * pair graph (q47's pairs, exact copies included at J = 1.0), each
    * clustered doc labeled with its component's min doc_id and the
    * component size. The oracle computes the same closure with a
    * recursive CTE — an independent transitive-closure algorithm, so
    * the hash gate checks the component structure itself, not just the
    * pair list. */
  val q89DedupClusters: QueryDef = sql(
    "q89_dedup_clusters",
    s"""WITH RECURSIVE ${pairsCtes(0.6, "documents")},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT doc_id, cluster_id,
       |       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
       |FROM comp
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    // consumes the materialized CLUSTER table (PairGraph.clusters) —
    // banding AND label propagation run once per corpus; serving is a
    // gated read + one window count
    PairGraph.clusters(s, Tables.documents(s, d), d, 0.6)
      .select(col("doc_id"), col("label").as("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")).cast("long"))
      .orderBy("doc_id")
  }

  /** The dedup REMOVAL PLAN — the action a pipeline actually executes
    * after clustering: every document mapped to keep/drop with its
    * cluster representative (component min doc_id) attached, so the
    * drop is auditable and reversible. Composes q47's exact-verified
    * pairs + q89's connected components + a left join back to the full
    * corpus (docs in no cluster keep themselves). Cluster-aware removal
    * (keep one per COMPONENT) is the correct policy where greedy
    * pair-dropping can over- or under-delete on chains. The oracle
    * recomputes the same plan over its own recursive-CTE closure. */
  val q91DedupRemovalPlan: QueryDef = sql(
    "q91_dedup_removal_plan",
    s"""WITH RECURSIVE ${pairsCtes(0.6, "documents")},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT d.doc_id,
       |       CASE WHEN c.cluster_id IS NULL OR c.cluster_id = d.doc_id
       |            THEN 'keep' ELSE 'drop_near_dup' END AS action,
       |       COALESCE(c.cluster_id, d.doc_id) AS representative
       |FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id")
    val labels = PairGraph.clusters(s, Tables.documents(s, d), d, 0.6)
      .withColumnRenamed("label", "cluster_id")
    docs.join(labels, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        when(col("cluster_id").isNull || col("cluster_id") === col("doc_id"), "keep")
          .otherwise("drop_near_dup").as("action"),
        coalesce(col("cluster_id"), col("doc_id")).as("representative"))
      .orderBy("doc_id")
  }

  /** The materialize-once pair graph itself, as a declared capability:
    * computes [[exactNearDupPairs]] into an UpsertStore table keyed
    * (doc_a, doc_b) — or reuses it when the corpus fingerprint matches
    * — and emits the STORED pairs. Same oracle as q47, so the driver
    * hash-checks that the persistence roundtrip (atomic replace +
    * manifest read) is invisible to consumers. q89/q91 consume the same
    * table; at 100 TB this is the difference between one banding pass
    * per corpus and one per downstream query. */
  val q93PairGraphStore: QueryDef = sql(
    "q93_pair_graph_store",
    exactPairsSql(0.6,
      "SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM jp")) { (s, d) =>
    PairGraph.pairGraph(s, Tables.documents(s, d), d, 0.6)
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** INCREMENTAL pair-graph maintenance, declared end-to-end: build
    * the graph over the first 80% of the corpus (by doc_id), fold the
    * remaining 20% in with [[PairGraph.extend]] (delta-sized band
    * probe against the persisted sketch index — the old corpus is
    * never re-scanned), then serve the grown corpus through the
    * fingerprint gate. The oracle is the FROM-SCRATCH brute-force pair
    * set over the full corpus, so the driver's hash compare proves
    * extend ≡ recompute — the invariant a 100 TB ingest pipeline
    * relies on every arrival batch. A fresh store per run keeps the
    * query self-contained (and the bench number honest: it measures
    * build + extend + serve, not a cache). */
  /** One scan computes the 80% cut AND the full-corpus fingerprint;
    * one more fingerprints the delta; the base fingerprint follows by
    * XOR associativity (full = base ⊕ delta) — the lifecycle then
    * passes all three down instead of paying a corpus scan per stage
    * (5 scans → 2, VERDICT r10 #1b). */
  private[operators] def lifecycleSplit(docs: DataFrame)
      : (Long, (Long, Long), (Long, Long), (Long, Long)) = {
    val row = docs.agg(
      expr("percentile(doc_id, 0.8)").as("cut"),
      count(lit(1)).as("n"),
      coalesce(expr("bit_xor(xxhash64(doc_id, text))"), lit(0L)).as("h")).head()
    val cut = row.getDouble(0).toLong
    val full = (row.getLong(1), row.getLong(2))
    val delta = PairGraph.corpusFingerprint(docs.filter(col("doc_id") > cut))
    (cut, (full._1 - delta._1, full._2 ^ delta._2), delta, full)
  }

  val q94PairGraphIncremental: QueryDef = sql(
    "q94_pair_graph_incremental",
    exactPairsSql(0.6,
      "SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM jp")) { (s, d) =>
    val docs = Tables.documents(s, d)
    val store = graft.Scratch.dir("graft_pair_inc") + "/store"
    val (cut, fpBase, fpDelta, fpFull) = lifecycleSplit(docs)
    PairGraph.pairGraph(s, docs.filter(col("doc_id") <= cut), d, 0.6, Some(store),
      Some(fpBase))
    PairGraph.extend(s, docs.filter(col("doc_id") > cut), d, 0.6, Some(store),
      deltaFp = Some(fpDelta))
    PairGraph.pairGraph(s, docs, d, 0.6, Some(store), Some(fpFull))
      .select(col("doc_a"), col("doc_b"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("doc_a", "doc_b")
  }

  /** INCREMENTAL cluster maintenance, declared end-to-end: build pair
    * graph + clusters over the first 80% of the corpus, fold the
    * remaining 20% in with [[PairGraph.extend]] + [[PairGraph
    * .updateClusters]] (affected components only — the old corpus is
    * never re-propagated), then serve through the fingerprint gate.
    * The oracle is q89's from-scratch recursive-CTE closure over the
    * FULL corpus, so the driver's hash compare proves incremental
    * cluster update ≡ recompute — the invariant that lets a continuous
    * ingest pipeline keep dedup clusters current without touching 100
    * TB of history per batch. Fresh store per run (honest bench: build
    * + extend + update + serve). */
  val q95ClusterIncremental: QueryDef = sql(
    "q95_cluster_incremental",
    s"""WITH RECURSIVE ${pairsCtes(0.6, "documents")},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src)
       |SELECT doc_id, cluster_id,
       |       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members
       |FROM comp
       |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val store = graft.Scratch.dir("graft_clust_inc") + "/store"
    val (cut, fpBase, fpDelta, fpFull) = lifecycleSplit(docs)
    PairGraph.clusters(s, docs.filter(col("doc_id") <= cut), d, 0.6, Some(store),
      Some(fpBase))
    PairGraph.extend(s, docs.filter(col("doc_id") > cut), d, 0.6, Some(store),
      deltaFp = Some(fpDelta))
    PairGraph.updateClusters(s, docs.filter(col("doc_id") > cut), d, 0.6, Some(store),
      deltaFp = Some(fpDelta))
    PairGraph.clusters(s, docs, d, 0.6, Some(store), Some(fpFull))
      .select(col("doc_id"), col("label").as("cluster_id"))
      .withColumn("n_members",
        count(lit(1)).over(Window.partitionBy("cluster_id")).cast("long"))
      .orderBy("doc_id")
  }

  /** The CATALOG serve path, declared end-to-end (round 8): the pair
    * graph registered as a `graft.` catalog table
    * ([[PairGraph.registerCatalog]] — store path becomes table
    * identity) and read back through plain SQL, with the same
    * from-scratch oracle as q47/q93 — so the driver's hash compare
    * proves the DSv2 read path (catalog → V1Scan → last-writer-wins
    * merge) serves exactly the graph the engine computed. Warehouse
    * lives in per-JVM scratch (self-cleaning); the table name is keyed
    * by the corpus dir so scale factors never collide. */
  val q99CatalogPairGraph: QueryDef = sql(
    "q99_catalog_pair_graph",
    exactPairsSql(0.6,
      "SELECT doc_a, doc_b, ROUND(jac, 4) AS jaccard FROM jp")) { (s, d) =>
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    val table = s"pg_${PairGraph.dirKey64(d)}"
    PairGraph.registerCatalog(s, table, Tables.documents(s, d), d, 0.6)
    s.sql(s"SELECT doc_a, doc_b, ROUND(jaccard, 4) AS jaccard FROM graft.`$table` " +
      "ORDER BY doc_a, doc_b")
  }

  /** Exact duplicate-SPAN detection (the token-level complement of
    * whole-document dedup — the "exact substring deduplication" of
    * Lee et al. 2022, at word granularity): any 20-token window whose
    * text occurs at ≥ 2 positions anywhere in the corpus (other docs
    * OR a repeat inside the same doc) is a duplicated span; per doc,
    * overlapping/adjacent duplicated windows are merged into maximal
    * intervals and the output reports how much of the doc is covered
    * by them — the removal-candidate map a span-level deduper feeds on.
    *
    * Scale shape: windows leave the row as 8-byte xxhash64 values
    * (never the ~120-byte window text); the global duplicate test is
    * one groupBy on those longs, and the position join shuffles only
    * hashes+positions. Both sides of the join come out of the same
    * hash partitioning on `g`, so AQE reuses the exchange. The
    * interval merge is a per-doc window function — bounded by a
    * single document's token count (the q36 chunking bound), never a
    * corpus-wide sort. A 64-bit collision would make two distinct
    * spans "duplicates"; the exact oracle (which compares the window
    * STRINGS) is the gate that would catch it. */
  val q117DuplicateSpans: QueryDef = sql(
    "q117_duplicate_spans",
    """WITH t AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS toks
      |  FROM documents
      |  WHERE len(string_split_regex(lower(text), '\s+')) >= 20),
      |sp AS (
      |  SELECT doc_id, len(toks) AS n, i,
      |         array_to_string(list_slice(toks, i, i + 19), ' ') AS g
      |  FROM t, unnest(range(1, len(toks) - 18)) AS u(i)),
      |dups AS (SELECT g FROM sp GROUP BY g HAVING COUNT(*) >= 2),
      |hits AS (SELECT sp.doc_id, sp.n, sp.i FROM sp JOIN dups USING (g)),
      |isl AS (
      |  SELECT doc_id, n, i,
      |         CASE WHEN i > COALESCE(MAX(i + 19) OVER (
      |                PARTITION BY doc_id ORDER BY i
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -100) + 1
      |              THEN 1 ELSE 0 END AS new_isl
      |  FROM hits),
      |isl2 AS (SELECT doc_id, n, i,
      |                SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY i) AS island
      |         FROM isl),
      |merged AS (SELECT doc_id, island, MAX(n) AS n, MIN(i) AS s, MAX(i) + 19 AS e
      |           FROM isl2 GROUP BY 1, 2)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
      |       CAST(SUM(e - s + 1) AS BIGINT) AS dup_tokens,
      |       ROUND(SUM(e - s + 1) * 1.0 / MAX(n), 4) AS dup_frac
      |FROM merged GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val W = 20
    val docs = Tables.documents(s, d)
      .withColumn("toks", TextAnalysis.tokens(col("text")))
      .filter(size(col("toks")) >= W)
    // hash each window BEFORE it leaves the row (q61's trick): the
    // duplicate groupBy and the position join carry 8 B per window
    val spans = docs.select(
      col("doc_id"), size(col("toks")).as("n"),
      explode(expr(
        s"transform(sequence(1, size(toks) - ${W - 1}), " +
          s"i -> struct(i AS i, xxhash64(concat_ws(' ', slice(toks, i, $W))) AS g))")).as("sp"))
      .select(col("doc_id"), col("n"), col("sp.i").as("i"), col("sp.g").as("g"))
    val dup = spans.groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 2).select("g")
    val hits = spans.join(dup, Seq("g"))
    val covered = Window.partitionBy("doc_id").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, -1)
    val islands = hits
      .withColumn("prev_end", max(col("i") + lit(W - 1)).over(covered))
      .withColumn("new_isl",
        when(col("i") > coalesce(col("prev_end"), lit(-100)) + 1, 1).otherwise(0))
      .withColumn("island",
        sum(col("new_isl")).over(Window.partitionBy("doc_id").orderBy("i")))
    val merged = islands.groupBy(col("doc_id"), col("island"))
      .agg(max(col("n")).as("n"), min(col("i")).as("s"),
        (max(col("i")) + lit(W - 1)).as("e"))
    merged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_dup_spans"),
        sum(col("e") - col("s") + 1).cast("long").as("dup_tokens"),
        round(sum(col("e") - col("s") + 1) / max(col("n")), 4).as("dup_frac"))
      .orderBy("doc_id")
  }

  /** Incremental exact-dedup INGEST GATE ([[DedupGate]]): the corpus
    * is ingested, then a deterministic "re-crawl" (every third document
    * under a fresh id — the dup-heavy batch every production crawler
    * eventually delivers) is adjudicated against the persisted
    * seen-table + bloom. Decisions are global min-doc_id-wins; the
    * oracle recomputes them from scratch with a window over the SAME
    * unioned relation, so the driver's hash compare proves
    * gate ≡ recompute — including that every re-crawled doc resolves
    * to its ORIGINAL id as canonical (the cross-batch case that is the
    * gate's entire point). Fresh scratch store per run (honest bench:
    * build + bloom + gate + fold-in). */
  val q121DedupIngestGate: QueryDef = sql(
    "q121_dedup_ingest_gate",
    """WITH all_docs AS (
      |  SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0)
      |SELECT doc_id,
      |       MIN(doc_id) OVER (PARTITION BY text) AS first_doc_id,
      |       CASE WHEN doc_id = MIN(doc_id) OVER (PARTITION BY text)
      |            THEN 'new' ELSE 'duplicate' END AS status
      |FROM all_docs ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val recrawl = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val path = graft.Scratch.dir("graft_dedup_gate") + "/gate"
    val base = DedupGate.ensure(s, docs, path)
    val late = DedupGate.gate(s, recrawl, path)
    base.union(late).orderBy("doc_id")
  }

  /** TRIANGLE COUNTING over the verified near-dup pair graph — the
    * cluster-cohesion audit: a doc in many triangles sits in a dense
    * duplicate clique (safe to collapse aggressively); a bridge doc
    * with pairs but no triangles flags a chain the transitive closure
    * glued together (q89's known failure mode for border-τ pairs).
    * Edges come from the MATERIALIZED pair graph ([[PairGraph
    * .pairGraph]] — gate-served, so repeat audits never re-mine
    * pairs); the count is the classic two-join wedge closure on the
    * (a < b)-oriented edge list, exact integers end-to-end (no float
    * in the hash compare). Scale: wedge fan-out is Σ deg² on the
    * JOIN-keyed vertex — for a hub-skewed graph orient edges
    * low-degree → high-degree (bounds wedges by arboricity); this
    * graph's components are τ=0.6-verified near-dup cliques, whose
    * degree is cluster-bounded. */
  val q128TriangleCount: QueryDef = sql(
    "q128_triangle_count",
    s"""WITH ${pairsCtes(0.6, "documents")},
       |e AS (SELECT doc_a AS a, doc_b AS b FROM jp),
       |tri AS (
       |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
       |  FROM e e1
       |  JOIN e e2 ON e1.b = e2.a
       |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
       |m AS (SELECT x AS doc_id FROM tri UNION ALL
       |      SELECT y FROM tri UNION ALL
       |      SELECT z FROM tri)
       |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
       |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, d) =>
    val e = PairGraph.pairGraph(s, Tables.documents(s, d), d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val wedges = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y"))
    val tri = wedges.join(
      e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"), "left_semi")
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("doc_id"))
      .groupBy("doc_id").agg(count(lit(1)).as("n_triangles"))
      .orderBy("doc_id")
  }

  /** q129 oracle: 3 PageRank iterations unrolled as CTEs — generated
    * by the same loop shape as the engine (the q115 rule: generator
    * and engine can't drift). */
  private def pageRankSql(iters: Int): String = {
    def step(prev: String, out: String) =
      s"""$out AS (
         |  SELECT adj.dst AS v,
         |         0.15 / MAX(nn.n) + 0.85 * SUM($prev.r / deg.cnt) AS r
         |  FROM adj JOIN $prev ON adj.src = $prev.v
         |           JOIN deg ON adj.src = deg.src, nn
         |  GROUP BY adj.dst)""".stripMargin
    val chain = (1 to iters).map(i => step(s"r${i - 1}", s"r$i")).mkString(",\n")
    s"""WITH ${pairsCtes(0.6, "documents")},
       |e AS (SELECT doc_a AS a, doc_b AS b FROM jp),
       |adj AS (SELECT a AS src, b AS dst FROM e UNION ALL SELECT b, a FROM e),
       |deg AS (SELECT src, COUNT(*) AS cnt FROM adj GROUP BY src),
       |nn AS (SELECT COUNT(*) AS n FROM deg),
       |r0 AS (SELECT src AS v, 1.0 / nn.n AS r FROM deg, nn),
       |$chain
       |SELECT v AS doc_id, ROUND(r, 6) AS rank
       |FROM r$iters ORDER BY doc_id""".stripMargin
  }

  /** PAGERANK over the near-dup pair graph (3 iterations, d = 0.85) —
    * centrality-based REPRESENTATIVE selection: within a duplicate
    * cluster the highest-rank doc is the one most broadly similar to
    * the rest, a better canonical than q91's min-id policy when
    * near-dup chains glue genuinely-different revisions together.
    * Each iteration is one adjacency join + one vertex-keyed
    * aggregate — the canonical iterative-graph shape on Spark
    * (shuffle carries (dst, contribution) pairs, never adjacency
    * lists); ranks stay exact doubles through the loop and round to
    * 6 dp only at the output (the q115 discipline; per-vertex sums
    * are cluster-bounded, so cross-engine addition-order jitter is
    * ulp-scale against a 1e-6 grid). Edges gate-serve from the
    * materialized pair graph like q128. */
  val q129PageRank: QueryDef = sql(
    "q129_pagerank", pageRankSql(3)) { (s, d) =>
    val e = PairGraph.pairGraph(s, Tables.documents(s, d), d)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    val adj = e.select(col("a").as("src"), col("b").as("dst"))
      .union(e.select(col("b").as("src"), col("a").as("dst")))
    val deg = adj.groupBy("src").agg(count(lit(1)).as("cnt"))
    val n = deg.count() // node count — metadata-scale driver scalar
    var r = deg.select(col("src").as("v"), (lit(1.0) / n).as("r"))
    for (_ <- 1 to 3) {
      r = adj
        .join(r.withColumnRenamed("v", "src"), "src")
        .join(deg, "src")
        .select(col("dst").as("v"), (col("r") / col("cnt")).as("c"))
        .groupBy("v")
        .agg((lit(0.15) / n + lit(0.85) * sum(col("c"))).as("r"))
    }
    r.select(col("v").as("doc_id"), round(col("r"), 6).as("rank"))
      .orderBy("doc_id")
  }

  /** LEAKAGE-FREE train/val/test split: the q59 deterministic hash
    * split drawn per near-dup CLUSTER instead of per document, so two
    * near-duplicates can never straddle train and test (the eval-
    * contamination failure mode a per-doc split bakes in: the model is
    * scored on a paraphrase of its own training data). Composes the
    * materialized cluster table (banding + label propagation run once,
    * gated reads after — q89's serving path) with a left join back to
    * the corpus (unclustered docs are their own singleton cluster) and
    * the multiplicative-hash bucket on the CLUSTER id — every member
    * inherits the same bucket by construction, which the oracle's
    * recursive-CTE closure re-derives and the hash compare pins.
    * Domain guard as in q141: the 28-bit mask keeps the multiply
    * inside exact-integer range on both engines. Scale shape: the
    * split itself adds one label join + a per-row hash to the cluster
    * pipeline — nothing new shuffles. */
  val q154ClusterSplit: QueryDef = sql(
    "q154_cluster_split",
    s"""WITH RECURSIVE ${pairsCtes(0.6, "documents")},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src),
       |assign AS (
       |  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id)
       |SELECT doc_id, cluster_id,
       |       CASE WHEN (((cluster_id % 268435456) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
       |            WHEN (((cluster_id % 268435456) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM assign ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    val clusters = PairGraph.clusters(s, docs, d, 0.6)
      .select(col("doc_id"), col("label").as("cluster_id"))
    val assigned = docs.select("doc_id").join(clusters, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    val b = ((col("cluster_id") % lit(268435456L)) * lit(2654435761L)) %
      lit(4294967296L) % 100
    assigned
      .withColumn("split",
        when(b < 80, "train").when(b < 90, "val").otherwise("test"))
      .select("doc_id", "cluster_id", "split")
      .orderBy("doc_id")
  }

  /** THE TRAINING-DATA MANIFEST — the end-to-end curation decision for
    * every document in ONE declarative plan, composing the pipeline's
    * stages in their production order: exact dedup (q45's group-min
    * over 32 B content digests) → quality heuristics (q70's verdicts)
    * → near-dup cluster policy (keep the component representative,
    * q91's rule, off the materialized cluster table) → leakage-free
    * split (q154's cluster-keyed hash) for the survivors. Every doc
    * gets (keep, reason, split) where reason names the FIRST stage
    * that dropped it — the auditable artifact an actual 100 TB
    * curation run hands downstream, and exactly what a reference user
    * gluing these stages by hand would script. Near-dup policy: the
    * kept representative is the lowest-id cluster member that survives
    * the exact-dup and quality stages (NOT the raw min id), so a
    * cluster whose min-id copy is dirty still retains its best clean
    * copy. Scale shape: one digest groupBy (32 B keys), one quality
    * scan, the gated cluster read, doc-keyed joins, and one
    * cluster-keyed rep aggregate (cluster-table-sized) — every term
    * already priced by its standalone query; Catalyst fuses the
    * scans. */
  /** The manifest contract's DuckDB replay — shared verbatim by q156
    * (one-shot), q159 (streamed lifecycle), and composed into q190's
    * crawl-day oracle: all must hash-match the same from-scratch
    * recursive-CTE computation. [[manifestCtes]] is the WITH body
    * through `reasons` so composers can stack further CTEs on top. */
  private[operators] def manifestCtesFor(table: String, p: String = ""): String =
    s"""${pairsCtes(0.6, table, p)},
       |${p}edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM ${p}jp
       |  UNION ALL SELECT doc_b, doc_a FROM ${p}jp),
       |${p}reach AS (
       |  SELECT src, dst FROM ${p}edges
       |  UNION
       |  SELECT r.src, e.dst FROM ${p}reach r JOIN ${p}edges e ON r.dst = e.src),
       |${p}comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM ${p}reach GROUP BY src),
       |${p}firsts AS (
       |  SELECT sha256(text) AS h, MIN(doc_id) AS keep_doc
       |  FROM $table GROUP BY 1),
       |${p}m AS (
       |  SELECT doc_id,
       |         len(string_split_regex(lower(text), '\\s+')) AS n_tokens,
       |         CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS distinct_ratio,
       |         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |                              x -> x IN ('the', 'a'))) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS stopword_ratio,
       |         CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS avg_token_len
       |  FROM $table),
       |${p}staged AS (
       |  SELECT d.doc_id,
       |         (d.doc_id <> f.keep_doc) AS is_exact_dup,
       |         CASE WHEN m.n_tokens < 10 THEN 'too_short'
       |              WHEN m.distinct_ratio < 0.3 THEN 'low_diversity'
       |              WHEN m.stopword_ratio > 0.5 THEN 'stopword_heavy'
       |              WHEN m.avg_token_len < 2.0 OR m.avg_token_len > 12.0 THEN 'token_len_outlier'
       |              ELSE 'keep' END AS verdict,
       |         COALESCE(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM $table d
       |  JOIN ${p}firsts f ON sha256(d.text) = f.h
       |  JOIN ${p}m m ON d.doc_id = m.doc_id
       |  LEFT JOIN ${p}comp c ON d.doc_id = c.doc_id),
       |${p}reps AS (
       |  SELECT cluster_id, MIN(doc_id) AS rep FROM ${p}staged
       |  WHERE NOT is_exact_dup AND verdict = 'keep' GROUP BY cluster_id),
       |${p}reasons AS (
       |  SELECT s.doc_id, s.cluster_id,
       |         CASE WHEN s.is_exact_dup THEN 'exact_dup'
       |              WHEN s.verdict <> 'keep' THEN s.verdict
       |              WHEN s.doc_id <> r.rep THEN 'near_dup'
       |              ELSE 'kept' END AS reason
       |  FROM ${p}staged s LEFT JOIN ${p}reps r ON s.cluster_id = r.cluster_id)"""

  /** The unprefixed, documents-table instance q156/q159/q190 compose. */
  private[operators] val manifestCtes: String = manifestCtesFor("documents").stripMargin

  private val manifestSql: String =
    s"""WITH RECURSIVE $manifestCtes
       |SELECT doc_id, (reason = 'kept') AS keep, reason,
       |       CASE WHEN reason <> 'kept' THEN 'none'
       |            WHEN (((cluster_id % 268435456) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
       |            WHEN (((cluster_id % 268435456) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM reasons ORDER BY doc_id""".stripMargin

  val q156TrainingManifest: QueryDef = sql(
    "q156_training_manifest", manifestSql) { (s, d) =>
    val docs = Tables.documents(s, d)
    val firsts = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_doc"))
    val clusters = PairGraph.clusters(s, docs, d, 0.6)
      .select(col("doc_id"), col("label").as("cluster_id"))
    val facts = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(firsts, "h")
      .join(qualityVerdicts(docs), Seq("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("doc_id") =!= col("keep_doc")).as("is_exact_dup"),
        col("verdict"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    manifestRows(facts)
      .select("doc_id", "keep", "reason", "split")
      .orderBy("doc_id")
  }

  /** q156's per-doc quality verdict — ONE definition shared by the
    * batch manifest and the streaming
    * [[graft.streaming.ManifestMaintainer]]; a drifting copy would
    * silently desync streamed vs one-shot curation decisions. Takes
    * (doc_id, text), returns (doc_id, verdict). */
  private[graft] def qualityVerdicts(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") / size(col("toks")))
          .as("distinct_ratio"),
        (size(filter(col("toks"), t => t.isin("the", "a"))).cast("double") /
          size(col("toks"))).as("stopword_ratio"),
        (length(expr("replace(text, ' ', '')")).cast("double") / size(col("toks")))
          .as("avg_token_len"))
      .select(col("doc_id"),
        when(col("n_tokens") < 10, "too_short")
          .when(col("distinct_ratio") < 0.3, "low_diversity")
          .when(col("stopword_ratio") > 0.5, "stopword_heavy")
          .when(col("avg_token_len") < 2.0 || col("avg_token_len") > 12.0,
            "token_len_outlier")
          .otherwise("keep").as("verdict"))

  /** q156's manifest derivation from per-doc FACTS
    * (doc_id, is_exact_dup, verdict, cluster_id) — stage priority
    * exact-dup > quality > near-dup, representative promotion (the
    * lowest-id member surviving both earlier stages keeps), split =
    * Knuth-hash of the CLUSTER id (q154's cluster-atomic rule).
    * Correct over any facts set that contains WHOLE clusters (the rep
    * aggregate sees every member) — the property the streaming
    * maintainer's affected-cluster refresh relies on. Returns
    * (doc_id, cluster_id, keep, reason, split). */
  private[graft] def manifestRows(facts: DataFrame): DataFrame = {
    val reps = facts
      .filter(!col("is_exact_dup") && col("verdict") === "keep")
      .groupBy("cluster_id").agg(min("doc_id").as("rep"))
    val reasoned = facts.join(reps, Seq("cluster_id"), "left")
      .withColumn("reason",
        when(col("is_exact_dup"), "exact_dup")
          .when(col("verdict") =!= "keep", col("verdict"))
          .when(col("doc_id") =!= col("rep"), "near_dup")
          .otherwise("kept"))
    val bucket = ((col("cluster_id") % lit(268435456L)) * lit(2654435761L)) %
      lit(4294967296L) % 100
    reasoned.select(
      col("doc_id"), col("cluster_id"),
      (col("reason") === "kept").as("keep"),
      col("reason"),
      when(col("reason") =!= "kept", "none")
        .when(bucket < 80, "train").when(bucket < 90, "val")
        .otherwise("test").as("split"))
  }

  /** THE MANIFEST WITH A MODEL-SCORED QUALITY STAGE — q156 with the
    * [[DocScore.DocScorer]] seam swapped in for the rule stack
    * (VERDICT r14 #6's "alternative verdict column", composed
    * end-to-end): exact dedup → the per-partition-bound scorer's
    * keep/drop (drop relabeled `low_quality` — one reason, the
    * classifier shape, vs q70's four attributed rules) → near-dup rep
    * promotion → cluster-keyed split. Everything downstream of the
    * verdict column ([[manifestRows]]) is shared code, which is the
    * point: the quality stage is a SEAM, and the oracle re-proves the
    * whole composed artifact when a different scorer sits in it.
    * Scale shape is q156's — the scorer adds one shuffle-free
    * mapPartitions pass. */
  val q185ManifestScored: QueryDef = sql(
    "q185_manifest_scored",
    s"""WITH RECURSIVE ${pairsCtes(0.6, "documents")},
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jp
       |  UNION ALL SELECT doc_b, doc_a FROM jp),
       |reach AS (
       |  SELECT src, dst FROM edges
       |  UNION
       |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
       |comp AS (
       |  SELECT src AS doc_id, LEAST(src, MIN(dst)) AS cluster_id
       |  FROM reach GROUP BY src),
       |firsts AS (
       |  SELECT sha256(text) AS h, MIN(doc_id) AS keep_doc
       |  FROM documents GROUP BY 1),
       |m AS (
       |  SELECT doc_id,
       |         len(string_split_regex(lower(text), '\\s+')) AS nt,
       |         CAST(len(list_distinct(string_split_regex(lower(text), '\\s+'))) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS dr,
       |         CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
       |                              x -> x IN ('the', 'a'))) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS sr,
       |         CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
       |           / len(string_split_regex(lower(text), '\\s+')) AS atl
       |  FROM documents),
       |staged AS (
       |  SELECT d.doc_id,
       |         (d.doc_id <> f.keep_doc) AS is_exact_dup,
       |         CASE WHEN 4.0 * m.dr - 6.0 * m.sr + 0.01 * least(m.nt, 100)
       |                   - 0.2 * m.atl - 1.2 >= 0
       |              THEN 'keep' ELSE 'low_quality' END AS verdict,
       |         COALESCE(c.cluster_id, d.doc_id) AS cluster_id
       |  FROM documents d
       |  JOIN firsts f ON sha256(d.text) = f.h
       |  JOIN m ON d.doc_id = m.doc_id
       |  LEFT JOIN comp c ON d.doc_id = c.doc_id),
       |reps AS (
       |  SELECT cluster_id, MIN(doc_id) AS rep FROM staged
       |  WHERE NOT is_exact_dup AND verdict = 'keep' GROUP BY cluster_id),
       |reasons AS (
       |  SELECT s.doc_id, s.cluster_id,
       |         CASE WHEN s.is_exact_dup THEN 'exact_dup'
       |              WHEN s.verdict <> 'keep' THEN s.verdict
       |              WHEN s.doc_id <> r.rep THEN 'near_dup'
       |              ELSE 'kept' END AS reason
       |  FROM staged s LEFT JOIN reps r ON s.cluster_id = r.cluster_id)
       |SELECT doc_id, (reason = 'kept') AS keep, reason,
       |       CASE WHEN reason <> 'kept' THEN 'none'
       |            WHEN (((cluster_id % 268435456) * 2654435761) % 4294967296) % 100 < 80 THEN 'train'
       |            WHEN (((cluster_id % 268435456) * 2654435761) % 4294967296) % 100 < 90 THEN 'val'
       |            ELSE 'test' END AS split
       |FROM reasons ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
    val firsts = docs.groupBy(sha2(col("text"), 256).as("h"))
      .agg(min("doc_id").as("keep_doc"))
    val clusters = PairGraph.clusters(s, docs, d, 0.6)
      .select(col("doc_id"), col("label").as("cluster_id"))
    val verdicts = DocScore.scoreDocs(
        parallelized(docs.select("doc_id", "text")).as[(Long, String)],
        DocScore.HeuristicBlendScorer)
      .select(col("doc_id"),
        when(col("verdict") === "keep", "keep")
          .otherwise("low_quality").as("verdict"))
    val facts = docs.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(firsts, "h")
      .join(verdicts, Seq("doc_id"))
      .join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("doc_id") =!= col("keep_doc")).as("is_exact_dup"),
        col("verdict"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
    manifestRows(facts)
      .select("doc_id", "keep", "reason", "split")
      .orderBy("doc_id")
  }

  /** q156's CONTINUOUS twin, declared end-to-end (VERDICT r12 #2):
    * bootstrap the [[graft.streaming.ManifestMaintainer]] — gate +
    * cluster + facts + manifest stores — on the first 80% of the
    * corpus, fold the rest in as two ingest batches (`ingestBatch` IS
    * the foreachBatch body; the streaming-harness variant with
    * checkpoint restart is ManifestMaintainSpec's job), then serve the
    * manifest store. Shares q156's from-scratch oracle, so the
    * driver's hash compare proves streamed curation ≡ one-shot over
    * the same history — gate decisions, cluster merges ACROSS the
    * bootstrap/batch boundary, representative re-elections, and
    * cluster-atomic splits all included. Per-batch cost is batch +
    * affected-cluster sized (class doc); fresh scratch store per run
    * (honest bench: bootstrap + 2×ingest + serve). */
  val q159ManifestMaintain: QueryDef = sql(
    "q159_manifest_maintain", manifestSql) { (s, d) =>
    val docs = Tables.documents(s, d)
    val store = graft.Scratch.dir("graft_manifest_maint") + "/store"
    val mm = new graft.streaming.ManifestMaintainer(s, d, store)
    val (cut, _, _, _) = lifecycleSplit(docs)
    val rest = docs.filter(col("doc_id") > cut)
    val mid = rest.agg(expr("percentile(doc_id, 0.5)").as("m")).head()
      .getDouble(0).toLong
    mm.bootstrap(docs.filter(col("doc_id") <= cut))
    mm.ingestBatch(rest.filter(col("doc_id") <= mid), Some(0L))
    mm.ingestBatch(rest.filter(col("doc_id") > mid), Some(1L))
    mm.current.orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(
    q45DedupExact, q46DedupNgramJaccard, q47DedupMinhash, q48DedupSimhash,
    q173SetSimPrefixJoin, q176SimhashIndexServe, q177SimhashMaintain,
    q180CatalogSimhashSql,
    q56NearDupPipeline, q89DedupClusters, q91DedupRemovalPlan, q93PairGraphStore,
    q94PairGraphIncremental, q95ClusterIncremental, q99CatalogPairGraph,
    q117DuplicateSpans, q121DedupIngestGate, q128TriangleCount, q129PageRank,
    q154ClusterSplit, q156TrainingManifest, q159ManifestMaintain,
    q185ManifestScored)
}
