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
    val sh = shingles(Tables.documents(s, d)).cache()
    val dfreq = sh.groupBy("shingle").agg(count(lit(1)).as("dfreq"))
    val pruned = sh.join(dfreq.filter(col("dfreq") <= 50), "shingle").select("doc_id", "shingle")
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("nsh"))
    val a = pruned.select(col("doc_id").as("doc_a"), col("shingle"))
    val b = pruned.select(col("doc_id").as("doc_b"), col("shingle"))
    val pairs = a.join(b, Seq("shingle")).filter(col("doc_a") < col("doc_b"))
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

  /** MinHash + LSH banding over 3-gram shingles: k=32 signature,
    * 16 bands × 2 rows (collision prob ≈ 1-(1-J²)¹⁶ — near 1.0 for
    * J ≥ 0.6). Bands are hashed to ONE long before the self-join, so
    * the shuffle carries (band, hash, doc_id) triples — never the
    * signature arrays; candidates re-join signatures for the estimate.
    * Custom expression → rows-only check; estimator quality and recall
    * vs exact Jaccard are asserted in the spec. */
  val q47DedupMinhash: QueryDef = rowsOnly("q47_dedup_minhash") { (s, d) =>
    val k = 32; val bands = 16; val rows = k / bands
    val sigs = shingleArray(Tables.documents(s, d))
      .select(col("doc_id"),
        TextFunctions.minhash_signature(col("shingles"), k, seed = 42L).as("sig"))
      .cache()
    val banded = sigs.select(
      col("doc_id"),
      posexplode(expr(
        s"transform(sequence(0, ${bands - 1}), b -> xxhash64(b, slice(sig, b * $rows + 1, $rows)))")))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))
    val l = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_a"))
    val r = banded.select(col("band"), col("band_hash"), col("doc_id").as("doc_b"))
    val cand = l.join(r, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b")
      .distinct()
    val est = expr(s"aggregate(zip_with(sig_a, sig_b, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / CAST($k AS DOUBLE)")
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("sig").as("sig_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("sig").as("sig_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), round(est, 4).as("est_jaccard"))
      .filter(col("est_jaccard") >= 0.3)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup: 64-bit fingerprints, banded into 4×16-bit chunks
    * for candidate generation, verified by Hamming distance ≤ 6. */
  val q48DedupSimhash: QueryDef = rowsOnly("q48_dedup_simhash") { (s, d) =>
    val fp = shingleArray(Tables.documents(s, d))
      .select(col("doc_id"), TextFunctions.simhash64(col("shingles")).as("simhash"))
      .cache()
    val chunks = fp.select(
      col("doc_id"), col("simhash"),
      posexplode(expr(
        "transform(sequence(0, 3), c -> (simhash >> (c * 16)) & 65535)")))
      .select(col("doc_id"), col("simhash"), col("pos").as("chunk"), col("col").as("chunk_val"))
    val l = chunks.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_a"), col("simhash").as("sh_a"))
    val r = chunks.select(col("chunk"), col("chunk_val"), col("doc_id").as("doc_b"), col("simhash").as("sh_b"))
    l.join(r, Seq("chunk", "chunk_val"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "sh_a", "sh_b")
      .distinct()
      .withColumn("hamming", expr("bit_count(sh_a ^ sh_b)").cast("long"))
      .filter(col("hamming") <= 6)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  val all: Seq[QueryDef] = Seq(
    q45DedupExact, q46DedupNgramJaccard, q47DedupMinhash, q48DedupSimhash)
}
