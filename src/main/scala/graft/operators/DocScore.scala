package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** Pluggable DOCUMENT-QUALITY SCORER seam (VERDICT r14 #6) — the text
  * twin of [[Multimodal.AssetDecoder]] (binary decode) and
  * [[Retrieval.PairScorer]] (rerank): a production curation pipeline
  * scores documents with a learned model (fastText langid-style
  * n-gram classifier, a quality regressor à la C4/Gopher/FineWeb-Edu),
  * and the model session is EXPENSIVE to construct — so the seam is
  * `mapPartitions` with one scorer instance per partition, where the
  * model loads once and rows stream through it in batches. The
  * classifier itself is intentionally NOT shipped (no model libs in
  * this environment); what is real and tested is everything Spark-side:
  * the partition-scoped bind, the row shape, determinism, and
  * batch-size invariance (MultimodalEmbedSpec's rule: the score must
  * be a pure function of the row, never of partition or batch
  * context).
  *
  * The default [[HeuristicBlendScorer]] is a real scorer, not a fake:
  * a classifier-SHAPED squashed-linear blend of the q70 quality
  * signals (lexical diversity, stopword rate, length, token shape) —
  * exactly the feature set the heuristic-filter literature blends
  * (Rae 2021 §A1.1's rule stack, recast as one score). The squash is
  * the ALGEBRAIC sigmoid σ(z) = 0.5 + z / (2(1+|z|)) rather than the
  * logistic: pure rational IEEE-double arithmetic, so DuckDB replays
  * the identical bits (exp() would race two libm implementations) and
  * the whole seam stays under the driver's hash-compare oracle.
  */
object DocScore {
  import QueryDef.sql

  /** One scorer instance per partition; production binds the model
    * session here (the [[Multimodal.AssetDecoder]] contract). */
  trait DocScorer extends Serializable {
    def score(text: String): Double
  }

  /** Deterministic default: squashed linear blend of the q70 signals.
    * Tokenization is the engine-wide convention
    * ([[TextAnalysis.tokens]]: split `lower(text)` on `\s+`), features
    * and arithmetic ordered exactly as the SQL oracle writes them —
    * the [[Retrieval.LexicalJaccardScorer]] parity discipline. */
  object HeuristicBlendScorer extends DocScorer {
    override def score(text: String): Double = {
      // Locale.ROOT + code-point length (ADVICE r15): the DuckDB oracle
      // lowercases locale-free and LENGTH() counts CHARACTERS — Java's
      // default-locale toLowerCase (tr-TR dotted I) and UTF-16-unit
      // String.length (surrogate pairs count 2) would desync the
      // hash-compare parity on non-BMP / locale-sensitive text
      val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+")
      val nt = toks.length
      if (nt == 0) 0.0
      else {
        val dr = toks.distinct.length.toDouble / nt
        val sr = toks.count(t => t == "the" || t == "a").toDouble / nt
        val noSpace = text.replace(" ", "")
        val atl = noSpace.codePointCount(0, noSpace.length).toDouble / nt
        val z = 4.0 * dr - 6.0 * sr + 0.01 * math.min(nt, 100) - 0.2 * atl - 1.2
        0.5 + z / (2.0 * (1.0 + math.abs(z)))
      }
    }
  }

  /** Batched scoring through the seam: one scorer per partition, rows
    * stream through it. Output (doc_id, qscore ROUND 6, verdict) —
    * the alternative verdict column for the q70/q156 manifest shape
    * (keep ⇔ qscore ≥ 0.5, i.e. blend z ≥ 0). */
  def scoreDocs(docs: Dataset[(Long, String)], scorer: DocScorer): DataFrame = {
    import docs.sparkSession.implicits._
    docs.mapPartitions { it =>
      val s = scorer // per-partition bind: a model session loads HERE
      it.map { case (id, text) => (id, s.score(text)) }
    }.toDF("doc_id", "qscore0")
      .select(col("doc_id"), round(col("qscore0"), 6).as("qscore"),
        when(col("qscore0") >= 0.5, "keep").otherwise("drop").as("verdict"))
  }

  /** The scored corpus through the seam, oracle-replayed feature by
    * feature: DuckDB recomputes the same tokenization, the same four
    * signals, the same left-associated blend, and the same algebraic
    * sigmoid, so the hash compare proves the mapPartitions path
    * computes exactly the declared function — which is what makes the
    * seam safe to swap a real model into (the contract is pinned, the
    * scorer is the only moving part). Scale: embarrassingly parallel
    * map over the corpus scan; no shuffle, no state. */
  val q183DocScorer: QueryDef = sql(
    "q183_doc_scorer",
    """WITH m AS (
      |  SELECT doc_id,
      |         len(string_split_regex(lower(text), '\s+')) AS nt,
      |         CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE)
      |           / len(string_split_regex(lower(text), '\s+')) AS dr,
      |         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                              x -> x IN ('the', 'a'))) AS DOUBLE)
      |           / len(string_split_regex(lower(text), '\s+')) AS sr,
      |         CAST(LENGTH(replace(text, ' ', '')) AS DOUBLE)
      |           / len(string_split_regex(lower(text), '\s+')) AS atl
      |  FROM documents),
      |z AS (SELECT doc_id,
      |             4.0 * dr - 6.0 * sr + 0.01 * least(nt, 100) - 0.2 * atl - 1.2 AS z
      |      FROM m)
      |SELECT doc_id,
      |       ROUND(0.5 + z / (2.0 * (1.0 + abs(z))), 6) AS qscore,
      |       CASE WHEN 0.5 + z / (2.0 * (1.0 + abs(z))) >= 0.5
      |            THEN 'keep' ELSE 'drop' END AS verdict
      |FROM z
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import s.implicits._
    scoreDocs(
      Distributed.parallelized(Tables.documents(s, d).select("doc_id", "text"))
        .as[(Long, String)],
      HeuristicBlendScorer)
      .orderBy("doc_id")
  }

  val all: Seq[QueryDef] = Seq(q183DocScorer)
}
