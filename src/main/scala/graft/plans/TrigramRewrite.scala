package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Contains, EqualTo, Literal, RLike}
import org.apache.spark.sql.catalyst.plans.LeftSemi
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String

import graft.streaming.UpsertStore

/** CATALYST OPTIMIZER RULE: transparent LIKE-'%pat%' acceleration
  * through the trigram postings store ([[graft.operators.TrigramIndex]])
  * — the build brief's custom-`Rule[LogicalPlan]` slot, used where it
  * genuinely pays: a user writes the NAIVE plan
  * (`docs.filter($"text".contains("pat"))`, or SQL
  * `WHERE text LIKE '%pat%'`) and the optimizer splices a candidate
  * LEFT-SEMI join against the index under the untouched filter, so the
  * full-corpus byte scan becomes posting-list reads + a
  * candidate-sized verify WITHOUT the query author knowing the index
  * exists — the classic "index selection is the planner's job"
  * contract, impossible to express as a function or a rewrite the
  * user must opt into per query.
  *
  * Semantics preservation is BY CONSTRUCTION, the Cox property: a doc
  * containing `pat` contains every trigram of `pat`, so the semi-join
  * (ALL pattern trigrams present) keeps a candidate SUPERSET of the
  * true matches, and the original `Contains` filter stays on top —
  * the rewrite can only remove rows the filter would drop anyway.
  * Firing is deliberately narrow (every guard load-bearing):
  *
  *  - the filter's child must SCAN THE INDEXED CORPUS — matched by
  *    file path against the parquet location recorded at
  *    [[TrigramAcceleration.enable]] time (pruning any OTHER relation
  *    would silently drop rows: the store only answers for documents
  *    it indexed);
  *  - the pattern must be a ≥ 3-char string LITERAL over the `text`
  *    attribute (a column-valued pattern has no driver-known trigrams);
  *  - the child must still expose `doc_id` (the semi-join key);
  *  - an already-pruned child (marker alias on the semi-join's right
  *    side) never re-fires — the fixpoint guard.
  *
  * The spliced candidate subtree is the candidate DF's OPTIMIZED plan
  * (this rule runs in the user-provided batch at the tail of the
  * optimizer, so an analyzed splice would skip pushdown INSIDE the
  * candidate scan — the `gram IN (...)` filter must reach the postings
  * parquet reader for the rewrite to be worth anything).
  */
final class TrigramContainsRewrite(spark: SparkSession, storePath: String,
                                   corpusPath: String) extends Rule[LogicalPlan] {

  private val marker = "__tri_cand_doc_id"
  private val corpusTail = normalize(corpusPath)

  private def normalize(p: String): String =
    p.stripSuffix("/").replaceFirst("^file:", "")

  private def readsCorpus(plan: LogicalPlan): Boolean = plan.exists {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation =>
        fs.location.rootPaths.exists(rp =>
          normalize(rp.toUri.getPath) == corpusTail ||
            normalize(rp.toString) == corpusTail)
      case _ => false
    }
    case _ => false
  }

  private def alreadyPruned(child: LogicalPlan): Boolean = child match {
    case Join(_, right, LeftSemi, _, _) => right.output.exists(_.name == marker)
    case _ => false
  }

  /** Candidate doc_ids for a compiled requirement (OR over branches of
    * AND over each branch's fragment trigrams — the
    * [[graft.operators.TrigramIndex.regexSearch]] shape), as an
    * optimized logical plan ready to splice. A plain `contains`
    * pattern is the one-branch/one-fragment case. */
  private def candidates(required: Seq[Seq[String]]): Option[LogicalPlan] =
    UpsertStore.read(spark, storePath).map { postings =>
      required.map { frags =>
        val grams = frags.flatMap(_.sliding(3)).distinct
        postings.filter(col("gram").isin(grams: _*))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("__tri_hits"))
          .filter(col("__tri_hits") === grams.size)
          .select(col("doc_id"))
      }.reduce(_ unionByName _).distinct()
        .select(col("doc_id").as(marker))
        .queryExecution.optimizedPlan
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child)
        if !alreadyPruned(child) && child.output.exists(_.name == "doc_id") &&
          readsCorpus(child) =>
      // first index-answerable predicate in the condition: a literal
      // contains (one required fragment), or a literal RLIKE whose
      // regex compiles to required literals (the q181 compiler — a
      // None compilation means the index cannot prune, so the filter
      // stays a plain scan, still correct)
      val required = cond.collectFirst {
        case Contains(a: AttributeReference, Literal(p: UTF8String, StringType))
            if a.name == "text" && p != null && p.toString.length >= 3 &&
              child.outputSet.contains(a) =>
          Seq(Seq(p.toString))
        case RLike(a: AttributeReference, Literal(p: UTF8String, StringType))
            if a.name == "text" && p != null &&
              child.outputSet.contains(a) &&
              graft.operators.TrigramIndex.requiredLiterals(p.toString).isDefined =>
          graft.operators.TrigramIndex.requiredLiterals(p.toString).get
      }
      (for {
        req <- required
        cand <- candidates(req)
        docId <- child.output.find(_.name == "doc_id")
      } yield Filter(cond, Join(child, cand, LeftSemi,
          Some(EqualTo(docId, cand.output.head)), JoinHint.NONE)))
        .getOrElse(f)
  }
}

/** Session wiring for [[TrigramContainsRewrite]] — scoped enable /
  * disable on `spark.experimental.extraOptimizations` (the public
  * user-rule hook; [[graft.GraftExtensions]] remains the
  * session-build-time path for the function registry). */
object TrigramAcceleration {

  /** Install the rewrite for (index store, corpus parquet path).
    * Returns the rule handle for [[disable]]. Idempotence is the
    * caller's concern — enabling twice would double-splice nothing
    * (the marker guard stops the second fire) but costs a plan walk. */
  def enable(spark: SparkSession, storePath: String,
             corpusPath: String): TrigramContainsRewrite = {
    val r = new TrigramContainsRewrite(spark, storePath, corpusPath)
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ r
    r
  }

  /** Remove exactly the handle [[enable]] returned. */
  def disable(spark: SparkSession, rule: TrigramContainsRewrite): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq rule)
}
