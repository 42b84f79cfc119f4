package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions._

/** SQL registration of the engine's custom expressions, so
  * `spark.sql("SELECT cosine_similarity(a, b) ...")` works exactly like
  * the Column API ([[graft.functions.VectorFunctions]] etc.).
  *
  * Two wirings:
  *  - [[GraftExtensions]] — `spark.sql.extensions=graft.GraftExtensions`
  *    (or `.withExtensions(new GraftExtensions)`) for new sessions;
  *  - [[GraftFunctions.register]] — imperative registration on an
  *    existing session (tests, notebooks).
  */
object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got: $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got: $other")
  }

  /** name → (arity description, builder). */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> (e => CosineSimilarity(e(0), e(1))),
    "dot_product" -> (e => DotProduct(e(0), e(1))),
    "l2_distance" -> (e => L2Distance(e(0), e(1))),
    "rolling_hash" -> (e => RollingHash(e(0))),
    "normalize_text" -> (e => NormalizeText(e(0))),
    "simhash64" -> (e => SimHash64(e(0))),
    "minhash_signature" -> (e =>
      MinHashSignature(e(0), intArg(e(1), "k"), longArg(e(2), "seed"))),
    "hyperplane_bucket" -> (e =>
      HyperplaneBucket(e(0), intArg(e(1), "planes"), intArg(e(2), "dim"),
        longArg(e(3), "seed"))),
    "top_k_by_score" -> (e => TopKByScore(e(0), e(1), intArg(e(2), "k"))),
    // Generator: `SELECT ... FROM t LATERAL VIEW shingles(tokens, 3) AS shingle`
    "shingles" -> (e => ShingleGenerator(e(0), intArg(e(1), "n"))),
    // theta / KMV sketch family (q171/q172/q175): aggregates return an
    // AggregateFunction — the analyzer wraps it, same as builtins
    "theta_sketch_bytes" -> (e => ThetaSketchBytesAgg(e(0), intArg(e(1), "k"))),
    "theta_union_merge" -> (e => ThetaUnionMergeAgg(e(0), intArg(e(1), "k"))),
    "theta_estimate" -> (e => ThetaEstimateExpr(e(0))),
    "theta_intersect_estimate" -> (e => ThetaIntersectExpr(e(0), e(1))),
    "theta_anotb_estimate" -> (e => ThetaAnotBExpr(e(0), e(1))),
    "theta_union_estimate" -> (e => ThetaUnionPairExpr(e(0), e(1))))

  /** Register all functions on an existing session. */
  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      org.apache.spark.sql.GraftSqlBridge.registerFunction(spark, name, b)
    }
}

/** `SparkSessionExtensions` hook (SURVEY §7 / build-brief item (c)):
  * injects the function set at session build time. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftFunctions.builders.foreach { case (name, b) =>
      e.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        (exprs: Seq[Expression]) => b(exprs)))
    }
}
