package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.operators.TrigramIndex

/** The transparent LIKE-acceleration optimizer rule
  * ([[TrigramContainsRewrite]], q188): the naive contains-filter plan
  * gains a candidate LEFT-SEMI join against the trigram store with the
  * original filter untouched. Pinned: result identity with the rule on
  * vs off (incl. the absent pattern), the semi-join actually appearing
  * in the optimized plan, every narrowing guard (foreign relation,
  * column-valued pattern, short literal), and clean disable. */
class TrigramRewriteSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val env = {
    val dir = java.nio.file.Files.createTempDirectory("graft-trirw").toString
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "quick brown foxes are rare"),
      (3L, "a slow red panda sleeps"),
      (4L, "brown bread and red wine")).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/docs.parquet")
    TrigramIndex.build(spark, docs, s"$dir/idx")
    // a LOOK-ALIKE relation (same schema, different path): the rule
    // must never prune it — its docs are not in the index
    Seq((9L, "quick brown impostor")).toDF("doc_id", "text")
      .write.parquet(s"$dir/other.parquet")
    dir
  }

  private def corpus = spark.read.parquet(s"$env/docs.parquet")

  private def withRule[A](f: => A): A = {
    val r = TrigramAcceleration.enable(spark, s"$env/idx", s"$env/docs.parquet")
    try f finally TrigramAcceleration.disable(spark, r)
  }

  test("rewrite fires: semi-join in the plan, results identical, absent pattern empty") {
    val plain = corpus.filter($"text".contains("quick brown"))
      .select("doc_id").as[Long].collect().toSet
    withRule {
      val accel = corpus.filter($"text".contains("quick brown")).select("doc_id")
      val opt = accel.queryExecution.optimizedPlan.toString
      assert(opt.contains("LeftSemi") && opt.contains("__tri_cand_doc_id"),
        s"rule did not splice the candidate semi-join:\n$opt")
      assert(accel.as[Long].collect().toSet == plain,
        "accelerated result diverged from the naive scan")
      assert(corpus.filter($"text".contains("purple cow")).count() == 0,
        "absent pattern must stay empty through the index path")
    }
  }

  test("guards: foreign relation, column pattern, and short literal never rewrite") {
    withRule {
      val other = spark.read.parquet(s"$env/other.parquet")
        .filter($"text".contains("quick brown"))
      assert(!other.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "rule pruned a relation the index never saw")
      assert(other.count() == 1, "foreign relation row lost")

      val colPat = corpus.filter($"text".contains($"text"))
      assert(!colPat.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "column-valued pattern must not rewrite")

      val short = corpus.filter($"text".contains("qu"))
      assert(!short.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "sub-trigram literal must not rewrite")
      assert(short.count() == 2)
    }
  }

  test("literal RLIKE rewrites through the regex compiler; unprunable regexes stay plain scans") {
    withRule {
      val rx = corpus.filter($"text".rlike("(quick|slow) (brown|red)")).select("doc_id")
      assert(rx.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        s"literal rlike did not rewrite:\n${rx.queryExecution.optimizedPlan}")
      assert(rx.as[Long].collect().toSet == Set(1L, 2L, 3L),
        "accelerated regex result diverged from the raw scan")
      // no >=3-char required literal on some branch → index can't
      // prune; the filter must stay a plain (correct) scan
      val unprunable = corpus.filter($"text".rlike("q[uw]i"))
      assert(!unprunable.queryExecution.optimizedPlan.toString
        .contains("__tri_cand_doc_id"), "unprunable regex must not rewrite")
      assert(unprunable.count() == 2)
      // column-valued regex: no driver-known trigrams
      val colRx = corpus.filter(expr("text RLIKE text"))
      assert(!colRx.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "column-valued regex must not rewrite")
    }
  }

  test("SQL LIKE '%pat%' plans through the same rewrite; disable restores the plain plan") {
    corpus.createOrReplaceTempView("trirw_docs")
    withRule {
      // LikeSimplification (a core optimizer batch, which runs BEFORE
      // the user-provided batch) lowers single-%pat% LIKE into
      // Contains — so the rule accelerates the SQL spelling too
      val viaSql = spark.sql(
        "SELECT doc_id FROM trirw_docs WHERE text LIKE '%red%'")
      assert(viaSql.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        s"SQL LIKE '%pat%' did not rewrite:\n${viaSql.queryExecution.optimizedPlan}")
      assert(viaSql.as[Long].collect().toSet == Set(3L, 4L))
      val opt = spark.sql(
        "SELECT doc_id FROM trirw_docs WHERE contains(text, 'red panda')")
      assert(opt.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        s"SQL contains() did not rewrite:\n${opt.queryExecution.optimizedPlan}")
      assert(opt.as[Long].collect().toSet == Set(3L))
    }
    val after = corpus.filter($"text".contains("quick brown"))
    assert(!after.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
      "disable must restore the plain plan")
  }
}
