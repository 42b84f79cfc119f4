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

  // maxSelectivity = 1.0: on a 4-doc fixture every pattern is
  // "common" by fraction, which would trip the round-16 access-path
  // gate — these tests pin the REWRITE machinery; the gate has its
  // own test at the 0.5 default below
  private def withRule[A](f: => A): A = {
    val r = TrigramAcceleration.enable(spark, s"$env/idx", s"$env/docs.parquet",
      maxSelectivity = 1.0)
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

  test("ADVICE r15: NOT / CaseWhen-nested predicates never rewrite (top-level conjuncts only)") {
    withRule {
      val not = corpus.filter(!$"text".contains("quick brown"))
      assert(!not.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "negated contains must not prune — its matches are the rows to DROP")
      assert(not.count() == 2, "NOT contains lost rows")

      // an OR under NOT is De-Morgan territory the rule refuses —
      // (a positive top-level OR itself rewrites since r17, see below)
      val notOr = corpus.filter(
        !($"text".contains("quick") || $"text".contains("wine")))
      assert(!notOr.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "a negated disjunction must not prune")
      assert(notOr.count() == 1, "NOT(OR) lost rows")

      val cw = corpus.filter(
        when($"text".contains("quick brown"), lit(false)).otherwise(lit(true)))
      assert(!cw.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "a contains under CaseWhen must not prune")
      assert(cw.count() == 2, "CaseWhen-guarded filter lost rows")
    }
  }

  test("VERDICT r16 #4: a top-level OR of answerable atoms rewrites as a branch union") {
    withRule {
      val or2 = corpus.filter($"text".contains("quick") || $"text".contains("wine"))
        .select("doc_id")
      val opt2 = or2.queryExecution.optimizedPlan.toString
      assert(opt2.contains("__tri_cand_doc_id"), s"2-way OR did not rewrite:\n$opt2")
      assert(or2.as[Long].collect().toSet == Set(1L, 2L, 4L),
        "2-way OR result diverged from the raw scan")

      // 3-way, including an ABSENT disjunct (its candidate branch is
      // empty — the union must still keep the other branches' rows)
      val or3 = corpus.filter($"text".contains("panda") ||
        $"text".contains("fox") || $"text".contains("purple cow")).select("doc_id")
      assert(or3.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "3-way OR did not rewrite")
      assert(or3.as[Long].collect().toSet == Set(1L, 2L, 3L),
        "3-way OR result diverged from the raw scan")

      // contains OR regex-alternation: the RLIKE's DNF branches concat
      // with the contains branch
      val orx = corpus.filter($"text".contains("wine") ||
        $"text".rlike("(quick|slow)")).select("doc_id")
      assert(orx.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "contains-OR-rlike did not rewrite")
      assert(orx.as[Long].collect().toSet == Set(1L, 2L, 3L, 4L),
        "contains-OR-rlike result diverged")

      // ONE unanswerable disjunct (sub-trigram literal) poisons the
      // whole conjunct: rows kept by it would be missing from the
      // candidate union, so the rule must decline
      val poisoned = corpus.filter($"text".contains("quick") || $"text".contains("qu"))
      assert(!poisoned.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "an OR with a sub-trigram disjunct must not rewrite")
      assert(poisoned.count() == 2, "poisoned OR lost rows")

      // a non-text disjunct poisons too
      val lenOr = corpus.filter($"text".contains("quick") || length($"text") > 23)
      assert(!lenOr.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "an OR with a non-index predicate must not rewrite")
      assert(lenOr.count() == 3, "length-OR lost rows")
    }
  }

  test("VERDICT r15 #3: ALL answerable conjuncts prune together; mixed conjuncts keep the rest") {
    withRule {
      val and = corpus.filter($"text".contains("quick") && $"text".contains("brown"))
        .select("doc_id")
      val opt = and.queryExecution.optimizedPlan.toString
      assert(opt.contains("__tri_cand_doc_id"), s"conjunction did not rewrite:\n$opt")
      assert(and.as[Long].collect().toSet == Set(1L, 2L))

      // contains + rlike conjuncts intersect; the non-answerable
      // length() conjunct stays in the kept filter
      val mixed = corpus.filter($"text".contains("brown") &&
        $"text".rlike("(fox|bread)") && length($"text") > 10).select("doc_id")
      assert(mixed.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"))
      assert(mixed.as[Long].collect().toSet == Set(1L, 2L, 4L))
    }
  }

  test("ADVICE r15: a union containing the corpus is never pruned as a whole (leaf-only corpus check)") {
    withRule {
      val other = spark.read.parquet(s"$env/other.parquet")
      val u = corpus.unionByName(other).filter($"text".contains("quick brown"))
        .select("doc_id")
      // the core optimizer pushes the filter through the union BEFORE
      // this rule runs, so the corpus branch alone may (correctly)
      // rewrite — what must never happen is a semi-join spliced above
      // a subtree whose leaves include the OTHER relation. Pinned two
      // ways: the non-indexed source's matching row survives, and at
      // most the corpus branch carries the marker (a whole-union
      // splice would put a Union under the semi-join's left side)
      val opt = u.queryExecution.optimizedPlan
      val badSplice = opt.collect {
        case j @ org.apache.spark.sql.catalyst.plans.logical.Join(left, right,
            org.apache.spark.sql.catalyst.plans.LeftSemi, _, _)
            if right.output.exists(_.name == "__tri_cand_doc_id") &&
              left.collectLeaves().size > 1 => j
      }
      assert(badSplice.isEmpty, s"semi-join spliced above a multi-leaf subtree:\n$opt")
      assert(u.as[Long].collect().toSet == Set(1L, 2L, 9L),
        "union lost the non-indexed source's matching row")
    }
  }

  test("ADVICE r15: inline-flag and \\Q regexes never rewrite; matches survive") {
    withRule {
      val ci = corpus.filter($"text".rlike("(?i)QUICK BROWN")).select("doc_id")
      assert(!ci.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "case-insensitive regex must not serve from the case-sensitive gram store")
      assert(ci.as[Long].collect().toSet == Set(1L, 2L), "(?i) matches lost")

      val quoted = corpus.filter($"text".rlike("\\Qred panda\\E")).select("doc_id")
      assert(!quoted.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "\\Q-quoted regex must bail to the full scan")
      assert(quoted.as[Long].collect().toSet == Set(3L))
    }
  }

  test("ADVICE r15: a corpus appended after enable stops the rewrite (freshness snapshot)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-trirw-fresh").toString
    val docs = Seq((1L, "the quick brown fox")).toDF("doc_id", "text")
    docs.write.parquet(s"$dir/docs.parquet")
    TrigramIndex.build(spark, docs, s"$dir/idx")
    val r = TrigramAcceleration.enable(spark, s"$dir/idx", s"$dir/docs.parquet",
      maxSelectivity = 1.0) // 1-doc fixture: every pattern is "common"
    try {
      def scan = spark.read.parquet(s"$dir/docs.parquet")
        .filter($"text".contains("quick brown")).select("doc_id")
      assert(scan.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "rule should fire on the snapshotted corpus")
      // append a doc the index never saw — the rule must now skip
      Seq((2L, "another quick brown row")).toDF("doc_id", "text")
        .write.mode("append").parquet(s"$dir/docs.parquet")
      val after = scan
      assert(!after.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "rule fired on a corpus that grew after the enable-time snapshot")
      assert(after.as[Long].collect().toSet == Set(1L, 2L),
        "appended doc lost — stale-index acceleration")
    } finally TrigramAcceleration.disable(spark, r)
  }

  test("VERDICT r15 #3: registerCatalog auto-installs the rule for its corpus") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-trirw-auto").toString
    Seq((1L, "gamma delta epsilon"), (2L, "delta zeta eta"))
      .toDF("doc_id", "text").write.parquet(s"$dir/docs.parquet")
    val corpus2 = spark.read.parquet(s"$dir/docs.parquet")
    val store = TrigramIndex.registerCatalog(spark, "trirw_auto_idx", corpus2)
    try {
      val q = corpus2.filter($"text".contains("delta zeta")).select("doc_id")
      assert(q.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "registerCatalog did not install transparent acceleration for its corpus")
      assert(q.as[Long].collect().toSet == Set(2L))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot {
        case rr: TrigramContainsRewrite => rr.storePath == store
        case _ => false
      }
  }

  test("round 16: selectivity gate — a common pattern declines the index path, a rare one takes it") {
    // 20 docs, every one containing 'common marker'; exactly one
    // containing 'rareneedle' — the df upper bound prices the two
    // patterns at 20/20 and 1/20 of the corpus
    val dir = java.nio.file.Files.createTempDirectory("graft-trirw-sel").toString
    val docs = (1L to 20L).map(i =>
      (i, s"common marker row $i" + (if (i == 7) " rareneedle" else "")))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/docs.parquet")
    TrigramIndex.build(spark, docs, s"$dir/idx")
    val r = TrigramAcceleration.enable(spark, s"$dir/idx", s"$dir/docs.parquet") // 0.5 default
    try {
      def scan(pat: String) = spark.read.parquet(s"$dir/docs.parquet")
        .filter($"text".contains(pat)).select("doc_id")
      val common = scan("common marker")
      assert(!common.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "a pattern in every doc must decline — the semi-join would prune nothing")
      assert(common.count() == 20, "declined plan lost rows")
      val rare = scan("rareneedle")
      assert(rare.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "a 1-in-20 pattern must take the index path")
      assert(rare.as[Long].collect().toSeq == Seq(7L))
      // a conjunction with one rare conjunct takes the TIGHTEST bound:
      // the rare side prunes, the common side rides the kept filter
      val mixed = spark.read.parquet(s"$dir/docs.parquet")
        .filter($"text".contains("common marker") && $"text".contains("rareneedle"))
        .select("doc_id")
      assert(mixed.queryExecution.optimizedPlan.toString.contains("__tri_cand_doc_id"),
        "a conjunction with a rare conjunct must still take the index path")
      assert(mixed.as[Long].collect().toSeq == Seq(7L))
    } finally TrigramAcceleration.disable(spark, r)
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
