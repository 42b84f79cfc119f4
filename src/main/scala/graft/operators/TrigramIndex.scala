package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{Retraction, UpsertStore}

/** Character-TRIGRAM postings index for SUBSTRING search — the public
  * Google-Code-Search method (Russ Cox, "Regular Expression Matching
  * with a Trigram Index", 2012): a substring pattern can only match a
  * document that contains EVERY trigram of the pattern, so candidates
  * come from intersecting trigram posting lists and only candidates
  * pay the `contains` verify. This is the LIKE-'%pat%' accelerator of
  * a 100 TB corpus: the raw scan reads every byte of every document;
  * the index touches K posting lists plus the (output-sized) verify.
  *
  * Store shape (the [[PostingsIndex]] discipline): a postings store
  * keyed (gram, doc_id) — idempotently extendable, a replayed batch
  * upserts the identical rows — and a gram→df side store refreshed by
  * RECOUNTING the touched grams from the postings store after each
  * upsert (the [[ShingleIndex]] rule): `df(gram) = count(postings
  * where gram)` is exact against any replayed or overlapping batch,
  * where an additive delta fold would silently inflate on replay
  * (ADVICE r14). Both stores are therefore idempotent by
  * construction; the txn ledger remains optional bookkeeping.
  *
  * Serve uses the RAREST-K refinement (also Cox's): any subset of the
  * pattern's trigrams yields a candidate SUPERSET, so the serve
  * intersects only the K=4 rarest (by stored df, asc) — fan-out is
  * bounded by the shortest posting lists while the verify keeps
  * exactness. A pattern trigram absent from the corpus has no
  * postings rows, so no document reaches K hits and the result is
  * correctly empty without any special-casing.
  */
object TrigramIndex {

  /** Distinct character trigrams of `text` per doc. */
  private def grams(docs: DataFrame): DataFrame =
    // parallelized: the char-trigram explode multiplies a 1-split
    // bench-SF scan by ~|text| rows before any exchange — the guard
    // repartition keeps the explode on all cores (Distributed doc)
    Distributed.parallelized(docs).select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, greatest(length(text) - 2, 0)), i -> substring(text, i, 3))"))
          .as("gram"))
      .distinct()

  /** Build both stores from scratch. */
  def build(spark: SparkSession, docs: DataFrame, path: String): Unit = {
    // the trigram explode+distinct is the expensive pass; postings and
    // df both read it, so it persists for exactly this scope
    val g = grams(docs).persist()
    try {
      // disjoint stores, both consumers of the persisted gram pass →
      // parallel write stages (round 19, guide §2.6)
      graft.Stage.par(
        () => UpsertStore.replace(spark, s"$path", g,
          Seq("gram", "doc_id"), assumeKeyUnique = true),
        () => UpsertStore.replace(spark, s"${path}__df",
          g.groupBy("gram").agg(count(lit(1)).as("df")),
          Seq("gram"), assumeKeyUnique = true))
    } finally g.unpersist()
  }

  /** Fold a new-docs batch in: postings upsert is idempotent by key;
    * df for the touched grams is RECOUNTED from the just-upserted
    * postings store (only the delta's grams' posting lists are read —
    * a semi-join-pruned, column-pruned parquet pass), so a replayed or
    * doc-overlapping batch converges to the exact counts instead of
    * additively inflating them (ADVICE r14). Cost ∝ the touched
    * grams' posting lists rather than the bare delta — the price of
    * ledger-free idempotence, same trade [[ShingleIndex.extend]]
    * makes. */
  def extend(spark: SparkSession, docs: DataFrame, path: String,
             txnId: Option[Long] = None): Unit = {
    val delta = grams(docs).persist()
    try {
      UpsertStore.upsert(spark, s"$path", delta,
        Seq("gram", "doc_id"), assumeKeyUnique = true, txnId = txnId)
      val postings = UpsertStore.read(spark, s"$path").getOrElse(
        sys.error(s"trigram postings at $path unreadable after upsert"))
      val refreshed = postings
        .join(delta.select("gram").distinct(), Seq("gram"), "left_semi")
        .groupBy("gram").agg(count(lit(1)).as("df"))
      UpsertStore.upsert(spark, s"${path}__df", refreshed,
        Seq("gram"), assumeKeyUnique = true, txnId = txnId)
    } finally delta.unpersist()
  }

  /** RETRACT documents from both stores (round 17 — the takedown
    * lifecycle, VERDICT r16 #1): the exact inverse of [[extend]].
    * `gone` carries the retracted docs' (doc_id, text) — full rows,
    * because the deleted posting KEYS and the touched-gram set are
    * recomputed from the text (a pure function), which is what makes
    * a crash-replay converge: a second pass derives the same keys,
    * the deletes are no-ops, and the df recount re-reads the same
    * (already-correct) counts. df rows whose posting list empties are
    * DELETED, not zeroed — a from-scratch build on the remaining
    * corpus has no row for a vanished gram, and the serve's rarest-K
    * selection must agree with it. The catalog meta (when present)
    * advances by the XOR-retract rule — fingerprints compose
    * associatively, so removal is `(n − Δn, h ⊕ Δh)` — guarded by a
    * txn column (the advance is NOT idempotent; monotonically
    * increasing ids across extends and retracts are the caller's
    * contract, as everywhere). Cost ∝ the gone docs' grams' posting
    * lists — never corpus-sized. Contract: every retracted row must
    * currently be indexed (retracting a never-indexed doc would
    * corrupt the fingerprint). */
  def retract(spark: SparkSession, gone0: DataFrame, path: String,
              txnId: Option[Long] = None): Unit = {
    val gone = Retraction.dedupBatch(gone0, "doc_id")
    val metaPath = s"${path}__meta"
    val meta = UpsertStore.read(spark, metaPath).map(_.head())
    val metaTxn = meta.map(Retraction.fromMeta).getOrElse(-1L)
    if (meta.isDefined && txnId.exists(_ <= metaTxn)) return
    val g = grams(gone).persist()
    try {
      UpsertStore.delete(spark, s"$path", g, Seq("gram", "doc_id"))
      val postings = UpsertStore.read(spark, s"$path").getOrElse(
        sys.error(s"trigram postings at $path unreadable after delete"))
      val touched = g.select("gram").distinct()
      val remaining = postings
        .join(touched, Seq("gram"), "left_semi")
        .groupBy("gram").agg(count(lit(1)).as("df"))
      UpsertStore.upsert(spark, s"${path}__df", remaining,
        Seq("gram"), assumeKeyUnique = true)
      val vanished = touched.join(remaining.select("gram"), Seq("gram"), "left_anti")
        .localCheckpoint()
      if (!vanished.isEmpty)
        UpsertStore.delete(spark, s"${path}__df", vanished, Seq("gram"))
      meta.foreach { m =>
        val (dn, dh) = PairGraph.corpusFingerprint(gone)
        UpsertStore.replace(spark, metaPath,
          metaRow(spark, m.getAs[Long]("corpus_n") - dn,
            m.getAs[Long]("corpus_h") ^ dh)
            .withColumn("rtxn", lit(txnId.getOrElse(metaTxn))),
          Seq("meta_id"), assumeKeyUnique = true)
      }
    } finally g.unpersist()
  }

  private def metaRow(spark: SparkSession, n: Long, h: Long): DataFrame =
    spark.range(1).select(lit(1L).as("meta_id"),
      lit(n).as("corpus_n"), lit(h).as("corpus_h"))

  /** Register the trigram index under the `graft` catalog (the
    * q106/q160/q175 idiom — VERDICT r14 #3): build-or-gate-serve AT
    * the warehouse path, then `<catalog>.<name>` reads the live gram
    * postings and `<catalog>.<name>__df` the gram document
    * frequencies, so the whole substring serve (q179) is one SQL text
    * by table name. The fingerprint gate is the [[PairGraph]] rule:
    * a corpus-matching meta row (committed LAST, after both data
    * stores) skips the rebuild; any crash window leaves meta stale and
    * degrades to a rebuild, never a stale serve. Returns the store
    * path for [[extend]]/[[search]] against the registered tables. */
  def registerCatalog(spark: SparkSession, name: String, docs: DataFrame,
                      catalog: String = "graft"): String = {
    val path = s"${PairGraph.catalogWarehouse(spark, catalog)}/$name"
    val (n, h) = PairGraph.corpusFingerprint(docs)
    val fresh = UpsertStore.read(spark, s"${path}__meta").exists(
      _.filter(col("corpus_n") === n && col("corpus_h") === h).count() == 1)
    if (!fresh) {
      build(spark, docs, path)
      UpsertStore.replace(spark, s"${path}__meta", metaRow(spark, n, h),
        Seq("meta_id"), assumeKeyUnique = true)
    }
    PairGraph.ensureTable(spark, catalog, name, path, Seq("gram", "doc_id"))
    PairGraph.ensureTable(spark, catalog, s"${name}__df", s"${path}__df", Seq("gram"))
    // transparent acceleration (VERDICT r15 #3): when the registered
    // corpus is the WHOLE of one parquet location (a row-preserving
    // plan over a single relation — a filtered subset would make the
    // rule prune docs the store never indexed), install the optimizer
    // rule so naive LIKE/contains/RLIKE SQL over that relation serves
    // from this index with no session plumbing. ensureEnabled retakes
    // the freshness snapshot, so a rebuild re-pins the file listing.
    wholeCorpusLocation(docs).foreach { loc =>
      graft.plans.TrigramAcceleration.ensureEnabled(spark, path, loc)
    }
    path
  }

  /** The single parquet location `docs` scans, IF the plan is
    * row-preserving over exactly one file relation (projection /
    * aliasing / repartition only — anything that can drop or add rows
    * means the index holds a different document set than the raw
    * scan and transparent acceleration would be unsound). */
  private[graft] def wholeCorpusLocation(docs: DataFrame): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val plan = docs.queryExecution.analyzed
    val rowPreserving = plan.collect {
      case _: Project | _: SubqueryAlias | _: Repartition |
           _: RepartitionByExpression | _: LogicalRelation => ()
    }.size == plan.collect { case _ => () }.size
    plan.collectLeaves() match {
      case Seq(lr: LogicalRelation) if rowPreserving => lr.relation match {
        case fs: HadoopFsRelation if fs.location.rootPaths.size == 1 =>
          Some(fs.location.rootPaths.head.toString)
        case _ => None
      }
      case _ => None
    }
  }

  // ---- regex → required-trigram compilation (Cox 2012 §"Regular
  // Expression Matching with a Trigram Index", the actual headline of
  // the paper behind this index) ----

  /** Compile a regex into DNF branches of REQUIRED literal fragments:
    * every string the regex matches contains, for at least one branch,
    * ALL of that branch's fragments as contiguous substrings. The
    * candidate query is then OR-over-branches of AND-over-fragment-
    * trigrams — any superset of the true match set, never a subset
    * (false candidates die in the `rlike` verify; a missed required
    * literal would lose matches, so every reduction here weakens
    * toward MORE candidates).
    *
    * Supported exactly: literals, top-level and embedded single-level
    * alternation groups `(a|b)` of pure literals (incl. `(?:`),
    * quantifiers `* + ? {m,n}`, wildcards `.` and classes `[...]`,
    * escapes, anchors. Conservative rules (all sound):
    *  - `X*` / `X?` / `X{..}`: X may be absent — X is dropped and the
    *    literal run breaks around it;
    *  - `X+`: X occurs but repetition breaks contiguity — X's last
    *    atom is kept as a standalone fragment and the run breaks;
    *  - `.`, `[...]`, class escapes (`\d` `\w` `\s` …): unknown char —
    *    run breaks;
    *  - group alternation multiplies branches (each alt continues the
    *    run: `key (agg|value) row` → branches `key agg row` /
    *    `key value row`); groups with nested groups, inner metas, an
    *    empty alt, or a branch blow-up past 64 are treated as unknown
    *    content — run breaks.
    *
    * Returns None when some branch ends with NO fragment of length
    * ≥ 3: that branch's matches can sit in documents sharing no
    * required trigram, so the index cannot prune and the caller must
    * fall back to the honest full `rlike` scan for that pattern.
    *
    * Returns None EAGERLY (ADVICE r15) on constructs whose presence
    * anywhere changes what "literal" means — inline flag / lookaround
    * / named groups (`(?` not followed by `:`, e.g. `(?i)` makes the
    * case-sensitive gram store lose `FOO` for required `foo`) and
    * `\Q...\E` quoting (quoted metachars would otherwise be parsed as
    * live syntax) — rather than risking a required fragment the match
    * text need not contain. */
  private[graft] def requiredLiterals(pattern: String): Option[Seq[Seq[String]]] = {
    val maxBranches = 64
    // constructs the compiler does not model — honest full-scan
    // fallback for the whole pattern (the scan is deliberately NOT
    // char-class-aware: bailing on `[(?i)]` too is conservative and
    // only costs prune power, never correctness)
    def unsupported(p: String): Boolean = {
      var i = 0
      while (i < p.length) {
        val c = p(i)
        if (c == '\\' && i + 1 < p.length) {
          if (p(i + 1) == 'Q' || p(i + 1) == 'E') return true
          i += 2
        } else if (c == '(' && i + 1 < p.length && p(i + 1) == '?' &&
                   (i + 2 >= p.length || p(i + 2) != ':')) {
          return true
        } else i += 1
      }
      false
    }
    if (unsupported(pattern)) return None
    // split on unescaped top-level '|' (alternation outside any group
    // AND outside any [...] class, where '|' '(' ')' are literals)
    def splitTop(p: String): Seq[String] = {
      val parts = scala.collection.mutable.ListBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0; var inClass = false; var i = 0
      while (i < p.length) {
        val c = p(i)
        if (c == '\\' && i + 1 < p.length) { cur.append(c).append(p(i + 1)); i += 1 }
        else if (inClass) { if (c == ']') inClass = false; cur.append(c) }
        else if (c == '[') { inClass = true; cur.append(c) }
        else if (c == '(') { depth += 1; cur.append(c) }
        else if (c == ')') { depth -= 1; cur.append(c) }
        else if (c == '|' && depth == 0) { parts += cur.result(); cur.clear() }
        else cur.append(c)
        i += 1
      }
      parts += cur.result()
      parts.toSeq
    }
    // one alternative → branches of (closed fragments, open run);
    // None = a shape the parser cannot have reached from a valid
    // class-aware top-level split (stray '|' / unbalanced parens) —
    // the whole compile bails to the full-scan fallback
    def parseAlt(alt: String): Option[Seq[Seq[String]]] = {
      final case class B(frags: Vector[String], cur: String)
      def flush(b: B): B =
        if (b.cur.nonEmpty) B(b.frags :+ b.cur, "") else b
      var branches = Vector(B(Vector.empty, ""))
      var i = 0
      var bail = false
      def quantAfter(j: Int): Option[Char] =
        if (j < alt.length && "*+?{".contains(alt(j))) Some(alt(j)) else None
      def skipQuant(j: Int): Int = quantAfter(j) match {
        case Some('{') =>
          val close = alt.indexOf('}', j)
          if (close < 0) j + 1 else close + 1
        case Some(_) => j + 1
        case None => j
      }
      while (i < alt.length && !bail) {
        val c = alt(i)
        c match {
          case '\\' if i + 1 < alt.length =>
            val n = alt(i + 1)
            val isClassEscape = n.isLetterOrDigit // \d \w \s \b \1 …
            i += 2
            val q = quantAfter(i)
            if (isClassEscape || q.isDefined) {
              // unknown/optional char: break the run; for '+' the
              // single literal char is still required once
              if (!isClassEscape && q.contains('+'))
                branches = branches.map(b => flush(B(b.frags, b.cur + n)))
              else branches = branches.map(flush)
              i = skipQuant(i)
            } else branches = branches.map(b => B(b.frags, b.cur + n))
          case '.' | '[' =>
            if (c == '[') {
              var j = i + 1
              if (j < alt.length && alt(j) == '^') j += 1
              if (j < alt.length && alt(j) == ']') j += 1 // literal ] first
              while (j < alt.length && alt(j) != ']') {
                if (alt(j) == '\\') j += 1
                j += 1
              }
              i = j + 1
            } else i += 1
            branches = branches.map(flush)
            i = skipQuant(i)
          case '(' =>
            // class-aware boundary scan: a ')' or '(' inside [...] is a
            // literal, not a group delimiter (ADVICE r15 — '([)]abc)'
            // must not end the group at the class's ')', which would
            // leave ']abc' parsed as required literal text)
            var j = i + 1; var depth = 1; var cls = false
            while (j < alt.length && depth > 0) {
              if (alt(j) == '\\') j += 1
              else if (cls) { if (alt(j) == ']') cls = false }
              else if (alt(j) == '[') cls = true
              else if (alt(j) == '(') depth += 1
              else if (alt(j) == ')') depth -= 1
              j += 1
            }
            if (depth > 0) bail = true // unbalanced '(' — not a valid split
            val rawBody = alt.substring(i + 1, j - 1)
            val body = if (rawBody.startsWith("?:")) rawBody.drop(2) else rawBody
            i = j
            val q = quantAfter(i)
            i = skipQuant(i)
            val alts = body.split("\\|", -1).toSeq
            val pureLiterals = alts.nonEmpty && alts.forall(a =>
              a.nonEmpty && !a.exists("\\()[].*+?{}^$|".contains(_)))
            val wouldBlowUp = branches.size * alts.size > maxBranches
            if (!pureLiterals || wouldBlowUp || q.contains('?') ||
                q.contains('*') || q.contains('{'))
              branches = branches.map(flush) // unknown/optional content
            else if (q.contains('+'))
              // some alt occurs, but repetition breaks contiguity on
              // both sides — each alt is a standalone fragment
              branches = branches.flatMap(b =>
                alts.map(a => B(flush(b).frags :+ a, "")))
            else
              branches = branches.flatMap(b => alts.map(a => B(b.frags, b.cur + a)))
          case '*' | '?' => // applies to the previous literal char
            branches = branches.map(b =>
              flush(if (b.cur.nonEmpty) B(b.frags, b.cur.dropRight(1)) else b))
            i += 1
          case '{' =>
            val close = alt.indexOf('}', i)
            branches = branches.map(b =>
              flush(if (b.cur.nonEmpty) B(b.frags, b.cur.dropRight(1)) else b))
            i = if (close < 0) i + 1 else close + 1
          case '+' => // previous char required once; run breaks after it
            branches = branches.map(flush)
            i += 1
          case '^' | '$' => i += 1 // anchors constrain position, not content
          case ')' => branches = branches.map(flush); i += 1 // unbalanced: unknown
          case '|' => bail = true // a class-aware splitTop left no top-level '|'
          case _ =>
            branches = branches.map(b => B(b.frags, b.cur + c))
            i += 1
        }
      }
      if (bail) None
      else Some(branches.map(b => flush(b).frags.filter(_.length >= 3)))
    }
    val parsed = splitTop(pattern).map(parseAlt)
    if (parsed.exists(_.isEmpty)) return None
    val all = parsed.flatMap(_.get)
    if (all.exists(_.isEmpty)) None else Some(all.map(_.toSeq))
  }

  /** REGEX search served from the stored index — the Cox-2012 serve:
    * each pattern compiles ([[requiredLiterals]]) to OR-over-branches
    * of AND-over-required-trigrams; candidates come from intersecting
    * the rarest-`rareK` posting lists per branch (by stored df, the
    * [[search]] refinement) and unioning branches; only candidates pay
    * the exact `rlike` verify. A pattern the compiler cannot prune
    * (no ≥ 3-char required literal on some branch) falls back to the
    * honest full scan FOR THAT PATTERN ALONE — declared cost, not a
    * silent wrong answer. Returns (query, doc_id) for every document
    * whose text matches the regex anywhere (Spark RLIKE ≡ DuckDB
    * regexp_matches partial-match semantics). */
  def regexSearch(spark: SparkSession, path: String, patterns: Seq[String],
                  docs: DataFrame, rareK: Int = 4): DataFrame = {
    import spark.implicits._
    val postings = UpsertStore.read(spark, s"$path").getOrElse(
      sys.error(s"no trigram postings at $path — build first"))
    val dfStore = UpsertStore.read(spark, s"${path}__df").getOrElse(
      sys.error(s"no trigram df store at $path — build first"))
    val compiled = patterns.map(p => p -> requiredLiterals(p))
    // (query, branch, gram): the DISTINCT required trigrams per branch
    val need = compiled.flatMap {
      case (p, Some(branches)) => branches.zipWithIndex.flatMap {
        case (frags, bi) => frags.flatMap(_.sliding(3)).distinct
          .map(g => (p, bi, g))
      }
      case (_, None) => Seq.empty
    }
    val candIdx =
      if (need.isEmpty) spark.emptyDataFrame
        .withColumn("query", lit("")).withColumn("doc_id", lit(0L))
        .select("query", "doc_id").limit(0)
      else {
        val pg = need.toDF("query", "branch", "gram")
        val rankedAll = Distributed.groupedRowNumber(
          pg.join(dfStore, Seq("gram"), "left")
            .select(col("query"), col("branch"), col("gram"),
              coalesce(col("df"), lit(0L)).as("df")),
          Seq("query", "branch"), Seq("df", "gram"), "rk")
        val nsel = rankedAll.groupBy("query", "branch")
          .agg(least(count(lit(1)), lit(rareK)).cast("long").as("nsel"))
        val sel = rankedAll.filter(col("rk") <= rareK)
          .select("query", "branch", "gram")
        sel.join(postings, Seq("gram"))
          .groupBy("query", "branch", "doc_id").agg(count(lit(1)).as("hits"))
          .join(broadcast(nsel), Seq("query", "branch"))
          .filter(col("hits") === col("nsel"))
          .select("query", "doc_id").distinct()
      }
    // exact verify on candidates: a LITERAL rlike per driver-known
    // pattern, OR-chained behind a query-name guard — each regex
    // compiles once per task (codegen hoists foldable patterns) where
    // a column-valued rlike(text, query) would re-compile per ROW, a
    // constant-factor tax that matters when the candidate set is
    // output-sized at corpus scale
    val indexable = compiled.collect { case (p, Some(_)) => p }
    val verified =
      if (indexable.isEmpty) candIdx
      else candIdx.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
        .filter(indexable.map(p =>
          col("query") === lit(p) && col("text").rlike(p)).reduce(_ || _))
        .select(col("query"), col("doc_id"))
    // unprunable patterns: the declared full-scan fallback — one
    // literal-rlike corpus filter per pattern (exactly what a raw
    // regex query would pay; the index just couldn't help), unioned
    // in with its pattern tag
    val scans = compiled.collect { case (p, None) =>
      docs.filter(col("text").rlike(p))
        .select(lit(p).as("query"), col("doc_id"))
    }
    scans.foldLeft(verified)(_ unionByName _)
  }

  /** Substring search over the stored index: `patterns` carries one
    * string column `query` (the literal pattern, length ≥ 3); `docs`
    * is the corpus relation the verify reads. Returns (query, doc_id)
    * for every document whose text CONTAINS the pattern. */
  def search(spark: SparkSession, path: String,
             patterns: DataFrame, docs: DataFrame, rareK: Int = 4): DataFrame = {
    val postings = UpsertStore.read(spark, s"$path").getOrElse(
      sys.error(s"no trigram postings at $path — build first"))
    val dfStore = UpsertStore.read(spark, s"${path}__df").getOrElse(
      sys.error(s"no trigram df store at $path — build first"))
    val pg = patterns.select(col("query"),
        explode(expr(
          "transform(sequence(1, greatest(length(query) - 2, 0)), i -> substring(query, i, 3))"))
          .as("gram"))
      .distinct()
    // rarest-K pattern grams by stored df; an unseen gram (df null →
    // 0) sorts first and correctly empties the candidate set
    val rankedAll = Distributed.groupedRowNumber(
      pg.join(dfStore, Seq("gram"), "left")
        .select(col("query"), col("gram"), coalesce(col("df"), lit(0L)).as("df")),
      Seq("query"), Seq("df", "gram"), "rk")
    val nsel = rankedAll.groupBy("query")
      .agg(least(count(lit(1)), lit(rareK)).cast("long").as("nsel"))
    val sel = rankedAll.filter(col("rk") <= rareK).select("query", "gram")
    // candidates: docs holding ALL selected grams (count == nsel)
    val cand = sel.join(postings, Seq("gram"))
      .groupBy("query", "doc_id").agg(count(lit(1)).as("hits"))
      .join(broadcast(nsel), Seq("query"))
      .filter(col("hits") === col("nsel"))
      .select("query", "doc_id")
    // exact verify on candidates only
    cand.join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .filter(col("text").contains(col("query")))
      .select(col("query"), col("doc_id"))
  }
}
