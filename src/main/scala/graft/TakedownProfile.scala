package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators._
import graft.streaming.UpsertStore

/** Per-stage profiler for q199's takedown-day composition (round 18 —
  * VERDICT r17 #4: "the takedown stages visible as the dominant term
  * in a Q159Profile-style breakdown"). Mirrors the declared query
  * stage for stage, timing bootstrap (curation + four index builds)
  * separately from the takedown path (retract propagation, kept-set
  * diff, index retract/extend) and the serves — the numbers behind
  * the q199 corpus-scope decision and SCALING.md's round-18 rows.
  * Accepts an optional corpus-fraction arg (e.g. `0.4`) to measure
  * the scoped shape. */
object TakedownProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val frac = args.drop(1).headOption.map(_.toDouble).getOrElse(1.0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]").appName("takedown-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[q199] $label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    import spark.implicits._
    val allDocs = Tables.documents(spark, dir).select("doc_id", "text")
    val cut = (allDocs.agg(max("doc_id")).head().getLong(0) * (frac * 10).toLong) / 10L
    val docs = (if (frac >= 1.0) allDocs else allDocs.filter(col("doc_id") <= cut))
      .localCheckpoint()
    System.err.println(s"[q199] corpus ${docs.count()} docs (frac $frac)")
    for (round <- 1 to 2) {
      System.err.println(s"--- round $round")
      val base = Scratch.dir("q199prof")
      val t0 = System.nanoTime()
      val mm = new graft.streaming.ManifestMaintainer(spark, dir, s"$base/manifest")
      t("boot: manifest bootstrap") { mm.bootstrap(docs) }
      val keptBefore = t("boot: kept join") {
        docs.join(mm.current.filter(col("keep")).select("doc_id"), Seq("doc_id"))
          .localCheckpoint()
      }
      t("boot: postings ensure") { PostingsIndex.ensure(spark, keptBefore, s"$base/postings") }
      t("boot: trigram build") { TrigramIndex.build(spark, keptBefore, s"$base/trigram") }
      t("boot: phrase build") { PhraseIndex.build(spark, keptBefore, s"$base/phrase") }
      val emb = Tables.embeddings(spark, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
      t("boot: ivfpq ensure") { IvfPqIndex.ensure(spark, emb, s"$base/ivfpq") }
      val bootSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val gone = t("td: takedown-set selection") {
        val d1 = docs.groupBy(sha2(col("text"), 256).as("h"))
          .agg(min("doc_id").as("keep_doc"), count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(min("keep_doc")).head()
        val facts = UpsertStore.read(spark, s"$base/manifest__facts").get
        val staged = facts.join(mm.clusterM.current, Seq("doc_id"), "left")
          .select(col("doc_id"), col("is_exact_dup"), col("verdict"),
            coalesce(col("label"), col("doc_id")).as("cluster_id"))
        val d2 = staged.filter(!col("is_exact_dup") && col("verdict") === "keep")
          .groupBy("cluster_id").agg(min("doc_id").as("rep"), count(lit(1)).as("c"))
          .filter(col("c") > 1).agg(min("rep")).head()
        val ids = (Seq(10L, 11L) ++
          (if (d1.isNullAt(0)) Nil else Seq(d1.getLong(0))) ++
          (if (d2.isNullAt(0)) Nil else Seq(d2.getLong(0)))).distinct
        docs.filter(col("doc_id").isin(ids: _*)).localCheckpoint()
      }
      t("td: manifest retract") { mm.retract(gone, txnId = 1L) }
      val (removals, additions) = t("td: kept-set diff") {
        val keptAfter = docs
          .join(mm.current.filter(col("keep")).select("doc_id"), Seq("doc_id"))
          .localCheckpoint()
        (keptBefore.join(keptAfter.select("doc_id"), Seq("doc_id"), "left_anti")
           .localCheckpoint(),
         keptAfter.join(keptBefore.select("doc_id"), Seq("doc_id"), "left_anti")
           .localCheckpoint())
      }
      t("td: postings retract") { PostingsIndex.retract(spark, removals, s"$base/postings", Some(1L)) }
      t("td: trigram retract") { TrigramIndex.retract(spark, removals, s"$base/trigram", Some(1L)) }
      t("td: phrase retract") { PhraseIndex.retract(spark, removals, s"$base/phrase", Some(1L)) }
      if (!additions.isEmpty) {
        t("td: postings extend") { PostingsIndex.extend(spark, additions, s"$base/postings", Some(2L)) }
        t("td: trigram extend") { TrigramIndex.extend(spark, additions, s"$base/trigram", Some(2L)) }
        t("td: phrase extend") { PhraseIndex.extend(spark, additions, s"$base/phrase", Some(2L)) }
      }
      t("td: ivfpq retract") {
        IvfPqIndex.retract(spark, emb.filter(col("vec_id").isin(7L, 8L, 9L)),
          s"$base/ivfpq", Some(1L))
      }
      val tdSec = (System.nanoTime() - t1) / 1e9
      val t2 = System.nanoTime()
      val keptAfter = docs
        .join(mm.current.filter(col("keep")).select("doc_id"), Seq("doc_id"))
        .localCheckpoint()
      t("serve: manifest+bm25") {
        val queries = keptAfter.filter(col("doc_id") < 3)
          .select(col("doc_id").as("query_id"),
            explode(TextAnalysis.tokens(col("text"))).as("term")).distinct()
        PostingsIndex.search(spark, s"$base/postings", queries)
          .filter(col("query_id") =!= col("doc_id")).count()
      }
      t("serve: substr+phrase") {
        TrigramIndex.search(spark, s"$base/trigram",
          Seq("key agg row", "zz missing zz").toDF("query"), keptAfter).count()
        PhraseIndex.search(spark, s"$base/phrase",
          Seq("key agg row", "zz missing zz").toDF("query")).count()
      }
      t("serve: ann") {
        val remEmb = emb.filter(!col("vec_id").isin(7L, 8L, 9L))
        IvfPqIndex.search(spark, remEmb, s"$base/ivfpq", col("vec_id") < 5).count()
      }
      val serveSec = (System.nanoTime() - t2) / 1e9
      System.err.println(f"[q199] TOTALS boot=$bootSec%.2f td=$tdSec%.2f serve=$serveSec%.2f")
    }
    spark.stop()
  }
}
