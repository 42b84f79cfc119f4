package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{Analytics, AsOf, CrawlDay, Dedup, DocScore, MoreRelational, Multimodal, Pipeline, Relational, Retrieval, Similarity, Takedown, TextAnalysis, Warehouse, Windows}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every declared capability is a [[QueryDef]]: a Spark-first DataFrame
  * program plus, when SQL-expressible, a DuckDB oracle query the driver
  * replays over the same parquet tables (CORRECTNESS gate). Operators
  * with custom expressions / approximation (minhash, LSH, multimodal)
  * are rows-only here and pinned by ScalaTest specs instead.
  */
object SparkEntry {

  val allQueries: Seq[QueryDef] =
    Relational.all ++ MoreRelational.all ++ AsOf.all ++ Windows.all ++
      TextAnalysis.all ++ Dedup.all ++ Similarity.all ++ Multimodal.all ++
      Pipeline.all ++ Warehouse.all ++ Retrieval.all ++ Analytics.all ++
      DocScore.all ++ CrawlDay.all ++ Takedown.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01PricingSummary.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted entries → rows-only check. */
  def oracleSql: Map[String, String] =
    allQueries.collect { case QueryDef(n, _, Some(sql)) => n -> sql }.toMap

  /** Py4J-friendly bridge (static forwarders, no Scala collections in
    * the signature) — the PySpark entry point (`src/main/python/
    * graft_pyspark.py`) runs declared queries through these, so Python
    * callers drive the SAME engine, mirroring the reference's
    * three-language surface (kafka_to_kudu.py:7). */
  def runQuery(spark: SparkSession, name: String, dataDir: String): DataFrame =
    queries.getOrElse(name,
      sys.error(s"unknown query '$name'; see queryNames()")) (spark, dataDir)

  /** All declared query names, Java-array-shaped for Py4J. */
  def queryNames: Array[String] = allQueries.map(_.name).toArray
}
