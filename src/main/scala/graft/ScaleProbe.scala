package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: replicates a scale-factor directory K× with
  * key-offsetting (unique keys stay unique; text/embedding content
  * repeats — realistic duplicate clusters for the dedup operators) and
  * times headline queries at 1× vs K×. A plan whose runtime grows
  * ≫ K× has a nonlinearity that would bite harder at 100 TB.
  *
  * Usage: `sbt "runMain graft.ScaleProbe <sfDir> <K> <workDir>"`.
  */
object ScaleProbe {
  // per-table key columns to offset so replicas don't collide
  private val offsetCols: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"),
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  // foreign keys must shift with their referenced table's key space
  private val fkCols: Map[String, Seq[(String, String)]] = Map(
    "orders" -> Seq("o_custkey" -> "customer"),
    "lineitem" -> Seq("l_partkey" -> "part", "l_suppkey" -> "supplier"))

  private def spanOf(df: DataFrame, c: String): Long =
    df.agg(max(col(c))).head().getLong(0) + 1L

  def replicate(spark: SparkSession, srcDir: String, k: Int, outDir: String): Unit = {
    Tables.all.foreach { t =>
      val base = Tables.load(spark, srcDir, t)
      val out =
        if (!offsetCols.contains(t)) base // region/nation: shared dims
        else {
          val keySpans = (offsetCols(t).filter(c => base.schema(c).dataType ==
              org.apache.spark.sql.types.LongType) ++
            fkCols.getOrElse(t, Seq.empty).map(_._1))
            .distinct
          val spans: Map[String, Long] = keySpans.map {
            case c if fkCols.getOrElse(t, Seq.empty).exists(_._1 == c) =>
              val ref = fkCols(t).find(_._1 == c).get._2
              c -> spanOf(Tables.load(spark, srcDir, ref),
                offsetCols(ref).head)
            case c => c -> spanOf(base, c)
          }.toMap
          (0 until k).map { i =>
            spans.foldLeft(base) { case (df, (c, span)) =>
              df.withColumn(c, col(c) + lit(i.toLong * span))
            }
          }.reduce(_ unionByName _)
        }
      out.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$t.parquet")
    }
  }

  private val headline = Seq(
    "q01_pricing_summary", "q04_revenue_by_region", "q08_customer_running_total",
    "q30_asof_last_signup", "q45_dedup_exact", "q46_dedup_ngram_jaccard",
    "q47_dedup_minhash", "q50_ann_bruteforce", "q55_ann_ivf")

  private def time(spark: SparkSession, name: String, dir: String): Double = {
    val fn = SparkEntry.queries(name)
    fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
    val t0 = System.nanoTime()
    fn(spark, dir).write.format("noop").mode("overwrite").save()
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, kStr, workDir) = args
    val k = kStr.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-scale-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    System.err.println(s"[scale] replicating $srcDir x$k -> $workDir")
    replicate(spark, srcDir, k, workDir)

    val rows = headline.map { q =>
      val t1 = time(spark, q, srcDir)
      val tk = time(spark, q, workDir)
      val ratio = tk / t1
      System.err.println(f"[scale] $q%-28s 1x=${t1}%6.2fs ${k}x=${tk}%7.2fs ratio=${ratio}%5.1f")
      s""""$q":{"t1":$t1,"tk":$tk,"ratio":$ratio}"""
    }
    println(s"""{"metric":"scale_probe","k":$k,"queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
