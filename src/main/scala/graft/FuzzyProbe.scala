package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The decorrelated k-sweep behind q140/q150's round-13 re-plan
  * (VERDICT r13 #3): measures the OLD sorted-neighborhood join (equi
  * on the block key alone, rank band filtered AFTER the join — every
  * probe iterates its whole block, an O(Σ|block|²) stream) against the
  * CURRENT offset-explode equi-join (each ranked row emits its W
  * successor ranks as join keys — W·n join rows, linear) on k=1 / 10 /
  * 30 DECORRELATED document replicas (per-replica char rotation: k
  * independent copies of the corpus's own duplicate structure, the
  * non-dup-dense replica a genuinely larger crawl looks like).
  *
  * The published reading lives in SCALING.md's round-13/14 section;
  * this main regenerates it.
  *
  * Usage: `sbt "runMain graft.FuzzyProbe <sfDir> <workDir>"`.
  */
object FuzzyProbe {

  /** documents-only decorrelated replica (the ScaleProbe rotation). */
  private def replicateDocs(spark: SparkSession, srcDir: String, k: Int,
                            out: String): Unit = {
    val base = Tables.documents(spark, srcDir)
    val span = base.agg(max(col("doc_id"))).head().getLong(0) + 1L
    (0 until k).map { i =>
      base.withColumn("doc_id", col("doc_id") + lit(i * span))
        .withColumn("text",
          translate(col("text"), ScaleProbe.rotSrc, ScaleProbe.rotDst(i)))
    }.reduce(_ unionByName _)
      .write.mode(SaveMode.Overwrite).parquet(s"$out/documents.parquet")
  }

  private def blocks(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang"),
      floor(col("n_chars") / 50.0).cast("long").as("bucket"),
      substring(col("text"), 1, 40).as("prefix"))

  /** The PRE-round-13 plan: block equi-join, rank band as post-filter. */
  private def oldPlan(spark: SparkSession, dir: String): DataFrame = {
    val n = spark.sparkContext.defaultParallelism * 2
    val w = Window.partitionBy("lang", "bucket").orderBy("prefix", "doc_id")
    val r = blocks(spark, dir).repartition(n, col("lang"), col("bucket"))
      .withColumn("rk", row_number().over(w))
    val a = r.select(col("doc_id").as("ida"), col("lang"), col("bucket"),
      col("prefix").as("pa"), col("rk").as("rka"))
    val c = r.select(col("doc_id").as("idb"), col("lang"), col("bucket"),
      col("prefix").as("pb"), col("rk").as("rkb"))
    a.join(c.hint("shuffle_hash"), Seq("lang", "bucket"))
      .filter(col("rkb") > col("rka") && col("rkb") <= col("rka") + 5)
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .filter(col("dist") <= 20)
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("dist"))
  }

  /** The CURRENT plan (q140 minus the final presentation sort). */
  private def newPlan(spark: SparkSession, dir: String): DataFrame = {
    val n = spark.sparkContext.defaultParallelism * 2
    val w = Window.partitionBy("lang", "bucket").orderBy("prefix", "doc_id")
    val r = blocks(spark, dir).repartition(n, col("lang"), col("bucket"))
      .withColumn("rk", row_number().over(w))
    val a = r.select(col("doc_id").as("ida"), col("lang"), col("bucket"),
      col("prefix").as("pa"), col("rk").as("rka"))
      .withColumn("rk", explode(expr("sequence(rka + 1, rka + 5)")))
    val c = r.select(col("doc_id").as("idb"), col("lang"), col("bucket"),
      col("prefix").as("pb"), col("rk"))
    a.join(c.hint("shuffle_hash"), Seq("lang", "bucket", "rk"))
      .withColumn("dist", levenshtein(col("pa"), col("pb")).cast("long"))
      .filter(col("dist") <= 20)
      .select(least(col("ida"), col("idb")).as("doc_a"),
        greatest(col("ida"), col("idb")).as("doc_b"), col("dist"))
  }

  private def time(df: => DataFrame): Double = {
    df.write.format("noop").mode("overwrite").save() // warm
    Seq.fill(3) {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }.sorted.apply(1)
  }

  def main(args: Array[String]): Unit = {
    val Array(srcDir, workDir) = args
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-fuzzy-probe")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the ScaleProbe scan-sizing discipline (see its scaladoc)
      .config("spark.sql.files.maxPartitionBytes", (128 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (4 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ks = Seq(1, 10, 30)
    val dirs = ks.map { k =>
      val d = if (k == 1) srcDir else s"$workDir/x$k"
      if (k > 1) {
        System.err.println(s"[fuzzy] replicating documents x$k (decorrelated) -> $d")
        replicateDocs(spark, srcDir, k, d)
      }
      k -> d
    }
    val cells = for {
      (label, plan) <- Seq("old" -> (oldPlan _), "new" -> (newPlan _))
      (k, d) <- dirs
    } yield {
      val t = time(plan(spark, d))
      System.err.println(f"[fuzzy] $label%-4s k=$k%-3d ${t}%8.2f s")
      s""""${label}_k$k":$t"""
    }
    println(s"""{"metric":"fuzzy_k_probe",${cells.mkString(",")}}""")
    spark.stop()
  }
}
