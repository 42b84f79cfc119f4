package graft

import org.apache.spark.sql.SparkSession

/** Focused per-query profiler: times the named declared queries
  * (median of 3 after one warm-up, same discipline as ScaleProbe) on
  * one data dir in a fresh JVM — the clean-measurement protocol from
  * SCALING.md without paying for the full 90-query bench.
  *
  * Usage: runMain graft.Profile <dataDir> <query> [<query> ...]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rows = names.map { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      val runs = Seq.fill(3) {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      System.err.println(f"[profile] $q%-28s median=${runs(1)}%6.2fs runs=${runs.map(r => f"$r%.2f").mkString(",")}")
      f""""$q":${runs(1)}%.3f"""
    }
    println(s"""{"metric":"profile","dir":"$dir","queries":{${rows.mkString(",")}}}""")
    spark.stop()
  }
}
