package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor: prints the formatted physical plan per declared query
  * and flags scale anti-patterns (missing pushdown, unexpected
  * cartesian products, non-broadcast dim joins). Dev tool — run:
  * `sbt "runMain graft.Explain <sfDir> [queryName...]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    SparkEntry.allQueries
      .filter(q => names.isEmpty || names.contains(q.name))
      .foreach { q =>
        try {
          val df = q.fn(spark, sfDir)
          df.collect() // materialize so AQE settles on the final plan
          val plan = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          // codegen spans show as "*(n)" in simple mode, not in formatted
    	  val simple = df.queryExecution.executedPlan.toString
          val flags = Seq(
            "CartesianProduct" -> plan.contains("CartesianProduct"),
            "NoWholeStageCodegen" -> !simple.contains("*("),
            "BroadcastNestedLoop" -> plan.contains("BroadcastNestedLoopJoin"))
            .collect { case (f, true) => f }
          println(s"\n########## ${q.name} ${if (flags.nonEmpty) flags.mkString("[", ",", "]") else ""}")
          println(plan)
        } catch {
          case e: Throwable => println(s"\n########## ${q.name} EXPLAIN FAILED: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
