package graft

import org.apache.spark.sql.SparkSession

/** Throwaway round-15 debug harness (not part of the library; deleted
  * before the round's final commit). */
object DebugR15 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .appName("debug-r15")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val r179 = operators.Retrieval.q179CatalogTrigramSql.fn(spark, d)
    println("q179 rows: " + r179.count())
    r179.show(10, false)
    val r180 = operators.Dedup.q180CatalogSimhashSql.fn(spark, d)
    println("q180 rows: " + r180.count())
    r180.show(10, false)
    spark.stop()
  }
}
