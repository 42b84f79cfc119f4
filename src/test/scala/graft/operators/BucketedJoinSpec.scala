package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Bucketing = co-located joins (build-brief "Partitioning & shuffle"):
  * two tables bucketed on the join key let sort-merge join read both
  * sides shuffle-free. Verified on the actual physical plan.
  */
class BucketedJoinSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark

  test("join of co-bucketed tables plans without a shuffle exchange") {
    val sf = SharedSpark.sf0001
    Tables.orders(spark, sf).write
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("orders_b")
    Tables.customer(spark, sf).write
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("customer_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          spark.table("orders_b")("o_custkey") === spark.table("customer_b")("c_custkey"))
      val n = joined.count()
      assert(n > 0)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
