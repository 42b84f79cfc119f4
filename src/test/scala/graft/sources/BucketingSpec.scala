package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Proves the bucketed-layout contract at the PLAN level: two tables
  * bucketed on the join key produce a sort-merge join with NO shuffle
  * exchange on either side — the co-located-join property that turns a
  * recurring 100 TB fact-fact join from a network shuffle into a local
  * merge. Broadcast is disabled for the assertion so the planner can't
  * sidestep the question at this test's data size.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sf0001

  test("bucketed co-located join: no ShuffleExchange on either side") {
    Layout.writeBucketed(Tables.orders(spark, sf), "orders_bucketed", 8, "o_custkey")
    Layout.writeBucketed(Tables.customer(spark, sf), "customer_bucketed", 8, "c_custkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_bucketed")
        .join(spark.table("customer_bucketed"), $"o_custkey" === $"c_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      // walk the FINAL adaptive plan tree — descending INTO query
      // stages (plain collect stops at stage boundaries): the join's
      // subtree must contain no shuffle (the only allowed exchange is
      // AFTER the join, for the groupBy)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
        case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
        case q: QueryStageExec => deep(q.plan)
        case other => other.children.flatMap(deep)
      })
      val all = deep(joined.queryExecution.executedPlan)
      val smjs = all.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      assert(smjs.nonEmpty, s"expected a sort-merge join:\n${all.head}")
      val shufflesUnderJoin = smjs.flatMap(deep).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shufflesUnderJoin.isEmpty,
        s"bucketed join must not shuffle its inputs:\n${all.head}")
      assert(smjs.head.toString.contains("Bucketed: true"),
        "scans must report bucketed reads")
      // and the result matches the unbucketed computation
      val expect = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_bucketed")
      spark.sql("DROP TABLE IF EXISTS customer_bucketed")
    }
  }
}
