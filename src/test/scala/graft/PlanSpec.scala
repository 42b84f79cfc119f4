package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Relational, Similarity}

/** Physical-plan regression guards: the properties that make these
  * queries scale (pushdown, broadcast, map-side partial top-k,
  * per-partition TakeOrdered) must survive future edits. Plans are
  * inspected AFTER materialization so AQE has settled.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001

  private def finalPlan(q: QueryDef): String = {
    val df = q.fn(spark, sf)
    df.collect()
    df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode) +
      "\n" + df.queryExecution.executedPlan.toString
  }

  test("q01: shipdate filter is pushed into the parquet scan; agg is partial+final") {
    val p = finalPlan(Relational.q01PricingSummary)
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), "missing parquet pushdown")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final aggregation expected")
  }

  test("q04: dimension joins broadcast (no shuffle for nation/region)") {
    val p = finalPlan(Relational.q04RevenueByRegion)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      "dimension tables must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q09: top-k plans as TakeOrderedAndProject, not a global sort") {
    val p = finalPlan(Relational.q09TopOrders)
    assert(p.contains("TakeOrderedAndProject"), s"expected TakeOrderedAndProject")
  }

  test("q50: ANN top-k aggregates map-side (partial_top_k_by_score)") {
    val p = finalPlan(Similarity.q50AnnBruteForce)
    assert(p.contains("partial_top_k_by_score"), "heap aggregate must run partial")
    assert(p.contains("ObjectHashAggregate"))
  }

  test("q05: semi join stays a semi join (no row duplication risk)") {
    val p = finalPlan(Relational.q05SemiJoin)
    assert(p.contains("LeftSemi"), "EXISTS must plan as a semi join")
  }
}
