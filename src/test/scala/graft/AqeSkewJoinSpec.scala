package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Proves the runtime skew path: a join with one hot key makes AQE's
  * OptimizeSkewedJoin split the oversized partition into parallel
  * sub-joins (`skew=true` on the sort-merge join) — the no-code-change
  * answer to skewed 100 TB joins, complementing the explicit salting
  * operator (q26) for aggregations. Thresholds are lowered so the
  * ~MB-scale test partition trips the same code path a multi-GB
  * partition would in production.
  */
class AqeSkewJoinSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("AQE splits the hot partition of a skewed sort-merge join") {
    val conf = Map(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      // left: key 0 is ~500x hotter than the rest; right: uniform
      val left = spark.range(200000)
        .select(when($"id" < 150000, 0L).otherwise($"id" % 100 + 1).as("k"),
          concat(lit("payload-"), $"id").as("pad"))
      val right = spark.range(101).select($"id".as("k"), ($"id" * 2).as("v"))
      // a global agg downstream: a groupBy on the JOIN key would forbid
      // the split (it requires the join's hash distribution intact);
      // max(length(pad)) keeps the payload flowing through the shuffle
      // so partition sizes reflect real row weight
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), max(length($"pad")).as("w"))
      // collect() (not head(), which runs a separate limited execution)
      // so THIS queryExecution carries the final adaptive plan
      assert(joined.collect().head.getLong(0) == 200000L)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed join:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
