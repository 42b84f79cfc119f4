package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** [[Distributed]] prefix aggregates: numerically identical to the
  * single-task-per-group window they replace, while spreading a single
  * group over the full partition count (the q60/q80/q33 scale fix). */
class DistributedSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def sample = {
    // skewed groups: one giant stratum (the 100 TB English corpus shape)
    val rnd = new scala.util.Random(11)
    (0 until 5000).map { i =>
      val g = if (rnd.nextDouble() < 0.8) "en" else Seq("fr", "de", "es")(rnd.nextInt(3))
      (g, i.toLong, (rnd.nextInt(50) + 1).toLong)
    }.toDF("g", "k", "v")
  }

  test("groupedPrefixSum equals the per-group window cumsum") {
    val df = sample
    val naive = df.withColumn("cum", coalesce(
        sum("v").over(Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("g", "k", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val got = Distributed.groupedPrefixSum(df, Seq("g"), Seq("k"), "v", "cum")
      .select("g", "k", "cum")
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == naive)
  }

  test("groupedRowNumber: ranks are a 1..n permutation per group, non-decreasing in order col") {
    val df = sample
    val rows = Distributed.groupedRowNumber(df, Seq("g"), Seq("v"), "r")
      .select("g", "v", "r")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val byRank = rs.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1L to rs.length).toSeq, s"$g: ranks not 1..n")
      byRank.map(_._2).toSeq.sliding(2).foreach {
        case Seq(a, b) => assert(a <= b, s"$g: value order broken at rank boundary")
        case _ =>
      }
    }
  }

  test("null group values form a real group (window semantics, null-safe offset join)") {
    val df = Seq(
      (Option("en"), 1L, 5L), (Option.empty[String], 2L, 7L),
      (Option.empty[String], 3L, 2L), (Option("en"), 4L, 1L)
    ).toDF("g", "k", "v")
    val naive = df.withColumn("cum", coalesce(
        sum("v").over(Window.partitionBy("g").orderBy("k")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    val got = Distributed.groupedPrefixSum(df, Seq("g"), Seq("k"), "v", "cum")
      .collect().map(r => r.getLong(1) -> r.getLong(3)).toMap
    assert(got == naive, s"null-group rows diverged: got $got, want $naive")
    assert(got.size == 4, "null-group rows must not be dropped by the offset join")
  }

  test("fractional value columns are rejected loudly (long-carried running sum)") {
    val df = Seq(("a", 1L, 1.5)).toDF("g", "k", "v")
    val err = intercept[IllegalArgumentException](
      Distributed.groupedPrefixSum(df, Seq("g"), Seq("k"), "v", "cum"))
    assert(err.getMessage.contains("cast or scale"))
  }

  test("edge cases: empty input and single-row groups") {
    val empty = Seq.empty[(String, Long, Long)].toDF("g", "k", "v")
    assert(Distributed.groupedPrefixSum(empty, Seq("g"), Seq("k"), "v", "cum").count() == 0)
    assert(Distributed.groupedRowNumber(empty, Seq("g"), Seq("k"), "r").count() == 0)
    val singles = Seq(("a", 1L, 7L), ("b", 2L, 9L)).toDF("g", "k", "v")
    val cums = Distributed.groupedPrefixSum(singles, Seq("g"), Seq("k"), "v", "cum")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(cums == Map("a" -> 0L, "b" -> 0L)) // exclusive sum: first row = 0
    val rks = Distributed.groupedRowNumber(singles, Seq("g"), Seq("k"), "r")
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(rks == Map("a" -> 1L, "b" -> 1L))
  }

  test("a single group spreads across >1 range partition (no one-task funnel)") {
    val one = spark.range(10000).select(lit("en").as("g"), $"id".as("k"), lit(1L).as("v"))
    // AQE rightly coalesces this toy-sized shuffle to one partition by
    // SIZE; disable coalescing to observe the property that matters at
    // scale — RangePartitioner splits by KEY RANGE, never by group, so
    // a 100 TB single-language corpus spans all partitions
    val prev = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    val parts =
      try one.repartitionByRange(col("g"), col("k"))
        .select(spark_partition_id().as("pid"))
        .distinct().count()
      finally spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prev)
    assert(parts > 1, s"RangePartitioner put a single group in $parts partition(s)")
    // and the helper still computes the right global sum over it
    val last = Distributed.groupedPrefixSum(one, Seq("g"), Seq("k"), "v", "cum")
      .agg(max("cum")).head().getLong(0)
    assert(last == 9999L)
  }
}
