package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TypedAndGeneratorSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("ShingleGenerator streams distinct n-grams (vs transform+explode reference)") {
    val df = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("x", "y")),            // < n -> nothing
      (3L, Seq("a", "b", "a", "b", "a", "b"))) // repeated shingles dedup
      .toDF("id", "toks")
    val got = df.select($"id", GeneratorFunctions.shingles($"toks", 3))
      .as[(Long, String)].collect().toSet
    assert(got == Set(
      (1L, "a b c"), (1L, "b c d"),
      (3L, "a b a"), (3L, "b a b")))
  }

  test("weightedMean typed Aggregator: grouped weighted average price by quantity") {
    val li = graft.Tables.lineitem(spark, SharedSpark.sf0001)
      .select($"l_returnflag", $"l_extendedprice", $"l_quantity")
    val typed = li.as[(String, Double, Double)]
      .groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(TypedAggregators.weightedMean.toColumn.name("wavg"))
      .collect().toMap
    // reference: sum(p*q)/sum(q) per flag via untyped API
    val ref = li.groupBy("l_returnflag")
      .agg((sum($"l_extendedprice" * $"l_quantity") / sum($"l_quantity")).as("wavg"))
      .as[(String, Double)].collect().toMap
    ref.foreach { case (k, v) =>
      assert(math.abs(typed(k) - v) < 1e-6, s"flag $k: typed=${typed(k)} ref=$v")
    }
  }

  test("weightedMean: empty/zero-weight safety") {
    val out = Seq((0.0, 0.0)).toDS()
      .groupByKey(_ => 1)
      .agg(TypedAggregators.weightedMean.toColumn)
      .collect()
    assert(out.head._2 == 0.0)
  }
}
