package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Properties of the deterministic KLL-style quantile sketch that the
  * q120 oracle can't see: the rank-error bound across hostile value
  * distributions and partitionings, weight conservation, and
  * serialization roundtrip. */
class QuantileSketchSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val ps = Seq(0.5, 0.9, 0.99)

  /** max |rank(est_p) − p·n| / n over the requested quantiles,
    * with rank measured two-sidedly (duplicate-safe). */
  private def worstRankError(values: Seq[Double], partitions: Int): Double = {
    val est = values.toDF("v").repartition(partitions)
      .agg(QuantileFunctions.quantile_sketch(col("v"), ps).as("e"))
      .head().getSeq[Double](0)
    val sorted = values.sorted
    val n = values.size
    ps.zip(est).map { case (p, e) =>
      val target = math.max(1L, math.ceil(p * n).toLong)
      val lo = sorted.count(_ < e) + 1 // first occupied rank
      val hi = sorted.count(_ <= e)    // last occupied rank
      val dist =
        if (target < lo) lo - target
        else if (target > hi) target - hi
        else 0L
      dist.toDouble / n
    }.max
  }

  test("rank error ≤ 5% across distributions and partitionings") {
    val rnd = new scala.util.Random(7)
    val cases: Seq[(String, Seq[Double])] = Seq(
      "uniform" -> Seq.fill(20000)(rnd.nextDouble() * 1e6),
      "zipf-ish heavy duplicates" -> Seq.fill(20000)(math.pow(2.0, rnd.nextInt(12)).toDouble),
      "all equal" -> Seq.fill(5000)(42.0),
      "sorted ascending" -> (1 to 20000).map(_.toDouble),
      "two clusters" -> (Seq.fill(10000)(1.0) ++ Seq.fill(10000)(1e9))
    )
    for ((label, vs) <- cases; parts <- Seq(1, 7, 32)) {
      val err = worstRankError(vs, parts)
      assert(err <= 0.05, f"$label/$parts partitions: rank error $err%.4f > 0.05")
    }
  }

  test("weight conservation: n survives compaction and merge exactly") {
    val s = new KllSketch(16)
    (1 to 12345).foreach(i => s.update(i.toDouble))
    assert(s.n == 12345)
    val o = new KllSketch(16)
    (1 to 999).foreach(i => o.update(i.toDouble))
    s.mergeWith(o)
    assert(s.n == 13344)
    val kept = s.levels.zipWithIndex.map { case (lv, l) => lv.size.toLong << l }.sum
    assert(kept == 13344, s"kept weight $kept != n — compaction lost/duplicated weight")
  }

  test("two-batch serialize-merge (the q133 store lifecycle) stays within the bound") {
    val rnd = new scala.util.Random(23)
    val a = Seq.fill(8000)(rnd.nextDouble() * 1e5)
    val b = Seq.fill(12000)(rnd.nextDouble() * 1e5 + 5e4) // shifted delta batch
    def bytesOf(vs: Seq[Double]) = vs.toDF("v").repartition(5)
      .agg(QuantileFunctions.quantile_sketch_bytes(col("v")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val merged = KllSketch.deserialize(bytesOf(a))
      .mergeWith(KllSketch.deserialize(bytesOf(b)))
    assert(merged.n == 20000, "merge must conserve total weight")
    val sorted = (a ++ b).sorted
    val errs = ps.zip(merged.estimates(ps.toArray)).map { case (p, e) =>
      val target = math.max(1L, math.ceil(p * 20000).toLong)
      val lo = sorted.count(_ < e) + 1; val hi = sorted.count(_ <= e)
      (if (target < lo) lo - target else if (target > hi) target - hi else 0L) / 20000.0
    }
    assert(errs.forall(_ <= 0.05), s"merged-store rank errors $errs exceed 5%")
  }

  test("quantile_sketch_merge: distributed fold of serialized sketches is weight-exact and bound-honest") {
    // the VERDICT r11 #2 primitive: per-partition sketch bytes folded
    // back together by the binary-input aggregate, vs a one-shot
    // sketch over the raw values — same weight, same error contract
    val rnd = new scala.util.Random(41)
    val values = Seq.fill(20000)(rnd.nextDouble() * 1e6)
    val df = values.zipWithIndex
      .map { case (v, i) => (i % 5, i % 13, v) }.toDF("g", "p", "v")
    val parts = df.groupBy("g", "p")
      .agg(QuantileFunctions.quantile_sketch_bytes(col("v")).as("sk"))
    val merged = parts.groupBy("g")
      .agg(QuantileFunctions.quantile_sketch_merge(col("sk")).as("sk"))
      .collect().map(r => r.getInt(0) -> KllSketch.deserialize(r.getAs[Array[Byte]](1)))
      .toMap
    val byGroup = values.zipWithIndex.groupBy(_._2 % 5)
      .view.mapValues(_.map(_._1).sorted).toMap
    for ((g, sk) <- merged) {
      assert(sk.n == byGroup(g).size, s"group $g: weight ${sk.n} != ${byGroup(g).size}")
      val sorted = byGroup(g); val n = sorted.size
      for ((p, e) <- ps.zip(sk.estimates(ps.toArray))) {
        val target = math.max(1L, math.ceil(p * n).toLong)
        val lo = sorted.count(_ < e) + 1; val hi = sorted.count(_ <= e)
        val dist = if (target < lo) lo - target else if (target > hi) target - hi else 0L
        assert(dist.toDouble / n <= 0.05, s"group $g p $p: rank error ${dist.toDouble / n}")
      }
    }
    // the merge agg partial-aggregates map-side like any native agg
    val plan = parts.groupBy("g")
      .agg(QuantileFunctions.quantile_sketch_merge(col("sk")).as("sk"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_quantile_sketch_merge"),
      s"no partial merge in plan:\n$plan")
  }

  test("kll_estimates expression decodes stored sketches in-plan (no collect)") {
    // pin the sketch BYTES once (re-running the lazy aggregate builds
    // a different — equally valid — sketch from another partial-merge
    // order), then compare the in-plan decode against the driver-side
    // decode of the exact same bytes
    val bytes = (1 to 9999).map(i => (i % 3, i.toDouble)).toDF("g", "v")
      .groupBy("g").agg(QuantileFunctions.quantile_sketch_bytes(col("v")).as("sk"))
      .collect().map(r => r.getInt(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val out = bytes.toSeq.toDF("g", "sk")
      .select(col("g"), QuantileFunctions.kll_estimates(col("sk"), ps).as("est"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for ((g, est) <- out)
      assert(est.toList ==
        KllSketch.deserialize(bytes(g)).estimates(ps.toArray).toList)
    // null sketch → null out (not a crash)
    val nullRow = Seq((1, Option.empty[Array[Byte]])).toDF("g", "sk")
      .select(QuantileFunctions.kll_estimates(col("sk"), ps).as("est")).head()
    assert(nullRow.isNullAt(0))
  }

  test("serialize/deserialize roundtrip preserves the summary bit-for-bit") {
    val s = new KllSketch(32)
    val rnd = new scala.util.Random(11)
    (1 to 5000).foreach(_ => s.update(rnd.nextDouble()))
    val r = KllSketch.deserialize(s.serialized)
    assert(r.n == s.n && r.cap == s.cap)
    assert(r.levels.map(_.toList) == s.levels.map(_.toList))
    assert(r.estimates(ps.toArray).toList == s.estimates(ps.toArray).toList)
  }

  test("NaN inputs are ignored, nulls skipped, empty group yields null") {
    val est = Seq(Some(1.0), None, Some(Double.NaN), Some(3.0), Some(2.0))
      .toDF("v")
      .agg(QuantileFunctions.quantile_sketch(col("v"), Seq(0.5)).as("e"))
      .head().getSeq[Double](0)
    assert(est.head == 2.0)
    val row = Seq.empty[Double].toDF("v")
      .agg(QuantileFunctions.quantile_sketch(col("v"), Seq(0.5)).as("e"))
      .head()
    assert(row.isNullAt(0), "empty input should yield null, not a crash")
  }

  test("map-side partial aggregation is planned (shuffle carries sketches, not rows)") {
    val df = (1 to 1000).map(i => (i % 3, i.toDouble)).toDF("g", "v")
      .groupBy("g").agg(QuantileFunctions.quantile_sketch(col("v"), ps).as("e"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("partial_quantile_sketch"),
      s"no partial aggregate in plan:\n$plan")
  }
}
