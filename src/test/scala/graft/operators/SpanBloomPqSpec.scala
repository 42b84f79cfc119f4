package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Round-11 additions: duplicate-span detection (q117), bloom-prefiltered
  * contamination (q118), product-quantization ANN (q119). The driver's
  * oracle gate proves cross-engine equality; these pin the semantics the
  * oracle can't see — interval-merge correctness against a naive
  * recheck, the bloom probe's presence in the plan (the map-side-prune
  * claim), and the PQ pool's recall MARGIN (not just the reranked
  * output). */
class SpanBloomPqSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  val sf = SharedSpark.sf0001

  test("q117: duplicate-span output matches a naive driver-side recheck") {
    val W = 20
    val texts = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val toks = texts.map { case (id, t) =>
      id -> t.toLowerCase.split("\\s+").toSeq
    }.filter(_._2.size >= W)
    // every W-token window, globally counted (intra-doc repeats included)
    val occ = scala.collection.mutable.Map.empty[String, Int]
    for ((_, ts) <- toks; i <- 0 to ts.size - W)
      occ.updateWith(ts.slice(i, i + W).mkString(" "))(c => Some(c.getOrElse(0) + 1))
    val expected = toks.flatMap { case (id, ts) =>
      val hitStarts = (0 to ts.size - W)
        .filter(i => occ(ts.slice(i, i + W).mkString(" ")) >= 2)
      if (hitStarts.isEmpty) None
      else {
        // merge overlapping/adjacent [i, i+W-1] intervals
        val merged = hitStarts.foldLeft(List.empty[(Int, Int)]) {
          case (acc, i) =>
            val (s0, e0) = (i, i + W - 1)
            acc match {
              case (ps, pe) :: rest if s0 <= pe + 1 => (ps, math.max(pe, e0)) :: rest
              case _ => (s0, e0) :: acc
            }
        }
        val dupTokens = merged.map { case (a, b) => b - a + 1 }.sum
        Some(id -> ((merged.size.toLong, dupTokens.toLong,
          BigDecimal(dupTokens.toDouble / ts.size)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)))
      }
    }
    val got = Dedup.q117DuplicateSpans.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("dup_tokens"),
          r.getAs[Double]("dup_frac")))).toMap
    assert(got.keySet == expected.keySet,
      s"doc sets differ: only-got=${(got.keySet -- expected.keySet).take(3)} " +
        s"only-want=${(expected.keySet -- got.keySet).take(3)}")
    val diffs = expected.collect { case (k, v) if got(k) != v => (k, v, got(k)) }
    assert(diffs.isEmpty, s"first diffs: ${diffs.take(3).toSeq}")
    assert(got.nonEmpty, "corpus should contain duplicated spans")
  }

  test("q118: bloom prefilter ≡ q108 index scan, and the probe is map-side in the plan") {
    val want = Pipeline.q108ContaminationIndexed.fn(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val df = Pipeline.q118ContaminationBloom.fn(spark, sf)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "bloom-prefiltered scan diverged from the index scan")
    // the bloom probe must sit in the plan as a filter over a scalar
    // subquery (Spark's runtime-filter expression) — the shape that
    // prunes the train side BEFORE any exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), "bloom probe missing from physical plan")
    assert(plan.contains("Subquery") || plan.contains("subquery"),
      "bloom should be plan-resident (scalar subquery), not a driver constant")
  }

  test("dedup gate: re-ingest replay flags everything duplicate; bloom advances by OR-merge") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val path = graft.Scratch.dir("graft_dedup_gate_spec") + "/gate"
    val batch1 = docs.filter(col("doc_id") < 100)
    val batch2 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 200)
    val first = DedupGate.ensure(spark, batch1, path)
    assert(first.collect().forall(_.getAs[String]("status") == "new"),
      "distinct-text base batch must be all-new")
    // a batch of never-seen docs: all new, and the gate folds them in
    val fresh = DedupGate.gate(spark, batch2, path)
    assert(fresh.collect().forall(_.getAs[String]("status") == "new"))
    // REPLAY of the same batch (crash-retry shape): idempotent — each
    // doc resolves to ITSELF as canonical ('new', not a self-duplicate)
    val replay = DedupGate.gate(spark, batch2, path).collect()
    assert(replay.forall(r => r.getAs[String]("status") == "new" &&
      r.getAs[Long]("first_doc_id") == r.getAs[Long]("doc_id")),
      "replayed batch must be idempotent (self-canonical)")
    // RE-CRAWL under fresh ids: every doc must come back duplicate,
    // canonical = the ORIGINAL ingest id
    val recrawl = DedupGate.gate(spark,
      batch2.select((col("doc_id") + 5000000L).as("doc_id"), col("text")), path)
      .collect()
    assert(recrawl.forall(r => r.getAs[String]("status") == "duplicate" &&
      r.getAs[Long]("first_doc_id") == r.getAs[Long]("doc_id") - 5000000L),
      "re-crawled batch must resolve to the original ids as canonical")
    // the persisted bloom must now cover BOTH batches (OR-merge took)
    val bloomBytes = graft.streaming.UpsertStore.read(spark, s"${path}__bloom")
      .get.head().getAs[Array[Byte]]("bloom")
    val bf = org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytes))
    val keys = docs.filter(col("doc_id") < 200)
      .select(org.apache.spark.sql.functions.xxhash64(
        org.apache.spark.sql.functions.sha2(col("text"), 256)).as("bk"))
      .collect().map(_.getLong(0))
    assert(keys.forall(bf.mightContainLong),
      "stored bloom lost keys across the OR-merge — false negatives are forbidden")
  }

  test("q125: bloom-pruned star join ≡ plain join, probe sits in the fact scan stage") {
    import org.apache.spark.sql.functions.{col, count, lit, round, sum}
    val dim = Tables.orders(spark, sf)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val plain = Tables.lineitem(spark, sf)
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val df = Warehouse.q125BloomStarJoin.fn(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == plain, "bloom prefilter changed the join result")
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("might_contain"), "bloom probe missing from the fact side")
  }

  test("q124: funnel stages are consistent with a naive per-user event replay") {
    val events = Tables.events(spark, sf)
      .select("user_id", "event_type", "ts").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("event_type"),
        r.getAs[java.sql.Timestamp]("ts").getTime))
    val expected = events.groupBy(_._1).map { case (u, evs) =>
      val t1 = evs.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a => evs.filter(e => e._2 == "click" && e._3 > a).map(_._3).minOption)
      val t3 = t2.flatMap(b => evs.filter(e => e._2 == "purchase" && e._3 > b).map(_._3).minOption)
      u -> (if (t3.isDefined) 3L else if (t2.isDefined) 2L else if (t1.isDefined) 1L else 0L)
    }
    val got = Windows.q124Funnel.fn(spark, sf).collect()
      .map(r => r.getAs[Long]("user_id") -> r.getAs[Long]("reached_stage")).toMap
    assert(got == expected,
      s"first diffs: ${expected.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(3)}")
  }

  test("q128/q129: graph ops agree with hand-computed structure on the live corpus") {
    // triangles: every doc's count must equal C(k,2) over its co-members
    // in a clique — recheck naively from the emitted pair graph
    val pairs = PairGraph.pairGraph(spark, Tables.documents(spark, sf), sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val tri = Dedup.q128TriangleCount.fn(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naive = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val es = pairs.toSeq
    for ((a, b) <- es; (b2, c) <- es if b2 == b && pairs.contains((a, c))) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    assert(tri == naive.toMap, s"triangle counts diverged: got=$tri want=$naive")
    // pagerank: total rank mass is conserved (no dangling nodes in an
    // undirected graph), so the ranks must sum to ~1
    val ranks = Dedup.q129PageRank.fn(spark, sf).collect().map(_.getDouble(1))
    assert(ranks.nonEmpty && math.abs(ranks.sum - 1.0) < 1e-3,
      s"rank mass ${ranks.sum} != 1")
  }

  test("q119: PQ rerank equals brute force, with ADC pool margin ≥ 2×") {
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("rk"),
        r.getAs[Long]("neighbor_id"))).toSet
    assert(key(Similarity.q119AnnPq.fn(spark, sf)) ==
      key(Similarity.q50AnnBruteForce.fn(spark, sf)),
      "PQ output diverged from brute force — recall gate broken")
    // margin: the true top-3 must sit in the FIRST HALF of the ADC
    // pool (C=256), so recall survives corpus drift well before the
    // driver's oracle would catch it
    val pool = Similarity.pqAdcPool(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")) ->
        r.getAs[Int]("pool_rank")).toMap
    val truth = Similarity.q50AnnBruteForce.fn(spark, sf).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    val worst = truth.map(t => pool.getOrElse(t, Int.MaxValue)).max
    assert(worst <= 128, s"ADC pool margin eroded: worst true-neighbor rank $worst > 128")
  }
}
