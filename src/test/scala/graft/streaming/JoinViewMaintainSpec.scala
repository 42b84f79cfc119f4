package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The incremental materialized join view ([[JoinViewMaintainer]],
  * q194). Pinned: partial bootstrap + both delta paths ≡ the full
  * join (late dimension rows materialize the orders that waited for
  * them, including ones from an earlier fact delta); UPDATE semantics
  * on both sides (a re-sent order overwrites its view row; a re-sent
  * customer rewrites every one of its orders' rows); unledgered
  * replay converges on content; ledgered replay is a version-level
  * no-op; foreachBatch + checkpoint restart on the fact stream. */
class JoinViewMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._
  import JoinViewMaintainSpec._

  private def ordersDf(rows: (Long, Long, Double)*) =
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice")
  private def custDf(rows: (Long, String, String)*) =
    rows.toDF("c_custkey", "c_name", "c_mktsegment")

  private def viewSnap(m: JoinViewMaintainer): Set[(Long, Long, Double, String, String)] =
    m.current.as[(Long, Long, Double, String, String)].collect().toSet

  test("partial bootstrap + both delta paths converge to the full join; updates rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jv").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view")
    // customers 1,2 known at bootstrap; customer 3 arrives late
    m.bootstrap(ordersDf((10L, 1L, 5.0), (11L, 2L, 6.0), (12L, 3L, 7.0)),
      custDf((1L, "ann", "auto"), (2L, "bob", "bike")))
    assert(viewSnap(m) == Set((10L, 1L, 5.0, "ann", "auto"),
      (11L, 2L, 6.0, "bob", "bike")),
      "order 12 references an absent customer — not a view row yet")

    // fact delta: order 13 joins a known customer, order 14 waits on 3
    m.ingestLeft(ordersDf((13L, 1L, 8.0), (14L, 3L, 9.0)))
    assert(viewSnap(m).map(_._1) == Set(10L, 11L, 13L),
      "only the known-customer order materializes from the fact delta")

    // late dimension row: customer 3 materializes orders 12 AND 14 —
    // one from bootstrap, one from the earlier fact delta
    m.ingestRight(custDf((3L, "cal", "coal")))
    val full = Set((10L, 1L, 5.0, "ann", "auto"), (11L, 2L, 6.0, "bob", "bike"),
      (12L, 3L, 7.0, "cal", "coal"), (13L, 1L, 8.0, "ann", "auto"),
      (14L, 3L, 9.0, "cal", "coal"))
    assert(viewSnap(m) == full, s"late dimension row: ${viewSnap(m)}")

    // UPDATE semantics: a re-sent order overwrites its row
    m.ingestLeft(ordersDf((13L, 1L, 80.0)))
    assert(viewSnap(m).contains((13L, 1L, 80.0, "ann", "auto")))
    // a re-sent customer rewrites ALL its orders' rows
    m.ingestRight(custDf((1L, "ann2", "auto")))
    assert(viewSnap(m).filter(_._2 == 1L).map(_._4) == Set("ann2"),
      "dimension update must fan out to every referencing view row")

    // unledgered replay converges on content
    val before = viewSnap(m)
    m.ingestRight(custDf((1L, "ann2", "auto")))
    assert(viewSnap(m) == before, "replayed dimension batch drifted the view")
    // ledgered replay: version-level no-op
    m.ingestLeft(ordersDf((15L, 2L, 1.0)), Some(7L))
    val v = UpsertStore.latestVersion(spark, s"$dir/view")
    m.ingestLeft(ordersDf((15L, 2L, 1.0)), Some(7L))
    assert(UpsertStore.latestVersion(spark, s"$dir/view") == v,
      "ledgered replay advanced the view store")
  }

  test("ADVICE r16: a key-repeating batch feeds ONE deduped frame to store and view") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jv-dup").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view")
    m.bootstrap(ordersDf(), custDf((1L, "ann", "auto")))
    // the batch repeats key 20: the dedup winner (greatest value
    // tuple → custkey 9) references an ABSENT customer, while the
    // losing duplicate would join customer 1 — the view must follow
    // the stored winner, i.e. materialize NOTHING for key 20
    m.ingestLeft(ordersDf((20L, 9L, 5.0), (20L, 1L, 99.0)))
    val fact = UpsertStore.read(spark, s"$dir/view__left").get
      .as[(Long, Long, Double)].collect().toSet
    assert(fact == Set((20L, 9L, 5.0)), s"fact store kept the wrong winner: $fact")
    assert(viewSnap(m).isEmpty,
      "view materialized the losing duplicate — store and view winners diverged")
    // the winner's customer arrives → the stored winner materializes
    m.ingestRight(custDf((9L, "zoe", "zinc")))
    assert(viewSnap(m) == Set((20L, 9L, 5.0, "zoe", "zinc")))
    // bootstrap with duplicate-keyed input dedups instead of writing
    // duplicate-key rows into the stores (the bridge-input hazard)
    val m2 = new JoinViewMaintainer(spark, s"$dir/view2")
    m2.bootstrap(ordersDf((30L, 1L, 1.0), (30L, 2L, 2.0)),
      custDf((1L, "ann", "auto"), (2L, "bob", "bike")))
    assert(UpsertStore.read(spark, s"$dir/view2__left").get.count() == 1,
      "duplicate-keyed bootstrap wrote duplicate fact rows")
    assert(viewSnap(m2) == Set((30L, 2L, 2.0, "bob", "bike")),
      "bootstrap view winner must match the deduped stored winner")
  }

  test("ADVICE r16: an FK re-point to an absent dimension key retracts the stale view row") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jv-repoint").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view")
    m.bootstrap(ordersDf((30L, 1L, 5.0)), custDf((1L, "ann", "auto")))
    assert(viewSnap(m) == Set((30L, 1L, 5.0, "ann", "auto")))
    // the update re-points order 30 at customer 9, who has not been
    // ingested: the inner-join view has no row for 30 any more — the
    // old row must not keep serving
    m.ingestLeft(ordersDf((30L, 9L, 5.5)))
    assert(viewSnap(m).isEmpty,
      s"stale view row survived an FK re-point: ${viewSnap(m)}")
    // the late dimension row re-materializes it with the NEW key
    m.ingestRight(custDf((9L, "zoe", "zinc")))
    assert(viewSnap(m) == Set((30L, 9L, 5.5, "zoe", "zinc")))
    // a replay of the re-point batch via the ledger is a version-level
    // no-op — in particular it must NOT re-run the retraction against
    // the now-materialized row
    m.ingestLeft(ordersDf((31L, 1L, 1.0)), Some(3L))
    val v = UpsertStore.latestVersion(spark, s"$dir/view")
    m.ingestLeft(ordersDf((31L, 1L, 1.0)), Some(3L))
    assert(UpsertStore.latestVersion(spark, s"$dir/view") == v)
    assert(viewSnap(m).map(_._1) == Set(30L, 31L))
  }

  test("VERDICT r16 #2: schema-generic star view — deltas on all three sides converge") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jv-star").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view",
      factKeys = Seq("l_orderkey", "l_linenumber"),
      factCols = Seq("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
        "l_quantity"),
      dims = Seq(
        DimSpec(Seq("l_partkey"), Seq("p_partkey"), Seq("p_partkey", "p_name")),
        DimSpec(Seq("l_suppkey"), Seq("s_suppkey"), Seq("s_suppkey", "s_name"))))
    def li(rows: (Long, Long, Long, Long, Double)*) =
      rows.toDF("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
    def pt(rows: (Long, String)*) = rows.toDF("p_partkey", "p_name")
    def sp(rows: (Long, String)*) = rows.toDF("s_suppkey", "s_name")
    def snap = m.current.as[(Long, Long, Long, Long, Double, String, String)]
      .collect().toSet

    // bootstrap: part 2 and supplier 20 arrive later
    m.bootstrap(li((1L, 1L, 1L, 10L, 5.0), (1L, 2L, 2L, 10L, 6.0)),
      Seq(pt((1L, "bolt")), sp((10L, "acme"))))
    assert(snap == Set((1L, 1L, 1L, 10L, 5.0, "bolt", "acme")),
      "a fact missing any dimension must not be a view row yet")

    // fact delta: line (2,1) joins both dims; line (2,2) waits on supplier 20
    m.ingestFact(li((2L, 1L, 1L, 10L, 7.0), (2L, 2L, 1L, 20L, 8.0)), Some(0L))
    assert(snap.map(r => (r._1, r._2)) == Set((1L, 1L), (2L, 1L)))

    // dimension deltas on BOTH dims: each materializes the facts that
    // were waiting on it — from bootstrap AND the earlier fact delta
    m.ingestDim(0, pt((2L, "nut")), Some(1L))
    assert(snap.map(r => (r._1, r._2)) == Set((1L, 1L), (1L, 2L), (2L, 1L)),
      "late part row must materialize the bootstrap fact that waited")
    m.ingestDim(1, sp((20L, "zenith")), Some(2L))
    assert(snap == Set(
      (1L, 1L, 1L, 10L, 5.0, "bolt", "acme"),
      (1L, 2L, 2L, 10L, 6.0, "nut", "acme"),
      (2L, 1L, 1L, 10L, 7.0, "bolt", "acme"),
      (2L, 2L, 1L, 20L, 8.0, "bolt", "zenith")),
      s"star view diverged from the 3-way join: $snap")

    // a dimension update fans out to every referencing view row
    m.ingestDim(1, sp((10L, "acme2")), Some(3L))
    assert(snap.count(_._7 == "acme2") == 3)
  }

  test("round 17: fact/dim retraction — the takedown verbs on the view family") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jv-takedown").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view")
    m.bootstrap(ordersDf((10L, 1L, 5.0), (11L, 2L, 6.0), (12L, 1L, 7.0)),
      custDf((1L, "ann", "auto"), (2L, "bob", "bike")))

    // fact retraction: the view row is a pure function of the fact —
    // both stores lose the key
    m.retractFact(Seq(Tuple1(10L)).toDF("o_orderkey"), txnId = 1L)
    assert(viewSnap(m).map(_._1) == Set(11L, 12L))
    assert(UpsertStore.read(spark, s"$dir/view__left").get
      .filter($"o_orderkey" === 10L).count() == 0, "fact store kept the retracted row")
    // ledgered replay: version-level no-op
    val v = UpsertStore.latestVersion(spark, s"$dir/view")
    m.retractFact(Seq(Tuple1(10L)).toDF("o_orderkey"), txnId = 1L)
    assert(UpsertStore.latestVersion(spark, s"$dir/view") == v)

    // dim retraction: customer 1 goes — exactly order 12's view row
    // (the fan-out) drops; the fact itself stays pending
    m.retractDim(0, Seq(Tuple1(1L)).toDF("c_custkey"), txnId = 2L)
    assert(viewSnap(m).map(_._1) == Set(11L),
      s"dim retraction must drop exactly the referencing rows: ${viewSnap(m)}")
    assert(UpsertStore.read(spark, s"$dir/view__left").get
      .filter($"o_orderkey" === 12L).count() == 1, "orphaned fact must stay stored")
    // the dimension's RE-INGEST re-materializes the pending fact — the
    // standing late-arrival semantics, post-takedown
    m.ingestRight(custDf((1L, "ann2", "auto")))
    assert(viewSnap(m) == Set((11L, 2L, 6.0, "bob", "bike"),
      (12L, 1L, 7.0, "ann2", "auto")))

    // retraction ids never collide with ingest ids: a later ledgered
    // fact batch (batchId-shaped, below the retract ids) still ingests
    m.ingestLeft(ordersDf((13L, 2L, 9.0)), Some(0L))
    assert(viewSnap(m).map(_._1) == Set(11L, 12L, 13L),
      "separate retract ledger must not make a later ingest self-skip")
  }

  test("ADVICE r17: dim deltas keep their own ledger — a dim txn below the fact high-water mark still ingests") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jv-dimtxn").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view")
    m.bootstrap(ordersDf((10L, 1L, 5.0), (11L, 2L, 6.0)), custDf((1L, "ann", "auto")))
    // the fact stream has advanced the VIEW ledger well past the dim
    // feed's own sequence — the documented deployment shape
    m.ingestLeft(ordersDf((12L, 2L, 7.0)), Some(5L))
    // a dim delta at txn 1 (its own per-dim sequence) must still apply:
    // under a shared ledger this batch self-skipped and customer 2
    // vanished from both the dim store and the view
    m.ingestRight(custDf((2L, "bob", "bike")), Some(1L))
    assert(viewSnap(m) == Set((10L, 1L, 5.0, "ann", "auto"),
      (11L, 2L, 6.0, "bob", "bike"), (12L, 2L, 7.0, "bob", "bike")),
      s"dim delta below the fact high-water mark was dropped: ${viewSnap(m)}")
    // replaying the SAME dim txn is a version-level no-op on both stores
    val vd = UpsertStore.latestVersion(spark, s"$dir/view__right")
    val vv = UpsertStore.latestVersion(spark, s"$dir/view")
    m.ingestRight(custDf((2L, "bob", "bike")), Some(1L))
    assert(UpsertStore.latestVersion(spark, s"$dir/view__right") == vd &&
      UpsertStore.latestVersion(spark, s"$dir/view") == vv,
      "replayed dim txn advanced a store")
    // and the dim ledger never gates the fact path: a later fact batch
    // (its own sequence, id 6) still ingests
    m.ingestLeft(ordersDf((13L, 1L, 8.0)), Some(6L))
    assert(viewSnap(m).map(_._1) == Set(10L, 11L, 12L, 13L))
  }

  test("foreachBatch wiring + checkpoint restart on the fact stream") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-jv-fb").toString
    val m = new JoinViewMaintainer(spark, s"$dir/view")
    m.bootstrap(ordersDf((10L, 1L, 5.0)), custDf((1L, "ann", "auto"), (2L, "bob", "bike")))
    val input = MemoryStream[JOrder]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(JOrder(11L, 2L, 6.0))
    q.processAllAvailable()
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(JOrder(12L, 1L, 7.0))
    q2.processAllAvailable()
    q2.stop()
    assert(viewSnap(m) == Set((10L, 1L, 5.0, "ann", "auto"),
      (11L, 2L, 6.0, "bob", "bike"), (12L, 1L, 7.0, "ann", "auto")),
      s"post-restart view diverged: ${viewSnap(m)}")
  }
}

object JoinViewMaintainSpec {
  case class JOrder(o_orderkey: Long, o_custkey: Long, o_totalprice: Double)
}
