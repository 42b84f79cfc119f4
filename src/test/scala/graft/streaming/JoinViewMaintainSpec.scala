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
