package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The stateful streaming operators must be provider-invariant: the
  * RocksDB state store (the 100 TB operational posture — off-heap
  * state, changelog checkpointing) and the default heap provider must
  * produce identical results for sessionization (flatMapGroupsWithState)
  * and streaming exact dedup (dropDuplicatesWithinWatermark). VERDICT
  * r6 #4. */
class StateStoreProviderSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def runSessionize(tag: String): Seq[Sessionize.UserSession] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Sessionize.UserEvent]
    val q = Sessionize.sessions(input.toDS().withWatermark("ts", "0 seconds"), 60_000L)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName(s"ssp_sessions_$tag")
      .trigger(Trigger.ProcessingTime(0)).start()
    def ev(userId: Long, t: Long, v: Double) =
      Sessionize.UserEvent(userId, new Timestamp(t), "click", v)
    try {
      input.addData(ev(1, 10_000, 1.0), ev(1, 20_000, 2.0), ev(2, 15_000, 4.0))
      q.processAllAvailable()
      input.addData(ev(1, 320_000, 5.0), ev(2, 330_000, 6.0))
      q.processAllAvailable()
      input.addData(ev(1, 900_000, 7.0), ev(2, 910_000, 8.0))
      q.processAllAvailable()
      val rocksUsed = Option(q.lastProgress).exists(
        _.stateOperators.exists(_.customMetrics.containsKey("rocksdbFilesCopied")))
      assert(rocksUsed == (StreamingState.currentProvider(spark) == StreamingState.RocksDBProvider),
        s"state store in use does not match the bound provider ($tag)")
      spark.table(s"ssp_sessions_$tag").as[Sessionize.UserSession]
        .collect().sortBy(s => (s.user_id, s.session_start_ms)).toSeq
    } finally q.stop()
  }

  private def runExactDedup(tag: String): Seq[Long] = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val q = StreamingDedup.exactDedupStream(input.toDF(), watermark = "10 seconds")
      .writeStream.outputMode("append")
      .format("memory").queryName(s"ssp_dedup_$tag")
      .trigger(Trigger.ProcessingTime(0)).start()
    def doc(id: Long, t: Long, text: String) =
      StreamingOpsSpec.Doc(id, new Timestamp(t), text)
    try {
      input.addData(doc(1, 1000, "alpha beta"), doc(2, 2000, "gamma"))
      q.processAllAvailable()
      input.addData(doc(3, 2500, "alpha beta"), doc(4, 3000, "delta"))
      q.processAllAvailable()
      spark.table(s"ssp_dedup_$tag").select("doc_id").as[Long].collect().sorted.toSeq
    } finally q.stop()
  }

  test("sessionization results are identical under heap and RocksDB state stores") {
    val heap = StreamingState.withProvider(spark, StreamingState.HeapProvider) {
      runSessionize("heap")
    }
    val rocks = StreamingState.withProvider(spark, StreamingState.RocksDBProvider) {
      runSessionize("rocks")
    }
    assert(heap.nonEmpty, "scenario must close at least one session")
    assert(heap == rocks, s"provider changed sessionization results:\nheap=$heap\nrocks=$rocks")
  }

  test("streaming exact dedup results are identical under heap and RocksDB state stores") {
    val heap = StreamingState.withProvider(spark, StreamingState.HeapProvider) {
      runExactDedup("heap")
    }
    val rocks = StreamingState.withProvider(spark, StreamingState.RocksDBProvider) {
      runExactDedup("rocks")
    }
    assert(heap == Seq(1L, 2L, 4L), s"heap dedup unexpected: $heap")
    assert(heap == rocks, s"provider changed dedup results:\nheap=$heap\nrocks=$rocks")
  }

  private def runTrending(tag: String): Set[(Long, Long, String, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory(s"ssp-trending-$tag").toString
    val sink = new ParquetUpsertSink(spark, s"$dir/sink", Seq("window_start", "rk"))
    val input = MemoryStream[StreamingOpsSpec.Doc]
    val q = TrendingTokens.run(input.toDF(), sink, s"$dir/ckpt", k = 3,
      windowLen = "60 seconds", slide = "30 seconds", watermark = "0 seconds",
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(0))
    def doc(id: Long, t: Long, text: String) =
      StreamingOpsSpec.Doc(id, new Timestamp(t), text)
    try {
      input.addData(
        doc(1, 5_000, "alpha alpha beta gamma"),
        doc(2, 20_000, "alpha beta beta delta"),
        doc(3, 40_000, "epsilon epsilon epsilon zeta"))
      q.processAllAvailable()
      input.addData(doc(9, 500_000, "flush flush flush"))
      q.processAllAvailable()
    } finally q.stop()
    sink.read(spark)
      .filter(org.apache.spark.sql.functions.col("window_start") < 400_000L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3))).toSet
  }

  test("trending-tokens windowed aggregation is identical under heap and RocksDB state stores") {
    val heap = StreamingState.withProvider(spark, StreamingState.HeapProvider) {
      runTrending("heap")
    }
    val rocks = StreamingState.withProvider(spark, StreamingState.RocksDBProvider) {
      runTrending("rocks")
    }
    assert(heap.nonEmpty)
    assert(heap == rocks, s"provider changed trending results:\nheap=$heap\nrocks=$rocks")
  }

  test("withProvider restores the previous binding") {
    val before = StreamingState.currentProvider(spark)
    StreamingState.withProvider(spark, StreamingState.RocksDBProvider) {
      assert(StreamingState.currentProvider(spark) == StreamingState.RocksDBProvider)
    }
    assert(StreamingState.currentProvider(spark) == before)
  }
}
