package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class TrafficPipelineSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("parse handles the reference's CSV shapes incl. trailing whitespace") {
    val raw = Seq("1512000000000,42", "1512000001000,0", "1512000003000,7 ",
      "1512000004000,9\n", "garbage", "123,", ",5").toDF("value")
    val parsed = TrafficPipeline.parse(raw).orderBy("measurement_time")
    val rows = parsed.collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(rows.toSeq == Seq(
      (1512000000000L, 42), (1512000001000L, 0), (1512000003000L, 7), (1512000004000L, 9)))
  }

  test("windowed aggregate matches hand-computed golden rows") {
    // two events in the same 5s-aligned minute, one 2 minutes later
    val parsed = Seq(
      (1512000000000L, 10), (1512000030000L, 30), (1512000120000L, 50))
      .toDF("measurement_time", "number_of_vehicles")
    val agg = TrafficPipeline.aggregate(parsed)
    // window [1512000000000, 1512000060000) catches rows 1+2 (sliding
    // windows: the one STARTING at the aligned minute)
    val w0 = agg.filter($"as_of_time" === 1512000000000L).collect().head
    assert(w0.getAs[Double]("avg_num_veh") == 20.0)
    assert(w0.getAs[Int]("min_num_veh") == 10)
    assert(w0.getAs[Int]("max_num_veh") == 30)
    assert(w0.getAs[Long]("first_meas_time") == 1512000000000L)
    assert(w0.getAs[Long]("last_meas_time") == 1512000030000L)
    // invariants across all windows
    val bad = agg.filter(
      $"min_num_veh" > $"avg_num_veh" || $"avg_num_veh" > $"max_num_veh" ||
        $"first_meas_time" > $"last_meas_time").count()
    assert(bad == 0)
  }

  test("streaming end-to-end: MemoryStream -> window agg -> upsert sink converges") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val dir = Files.createTempDirectory("graft-traffic").toString
    val sink = new ParquetUpsertSink(spark, s"$dir/sink", Seq("as_of_time"))
    val q = TrafficPipeline.run(
      input.toDF().select($"value"), sink, s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())

    input.addData("1512000000000,10", "1512000030000,30")
    q.awaitTermination()
    val r1 = sink.read(spark).filter($"as_of_time" === 1512000000000L).collect().head
    assert(r1.getAs[Double]("avg_num_veh") == 20.0)

    // late-ish second wave into the same window: rerun (AvailableNow
    // terminates) and check the SAME key was overwritten, not appended
    val q2 = TrafficPipeline.run(
      input.toDF().select($"value"), sink, s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData("1512000045000,50")
    q2.awaitTermination()
    val r2 = sink.read(spark).filter($"as_of_time" === 1512000000000L).collect()
    assert(r2.length == 1, "same window key must stay a single row")
    assert(r2.head.getAs[Double]("avg_num_veh") == 30.0) // (10+30+50)/3
    assert(r2.head.getAs[Int]("max_num_veh") == 50)
  }

  test("processing-time parity mode: ring buffer emulates DStream window") {
    val dir = Files.createTempDirectory("graft-ptw").toString
    val sink = new ParquetUpsertSink(spark, s"$dir/sink", Seq("as_of_time"))
    var now = 1000000L
    val ptw = new TrafficPipeline.ProcessingTimeWindow(
      sink, () => now, s"$dir/scratch", batchesPerWindow = 2)
    val b1 = Seq((100L, 10)).toDF("measurement_time", "number_of_vehicles")
    val b2 = Seq((200L, 30)).toDF("measurement_time", "number_of_vehicles")
    val b3 = Seq((300L, 50)).toDF("measurement_time", "number_of_vehicles")
    ptw.onBatch(b1, spark); now += 5000
    ptw.onBatch(b2, spark); now += 5000
    ptw.onBatch(b3, spark) // ring holds b2+b3 only
    val rows = sink.read(spark).orderBy("as_of_time").collect()
    assert(rows.length == 3, "wall-clock keys append per batch (reference parity)")
    val last = rows.last
    assert(last.getAs[Double]("avg_num_veh") == 40.0) // (30+50)/2 — b1 aged out
    assert(last.getAs[Long]("first_meas_time") == 200L)
  }
}
