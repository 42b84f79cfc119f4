package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.{KuduUpsertSink, ParquetUpsertSink, TrafficPipeline}

class SourcesSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("kafka option assembly mirrors the reference's direct-stream config") {
    val opts = Sources.kafkaOptions("broker1:9092,broker2:9092",
      Seq("traffic"), "curtis_test_group", "earliest")
    assert(opts("kafka.bootstrap.servers") == "broker1:9092,broker2:9092")
    assert(opts("subscribe") == "traffic")
    assert(opts("kafka.group.id") == "curtis_test_group")
    assert(opts("startingOffsets") == "earliest")
    intercept[IllegalArgumentException](Sources.kafkaStream(spark, "", Seq("t")))
    intercept[IllegalArgumentException](Sources.kafkaStream(spark, "b:9092", Seq.empty))
  }

  test("kafka sink assembly: wire projection + argument validation") {
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val df = in.toDF().toDF("key", "value")
    val writer = Sources.kafkaSink(df, "b:9092", "out_topic", "/tmp/ck")
    assert(writer != null) // options validated at assembly; no broker to start against
    // key is optional, value is mandatory, and both are cast to STRING
    val noKey = in.toDF().toDF("k2", "value")
    assert(Sources.kafkaSink(noKey, "b:9092", "t", "/tmp/ck") != null)
    intercept[IllegalArgumentException](
      Sources.kafkaSink(in.toDF().toDF("key", "other"), "b:9092", "t", "/tmp/ck"))
    intercept[IllegalArgumentException](Sources.kafkaSink(df, "", "t", "/tmp/ck"))
    intercept[IllegalArgumentException](Sources.kafkaSink(df, "b:9092", "", "/tmp/ck"))
  }

  test("file-format coverage: events roundtrip parquet -> json -> csv -> orc -> text") {
    val dir = Files.createTempDirectory("graft-formats").toString
    val events = graft.Tables.events(spark, SharedSpark.sf0001)
      .select($"event_id", $"user_id", $"event_type", $"value")
    events.write.json(s"$dir/json")
    events.write.option("header", "true").csv(s"$dir/csv")
    events.write.orc(s"$dir/orc")
    val fromJson = spark.read.json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$dir/csv")
    val fromOrc = spark.read.orc(s"$dir/orc")
    assert(fromJson.count() == events.count())
    assert(fromCsv.count() == events.count())
    val sumP = events.agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    val sumJ = fromJson.agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    assert(math.abs(sumP - sumJ) < 1e-6)
    // ORC preserves types exactly (no inference round-trip)
    assert(fromOrc.schema == events.schema)
    val sumO = fromOrc.agg(org.apache.spark.sql.functions.sum("value")).head().getDouble(0)
    assert(sumO == sumP)
    // line-oriented text source (the raw-ingest entry point)
    events.select(org.apache.spark.sql.functions
      .concat_ws(",", $"event_id", $"event_type").as("value"))
      .write.text(s"$dir/text")
    assert(spark.read.text(s"$dir/text").count() == events.count())
  }

  test("multi-sink fan-out: one batch, N sinks, no divergence") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[String]
    val dir = Files.createTempDirectory("graft-fanout").toString
    val s1 = new ParquetUpsertSink(spark, s"$dir/s1", Seq("as_of_time"))
    val s2 = new ParquetUpsertSink(spark, s"$dir/s2", Seq("as_of_time"))
    val q = TrafficPipeline.runMultiSink(
      input.toDF().select($"value"), Seq(s1, s2), s"$dir/ckpt",
      trigger = org.apache.spark.sql.streaming.Trigger.AvailableNow())
    input.addData("1512000000000,10", "1512000030000,30")
    q.awaitTermination()
    val a = s1.read(spark).orderBy("as_of_time").collect().map(_.toSeq).toSeq
    val b = s2.read(spark).orderBy("as_of_time").collect().map(_.toSeq).toSeq
    assert(a.nonEmpty && a == b)
  }

  test("Kudu stub names the production binding in its error") {
    val sink = new KuduUpsertSink("kudu-master:7051", "traffic_conditions", Seq("as_of_time"))
    val e = intercept[UnsupportedOperationException] {
      sink.upsert(Seq((1L, 2.0)).toDF("as_of_time", "avg_num_veh"))
    }
    assert(e.getMessage.contains("kudu-spark"))
    assert(e.getMessage.contains("traffic_conditions"))
  }
}
