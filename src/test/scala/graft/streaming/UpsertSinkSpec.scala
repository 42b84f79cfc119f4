package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

class UpsertSinkSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshSink(): (String, ParquetUpsertSink) = {
    val dir = Files.createTempDirectory("graft-upsert").toString
    (dir, new ParquetUpsertSink(spark, dir, Seq("k")))
  }

  test("upsert: last-writer-wins, idempotent (SURVEY §5.3 property)") {
    val (_, sink) = freshSink()
    sink.upsert(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
    sink.upsert(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"))
    val got = sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq
    assert(got == Seq((1L, "a"), (2L, "b2"), (3L, "c")))
    // idempotence: upsert(upsert(s, df), df) == upsert(s, df)
    sink.upsert(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"))
    assert(sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq == got)
  }

  test("transactional upsert: a replayed batch (same txn id) is skipped outright") {
    val (dir, sink) = freshSink()
    sink.upsertUnique(Seq((1L, "a")).toDF("k", "v"), txnId = Some(0L))
    sink.upsertUnique(Seq((2L, "b")).toDF("k", "v"), txnId = Some(1L))
    val vBefore = UpsertStore.latestVersion(spark, dir).get
    // crash-replay of batch 1 with DIFFERENT data: transactional skip
    // means neither the data nor the store version changes
    sink.upsertUnique(Seq((2L, "SHOULD_NOT_APPLY")).toDF("k", "v"), txnId = Some(1L))
    assert(UpsertStore.latestVersion(spark, dir).get == vBefore, "replay must not commit")
    assert(sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // the next batch id applies normally
    sink.upsertUnique(Seq((3L, "c")).toDF("k", "v"), txnId = Some(2L))
    assert(sink.read(spark).count() == 3)
  }

  test("schema evolution: a batch with a new column widens the table, old rows read null") {
    val (_, sink) = freshSink()
    sink.upsert(Seq((1L, "a")).toDF("k", "v"))
    sink.upsert(Seq((2L, "b", 9.5)).toDF("k", "v", "score")) // new column
    val got = sink.read(spark).orderBy("k")
      .select("k", "v", "score")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2))))
    assert(got.toSeq == Seq((1L, "a", None), (2L, "b", Some(9.5))))
    // and the widened schema persists through a compacting verb
    sink.insertIgnore(Seq((3L, "c", 1.0)).toDF("k", "v", "score"))
    assert(sink.read(spark).columns.toSet == Set("k", "v", "score"))
    assert(sink.read(spark).count() == 3)
  }

  test("within-batch duplicate keys resolve deterministically (greatest value wins)") {
    val (_, sink) = freshSink()
    sink.upsert(Seq((1L, "x"), (1L, "y"), (2L, "a")).toDF("k", "v"))
    assert(sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "y"), (2L, "a")))
    // replay the same batch: identical result (idempotent under retry)
    sink.upsert(Seq((1L, "y"), (1L, "x"), (2L, "a")).toDF("k", "v"))
    assert(sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "y"), (2L, "a")))
  }

  test("insert errors on duplicate key; insertIgnore skips; update touches only existing; delete by key") {
    val (_, sink) = freshSink()
    sink.insert(Seq((1L, "a")).toDF("k", "v"))
    intercept[IllegalArgumentException] {
      sink.insert(Seq((1L, "dup")).toDF("k", "v"))
    }
    sink.insertIgnore(Seq((1L, "ignored"), (2L, "b")).toDF("k", "v"))
    assert(sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    sink.update(Seq((2L, "b9"), (9L, "ghost")).toDF("k", "v"))
    assert(sink.read(spark).orderBy("k").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b9")))
    sink.delete(Seq(Tuple1(1L)).toDF("k"))
    assert(sink.read(spark).as[(Long, String)].collect().toSeq == Seq((2L, "b9")))
  }

  test("reference parity: the three equivalent write paths collapse to one row per key") {
    val dir = Files.createTempDirectory("graft-3paths").toString
    val df = Seq((42L, 3.5, 1, 9)).toDF("as_of_time", "avg_num_veh", "min_num_veh", "max_num_veh")

    // path 1 — API upsert (reference K1: KuduContext.upsertRows)
    val sink = new ParquetUpsertSink(spark, dir, Seq("as_of_time"))
    sink.upsert(df)

    // path 2 — DataFrameWriter (reference K2: write.mode("append").kudu)
    df.write.format("graft-upsert")
      .option("path", dir).option("keys", "as_of_time")
      .mode("append").save()

    // path 3 — SQL INSERT INTO via registered view (reference K3)
    spark.read.format("graft-upsert").option("path", dir).option("keys", "as_of_time")
      .load().createOrReplaceTempView("traffic_conditions")
    df.createOrReplaceTempView("traffic_results")
    spark.sql("INSERT INTO TABLE traffic_conditions SELECT * FROM traffic_results")

    val out = spark.read.format("graft-upsert").option("path", dir).load()
    assert(out.count() == 1, "three equivalent writes of one key ⇒ exactly one row")
    assert(out.collect().head.getAs[Double]("avg_num_veh") == 3.5)
  }

  test("SaveMode contract: default ErrorIfExists throws on existing store; Ignore is a no-op") {
    val (dir, sink) = freshSink()
    sink.upsert(Seq((1L, "a")).toDF("k", "v"))
    val e = intercept[IllegalStateException] {
      Seq((2L, "b")).toDF("k", "v").write.format("graft-upsert")
        .option("path", dir).option("keys", "k").save() // no mode => ErrorIfExists
    }
    assert(e.getMessage.contains("already exists"))
    Seq((3L, "c")).toDF("k", "v").write.format("graft-upsert")
      .option("path", dir).option("keys", "k").mode("ignore").save()
    assert(sink.read(spark).count() == 1, "Ignore on existing store must be a no-op")
  }

  test("sink read-back via the relation (reference S2)") {
    val (dir, sink) = freshSink()
    sink.upsert(Seq((7L, "x")).toDF("k", "v"))
    val back = spark.read.format("graft-upsert").option("path", dir).load()
    assert(back.schema.fieldNames.toSeq == Seq("k", "v"))
    assert(back.as[(Long, String)].collect().toSeq == Seq((7L, "x")))
  }
}
