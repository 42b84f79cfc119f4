package graft.javaapi

import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.TrafficPipeline

/** Multi-language parity (the reference's core teaching point — one
  * pipeline, three APIs): the Java entry point must produce the SAME
  * results and schemas as the Scala declarations, because both declare
  * the same Catalyst plan. */
class JavaApiParitySpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def raw = Seq(
    "1000,3", "2000,5", "3000,2", "61000,7 \n", "62000, 4", "garbage", "99,"
  ).toDF("value")

  test("Java parse == Scala parse (incl. trailing-whitespace and malformed rows)") {
    val s = TrafficPipeline.parse(raw).collect().map(_.toSeq).toSeq
    val j = GraftJava.parse(raw).collect().map(_.toSeq).toSeq
    assert(j == s)
    assert(j.size == 5) // two malformed rows dropped
  }

  test("Java explicit StructType == Scala parse output schema (SURVEY §1.3 duality)") {
    val scalaSchema = TrafficPipeline.parse(raw).schema
    val javaSchema = GraftJava.parsedSchema()
    assert(javaSchema.fieldNames.toSeq == scalaSchema.fieldNames.toSeq)
    assert(javaSchema.fields.map(_.dataType).toSeq ==
      scalaSchema.fields.map(_.dataType).toSeq)
  }

  test("Java aggregate and SQL aggregate == Scala aggregate (batch)") {
    val parsed = TrafficPipeline.parse(raw)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("as_of_time").collect().map(_.toSeq).toSeq
    val s = rows(TrafficPipeline.aggregate(parsed))
    assert(rows(GraftJava.aggregate(parsed, "60 seconds", "5 seconds")) == s)
    assert(rows(GraftJava.aggregateSql(spark, parsed)) == s)
  }

  test("Java streaming wiring runs the Scala engine end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-javaapi").toString
    val sink = GraftJava.parquetSink(spark, s"$dir/sink",
      java.util.List.of("as_of_time"))
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sc = spark.sqlContext
    val mem = MemoryStream[String]
    mem.addData("1000,3", "2000,5", "61000,7")
    val q = GraftJava.run(mem.toDF(), sink, s"$dir/ckpt", Trigger.AvailableNow())
    q.awaitTermination(60000)
    val out = sink.read(spark)
    assert(out.count() > 0)
    // window rows aggregate the parsed records (sanity: totals visible)
    val maxVeh = out.agg(org.apache.spark.sql.functions.max("max_num_veh"))
      .head().getInt(0)
    assert(maxVeh == 7)
  }

  test("Java catalog registration serves the derived stores via SQL (q99/q100 path)") {
    if (!spark.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      spark.conf.set("spark.sql.catalog.graft",
        classOf[graft.sources.UpsertCatalog].getName)
      spark.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-jcat").toString)
    }
    val tA = (1 to 30).map(i => s"a$i")
    val docs = Seq(
      1L -> tA.mkString(" "),
      2L -> (1 to 30).map(i => s"c$i").mkString(" "),
      10L -> (tA.take(26) ++ (27 to 30).map(i => s"x$i")).mkString(" ")
    ).toDF("doc_id", "text")
    GraftJava.registerPairGraph(spark, "j_pg", docs, "java-parity", 0.6)
    val pairs = spark.sql("SELECT doc_a, doc_b FROM graft.j_pg")
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 10L)), s"Java-registered pair table via SQL: $pairs")

    val e = (i: Int) => Array.tabulate(4)(j => if (j == i % 4) 1f else 0f)
    val emb = (0 until 12).map(i => (i.toLong, e(i))).toDF("vec_id", "embedding")
    GraftJava.registerVectorIndex(spark, "j_vx", emb, "java-parity", 4)
    assert(spark.sql("SELECT count(*) FROM graft.j_vx").head().getLong(0) == 12L)
    assert(spark.sql("SELECT count(*) FROM graft.j_vx__centroids")
      .head().getLong(0) == 4L)

    // the sparse-retrieval twin (round 11: the q106 serve path)
    GraftJava.registerPostingsIndex(spark, "j_bm", docs)
    val alphaTf = spark.sql(
      "SELECT doc_id, tf FROM graft.j_bm WHERE term = 'a1'")
      .as[(Long, Long)].collect().toSet
    assert(alphaTf == Set((1L, 1L), (10L, 1L)),
      s"Java-registered postings table via SQL: $alphaTf")
    val stats = spark.sql("SELECT n, avgdl FROM graft.j_bm__stats").head()
    assert(stats.getLong(0) == 3L && stats.getDouble(1) == 30.0,
      s"stats row: $stats")

    // the compressed-ANN twin (round 11: the q127 serve path) — 64-dim
    // vectors so the 8×8 subspace split applies
    val pq = (0 until 40).map(i =>
      (i.toLong, Array.tabulate(64)(j => ((i * 64 + j) % 7).toDouble)))
      .toDF("vec_id", "emb")
    GraftJava.registerPqIndex(spark, "j_pq", pq)
    assert(spark.sql("SELECT count(*) FROM graft.j_pq").head().getLong(0) == 40L)
    val codeLen = spark.sql("SELECT size(codes) FROM graft.j_pq LIMIT 1")
      .head().getInt(0)
    assert(codeLen == 8, s"packed code width: $codeLen")
    assert(spark.sql("SELECT count(DISTINCT m) FROM graft.j_pq__codebooks")
      .head().getLong(0) == 8L)
  }
}
