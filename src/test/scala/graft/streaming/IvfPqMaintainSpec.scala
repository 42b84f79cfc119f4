package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.operators.{IvfPqIndex, Similarity}

/** The fifteenth maintainer ([[IvfPqMaintainer]], q187): the composed
  * IVF-PQ store maintained per vector batch. Pinned: streamed ingests
  * ≡ one-shot build at the serve level (recall 1.0 vs brute force),
  * side tables pinned across ingests, ledgered replay is a no-op, and
  * foreachBatch + checkpoint restart. */
class IvfPqMaintainSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001
  import spark.implicits._
  import IvfPqMaintainSpec._

  private def emb = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))

  private lazy val brute =
    Similarity.q50AnnBruteForce.fn(spark, sf).as[(Long, Long, Long)].collect().toSeq

  private def serveSet(m: IvfPqMaintainer) =
    m.serve(emb, col("vec_id") < 5).as[(Long, Long, Long)].collect().toSeq

  test("streamed ingests serve brute force; side tables pinned; ledgered replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqm").toString
    val m = new IvfPqMaintainer(spark, s"$dir/idx")
    val cutA = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    val cutM = emb.selectExpr("percentile(vec_id, 0.8)").head().getDouble(0).toLong
    m.bootstrap(emb.filter($"vec_id" <= cutA))
    val cents = UpsertStore.read(spark, s"$dir/idx__centroids").get
      .orderBy("centroid_id").collect().toSeq
    val books = UpsertStore.read(spark, s"$dir/idx__codebooks").get
      .orderBy("m", "cid").collect().toSeq
    m.ingestBatch(emb.filter($"vec_id" > cutA && $"vec_id" <= cutM), Some(0L))
    m.ingestBatch(emb.filter($"vec_id" > cutM), Some(1L))
    assert(UpsertStore.read(spark, s"$dir/idx__centroids").get
      .orderBy("centroid_id").collect().toSeq == cents, "ingest moved centroids")
    assert(UpsertStore.read(spark, s"$dir/idx__codebooks").get
      .orderBy("m", "cid").collect().toSeq == books, "ingest moved codebooks")
    val v = UpsertStore.latestVersion(spark, s"$dir/idx")
    m.ingestBatch(emb.filter($"vec_id" > cutM), Some(1L)) // ledgered replay
    assert(UpsertStore.latestVersion(spark, s"$dir/idx") == v,
      "ledgered replay advanced the composed store")
    assert(UpsertStore.read(spark, s"$dir/idx").get.count() == emb.count())
    assert(serveSet(m) == brute,
      "maintained composed serve must stay recall-1.0 vs brute force")
  }

  test("foreachBatch wiring + checkpoint restart: serve equals brute force") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-ivfpqm-fb").toString
    val m = new IvfPqMaintainer(spark, s"$dir/idx")
    val cutA = emb.selectExpr("percentile(vec_id, 0.6)").head().getDouble(0).toLong
    val cutM = emb.selectExpr("percentile(vec_id, 0.8)").head().getDouble(0).toLong
    m.bootstrap(emb.filter($"vec_id" <= cutA))
    val batch1 = emb.filter($"vec_id" > cutA && $"vec_id" <= cutM)
      .as[(Long, Seq[Double])].collect().map((Vec.apply _).tupled).toSeq
    val batch2 = emb.filter($"vec_id" > cutM)
      .as[(Long, Seq[Double])].collect().map((Vec.apply _).tupled).toSeq
    val input = MemoryStream[Vec]
    val q = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(batch1: _*)
    q.processAllAvailable()
    q.stop()
    val q2 = m.run(input.toDF(), s"$dir/ckpt", Trigger.ProcessingTime(0))
    input.addData(batch2: _*)
    q2.processAllAvailable()
    q2.stop()
    assert(serveSet(m) == brute,
      s"post-restart composed serve diverged from brute force")
  }
}

object IvfPqMaintainSpec {
  case class Vec(vec_id: Long, emb: Seq[Double])
}
