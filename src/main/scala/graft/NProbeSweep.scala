package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.IvfPqIndex
import graft.streaming.UpsertStore

/** RECALL-vs-nProbe sweep at √N cell counts (round 17 — VERDICT r16
  * #8): the 13-of-16 nProbe pin was measured at ONE cell count; a
  * store sized for 10×-100× corpora runs 64-256 cells, and the pin
  * only generalizes if the FRACTION of probed cells needed for
  * recall 1.0 does not grow with the cell count. This probe builds
  * the trained-quantizer IVF-PQ store at a given cell count over the
  * 10× replica's embeddings, computes the EXACT brute-force top-k for
  * a query sample, and reports the minimal nProbe whose probed-cell
  * set contains every true neighbor — the cell-containment criterion,
  * which is exactly the q189 rule's recall condition (probed-cell
  * semi-join + exact re-rank recovers the true top-k iff the true
  * top-k's cells are probed). One pass, no per-nProbe re-search: a
  * neighbor's REQUIRED nProbe is the rank of its cell in the query's
  * probe order, so the sweep is a max over ranks.
  *
  * Usage: `sbt "runMain graft.NProbeSweep <dataDir> <cells> [k] [nq]"`
  * (defaults: /tmp/scale10d, 64, k=10, 50 queries).
  */
object NProbeSweep {

  def run(spark: SparkSession, dir: String, cells: Int, k: Int = 10,
          nQueries: Int = 50): (Int, Double, Seq[Int]) = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("emb"))
    val path = Scratch.dir("nprobe-sweep") + s"/idx_$cells"
    IvfPqIndex.ensure(spark, emb, path, centroids = cells)

    val queries = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("emb").as("qe"))
    // exact brute-force top-k (cosine desc, lower neighbor id on ties
    // — the q50 contract)
    val bf = emb.crossJoin(broadcast(queries))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", nanvl(
        graft.functions.VectorFunctions.cosine_similarity(col("emb"), col("qe")),
        lit(-1.0)))
      .groupBy("query_id")
      .agg(graft.functions.TopKFunctions.top_k_by_score(
        col("sim"), col("vec_id"), k).as("tk"))
      .select(col("query_id"), explode(col("tk.id")).as("neighbor_id"))

    // probe order per query: centroid cosine desc, ties to the higher
    // cell id — the AnnTopKRewrite/IvfPqIndex.search rule
    val cents = UpsertStore.read(spark, s"${path}__centroids").get
      .select(col("centroid_id"), col("cemb")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val qvecs = queries.collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1).toArray)
    def cosine(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      val d = math.sqrt(na) * math.sqrt(nb)
      if (d == 0.0) -1.0 else dot / d
    }
    val ranks: Seq[(Long, Long, Int)] = qvecs.toSeq.flatMap { case (qid, q) =>
      cents.map { case (cid, ce) => (cosine(q, ce), cid) }
        .sortBy { case (s, cid) => (-s, -cid) }
        .zipWithIndex.map { case ((_, cid), i) => (qid, cid, i + 1) }
    }
    val rankDf = ranks.toDF("query_id", "cell", "cell_rank")

    val storedCells = UpsertStore.read(spark, path).get
      .select(col("vec_id").as("neighbor_id"), col("cell"))
    val needed = bf.join(storedCells, Seq("neighbor_id"))
      .join(broadcast(rankDf), Seq("query_id", "cell"))
      .groupBy("query_id").agg(max("cell_rank").as("need"))
      .select("need").as[Int].collect().sorted.toSeq
    val minFull = needed.max
    (minFull, minFull.toDouble / cells, needed)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scale10d")
    val cells = args.lift(1).map(_.toInt).getOrElse(64)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nq = args.lift(3).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-nprobe-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (need, frac, dist) = run(spark, dir, cells, k, nq)
    val p50 = dist(dist.size / 2); val p90 = dist((dist.size * 9) / 10)
    System.err.println(f"[nprobe] cells=$cells k=$k queries=$nq " +
      f"recall1.0_nprobe=$need (${frac * 100}%.1f%% of cells) p50=$p50 p90=$p90")
    println(s"""{"metric":"nprobe_sweep","cells":$cells,"k":$k,"queries":$nq,""" +
      s""""recall1_nprobe":$need,"frac":$frac,"p50":$p50,"p90":$p90}""")
    spark.stop()
  }
}
