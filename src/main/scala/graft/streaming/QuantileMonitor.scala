package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, BinaryType, DoubleType, LongType, StringType, StructField, StructType}

import graft.functions.{KllSketch, QuantileFunctions}

/** CONTINUOUS QUANTILE MONITORING — the streaming face of the q133
  * sketch store: per-group KLL summaries persist serialized; every
  * arriving micro-batch is sketched with one map-side-combining
  * aggregate and MERGED into the store (deserialize + mergeWith +
  * reserialize over KB-scale binaries), so "p99 of everything seen so
  * far" reads in milliseconds at any corpus size and no batch ever
  * rescans history.
  *
  * Replay discipline differs from every other maintainer because a
  * sketch merge is NOT idempotent — folding the same batch twice
  * double-counts its weight. The gate/postings stores survive the
  * crash-between-data-and-ledger window by convergent writes; here
  * the ledger must be ATOMIC with the data, so the txn rides in the
  * SAME store table as the sketches (every row carries the commit's
  * txn) and each ingest is ONE `UpsertStore.replace` — one manifest
  * commit, so a replay either sees the whole previous commit (and
  * skips on its txn) or none of it (and re-merges from the prior
  * state). Group count = monitored metrics — metadata-scale, so the
  * per-batch full-table rewrite is bytes, not data.
  *
  * Batches carry (`grp` string, `v` double).
  */
final class QuantileMonitor(
    spark: SparkSession, storePath: String) extends Serializable {

  private val schema = StructType(Seq(
    StructField("grp", StringType, nullable = false),
    StructField("sk", BinaryType, nullable = false),
    StructField("txn", LongType, nullable = false)))

  private def sketchRows(batch: DataFrame): Map[String, Array[Byte]] =
    batch.groupBy("grp")
      .agg(QuantileFunctions.quantile_sketch_bytes(col("v")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap

  private def writeAll(rows: Map[String, Array[Byte]], txn: Long): Unit =
    UpsertStore.replace(spark, storePath,
      spark.createDataFrame(
        java.util.Arrays.asList(
          rows.toSeq.map(t => Row(t._1, t._2, txn)): _*),
        schema),
      Seq("grp"), assumeKeyUnique = true)

  /** Seed the monitor from the historical corpus. */
  def bootstrap(corpus: DataFrame): Unit =
    writeAll(sketchRows(corpus), -1L)

  /** Sketch + merge one batch; `txnId` (the streaming batchId) makes
    * replays no-ops — see the class doc for why it MUST ride in the
    * same commit as the sketches. */
  def ingestBatch(batch: DataFrame, txnId: Option[Long] = None): Unit = {
    val cur = UpsertStore.read(spark, storePath).getOrElse(
      sys.error(s"no quantile monitor at $storePath — bootstrap first"))
      .collect()
    val committed = if (cur.isEmpty) -1L else cur.map(_.getAs[Long]("txn")).max
    if (txnId.exists(_ <= committed)) return
    val stored = cur.map(r => r.getString(0) -> r.getAs[Array[Byte]]("sk")).toMap
    val delta = sketchRows(batch)
    val merged = (stored.keySet ++ delta.keySet).map { g =>
      g -> ((stored.get(g), delta.get(g)) match {
        case (Some(a), Some(b)) => KllSketch.deserialize(a)
          .mergeWith(KllSketch.deserialize(b)).serialized
        case (Some(a), None) => a
        case (None, Some(b)) => b
        case _ => sys.error("unreachable")
      })
    }.toMap
    writeAll(merged, txnId.getOrElse(committed))
  }

  /** Current estimates, one row per (grp, p). */
  def estimates(ps: Seq[Double]): DataFrame = {
    val rows = UpsertStore.read(spark, storePath).getOrElse(
      sys.error(s"no quantile monitor at $storePath")).collect()
      .flatMap { r =>
        val est = KllSketch.deserialize(r.getAs[Array[Byte]]("sk"))
          .estimates(ps.toArray)
        ps.zip(est).map { case (p, e) => Row(r.getString(0), p, e) }
      }
    spark.createDataFrame(
      java.util.Arrays.asList(rows.toIndexedSeq: _*),
      StructType(Seq(
        StructField("grp", StringType, nullable = false),
        StructField("p", DoubleType, nullable = false),
        StructField("est", DoubleType, nullable = false))))
  }

  /** Wire into a streaming query. */
  def run(rows: DataFrame, checkpointDir: String,
          trigger: org.apache.spark.sql.streaming.Trigger =
            org.apache.spark.sql.streaming.Trigger.ProcessingTime("5 seconds"))
      : org.apache.spark.sql.streaming.StreamingQuery =
    rows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.persist()
        try {
          if (!batch.isEmpty)
            ingestBatch(batch.select("grp", "v"), Some(batchId))
        } finally batch.unpersist()
      }
      .start()
}
