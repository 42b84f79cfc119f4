package graft.sources

import org.apache.spark.sql.DataFrame

/** Storage-layout helpers for shuffle elimination at scale.
  *
  * Bucketing pre-partitions a table by join/aggregation key at WRITE
  * time: two tables bucketed the same way join with NO exchange on
  * either side (the planner proves co-location from the catalog), and
  * a groupBy on the bucket key skips its shuffle too. At 100 TB this
  * converts every recurring fact-fact join on a stable key from a
  * full-network shuffle into a local merge — the single biggest
  * recurring-cost lever a warehouse layout owns. The cost is paid once
  * at write (hash-distribute + optional sort per bucket).
  */
object Layout {

  /** Write `df` as a bucketed, per-bucket-sorted catalog table.
    * Bucket count is a layout constant — both sides of a co-located
    * join must use the SAME count (at 100 TB pick it so a bucket fits
    * an executor's sort memory; 2-4× the executor count is typical).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, key: String): Unit =
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .format("parquet")
      .saveAsTable(table)

  /** Write `df` range-clustered on `sortCol`: range-partition so each
    * file owns a contiguous key range, sort within partitions so each
    * parquet ROW GROUP owns a contiguous sub-range. Point/range
    * predicates on `sortCol` then skip whole row groups via parquet
    * min/max statistics — at 100 TB this is the difference between
    * scanning a day and scanning the table for a time-range query.
    * `rowGroupBytes` bounds row-group size (pruning granularity). */
  def writeSorted(df: DataFrame, path: String, sortCol: String,
                  rowGroupBytes: Long = 128L * 1024 * 1024): Unit =
    df.repartitionByRange(org.apache.spark.sql.functions.col(sortCol))
      .sortWithinPartitions(sortCol)
      .write
      .option("parquet.block.size", rowGroupBytes.toString)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
}
