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

  /** Write `df` hive-partitioned on `partitionCol`: one directory per
    * partition value. Queries filtering on the partition column — or
    * joining it against a filtered dimension (dynamic partition
    * pruning) — skip whole directories at PLANNING time, before a
    * single byte is read. At 100 TB this is the single biggest scan
    * lever a fact layout owns: a date-partitioned table turns "scan 7
    * years" into "scan the queried month". Partition count is the
    * design constraint — pick a key with enough cardinality to prune
    * (days/months) but few enough directories that listing stays cheap
    * (thousands, not millions; mirrors the reference's partitioned
    * sink DDL, ddl/create_impala_kudu_table.sql:14). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .partitionBy(partitionCol)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)

  /** Path of a month-partitioned copy of `orders` (`o_month=yyyy-MM`
    * hive directories, ~80 partitions over the TPC-H date span).
    * Written once per JVM per source dir — the layout cost is paid at
    * write time, exactly once, like any warehouse fact table; queries
    * and benchmarks then measure the pruned-read benefit. */
  private val partitionedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  def partitionedOrders(spark: org.apache.spark.sql.SparkSession, sfDir: String): String =
    partitionedDirs.computeIfAbsent(sfDir, (_: String) => {
      import org.apache.spark.sql.functions.{col, date_format}
      val path = java.nio.file.Files.createTempDirectory("graft-orders-bymonth").toString
      writePartitioned(
        graft.Tables.orders(spark, sfDir)
          .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM")),
        path, "o_month")
      path
    })

  /** The COMBINED fact layout: hive date partitions × hash buckets in
    * one catalog table — `partitionBy` gives scan pruning on the date
    * axis, `bucketBy` gives shuffle-free joins/aggregations on the key
    * axis, independently and simultaneously. This is the Spark-native
    * equivalent of the reference's Kudu partitioned sink DDL
    * (hash-partitioned primary key, `ddl/create_impala_kudu_table
    * .sql:14`) extended with the date dimension every 100 TB fact
    * table partitions on. */
  def writePartitionedBucketed(df: DataFrame, table: String, partitionCol: String,
                               buckets: Int, key: String): Unit =
    df.write
      .partitionBy(partitionCol)
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

  /** Write `df` Z-ORDER clustered on TWO integer keys: each key is
    * min/max-normalized into 16-bit space (one distributed agg pass —
    * no global sort), the bits are interleaved into a 32-bit Morton
    * code, and the data is range-partitioned + sorted on that code.
    * Row groups then own small RECTANGLES of the (a, b) key plane, so
    * parquet min/max stats prune on predicates over EITHER column or
    * both — the multi-column analogue of [[writeSorted]] (which prunes
    * on exactly one). The single-column trade: each dimension's
    * pruning power is ~√(groups) instead of groups. Same lever
    * Delta OPTIMIZE ZORDER BY pulls at 100 TB. */
  def writeZOrdered(df: DataFrame, path: String, colA: String, colB: String,
                    rowGroupBytes: Long = 128L * 1024 * 1024): Unit = {
    import org.apache.spark.sql.functions._
    val b = df.agg(
      min(col(colA)).cast("long"), max(col(colA)).cast("long"),
      min(col(colB)).cast("long"), max(col(colB)).cast("long")).head()
    val (loA, hiA, loB, hiB) = (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    // RATIO-FIRST normalization: the integer form ((c - lo) * 65535)
    // overflows a long once the key range is wider than ~2^47 (throws
    // under ANSI mode). Dividing first keeps every intermediate in
    // [0, 1] × 65535. Double math is not exact above 2^53, but the map
    // only needs 16-bit resolution and MONOTONICITY — long→double
    // conversion and positive-constant arithmetic are both monotone —
    // so min/max row-group pruning stays correct for the FULL signed-
    // long key range (span computed in double: no hi-lo overflow).
    def norm(c: String, lo: Long, hi: Long) = {
      val span = math.max(1.0, hi.toDouble - lo.toDouble)
      least(lit(65535L),
        floor((col(c).cast("long").cast("double") - lit(lo.toDouble)) / lit(span) * 65535.0)
          .cast("long"))
    }
    val z = df
      .withColumn("__za", norm(colA, loA, hiA))
      .withColumn("__zb", norm(colB, loB, hiB))
      .withColumn("__z", expr(
        "aggregate(sequence(0, 15), 0L, (acc, i) -> " +
          "acc | shiftleft((__za >> i) & 1, 2 * i) | shiftleft((__zb >> i) & 1, 2 * i + 1))"))
    z.repartitionByRange(col("__z"))
      .sortWithinPartitions("__z")
      .drop("__za", "__zb", "__z")
      .write
      .option("parquet.block.size", rowGroupBytes.toString)
      .mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(path)
  }
}
