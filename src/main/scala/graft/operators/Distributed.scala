package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed per-group prefix aggregates WITHOUT a single-task-per-
  * group window — the generalization of q87's global-rank plan
  * ([[Pipeline.q87DeterministicShuffle]]) to grouped running sums and
  * grouped row numbers.
  *
  * `Window.partitionBy(group).orderBy(order)` caps sort parallelism at
  * the number of GROUPS: on a mostly-English 100 TB corpus, one task
  * sorts essentially the whole corpus (the round-3 q60/q80 scale
  * killer). The scale-safe plan:
  *
  *   1. range-repartition on (group ++ order) — RangePartitioner
  *      guarantees partition i holds smaller keys than i+1, so a
  *      group's rows occupy a CONTIGUOUS partition run;
  *   2. compute the running aggregate locally per (partition, group) —
  *      parallelism = partition count, independent of group count;
  *   3. aggregate one (partition, group) subtotal row each (metadata
  *      scale: partitions × groups-touching-them rows), prefix-sum the
  *      subtotals per group with a cheap window over that tiny frame,
  *      and broadcast-join the offsets back.
  *
  * Cost at any scale: ONE range shuffle + one local sort + a broadcast
  * of a metadata-sized offset table; no task ever holds more than a
  * partition.
  */
object Distributed {

  /** Spread a CPU-heavy per-row stage across the cluster when the
    * upstream scan under-splits: a few-MB parquet file scans as ONE
    * partition, so everything until the first exchange runs
    * single-core (measured 8.5 s vs 0.7 s on the near-dup sketch). At
    * warehouse scale the scan splits by block and this is a NO-OP
    * (partition count ≥ default parallelism ⇒ plan unchanged, no
    * shuffle added) — the guard exists precisely so small inputs don't
    * serialize compute that big inputs parallelize for free. */
  def parallelized(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  private def parted(df: DataFrame, group: Seq[String], order: Seq[String]): DataFrame =
    df.repartitionByRange((group ++ order).map(col): _*)
      .withColumn("__pid", spark_partition_id())

  private def requireIntegral(df: DataFrame, value: String): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(value).dataType
    require(Seq[org.apache.spark.sql.types.DataType](
        ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"groupedPrefixSum carries the running sum as long; '$value' is $dt — " +
        "cast or scale fractional values explicitly at the call site")
  }

  private def withOffsets(parted: DataFrame, group: Seq[String], subtotal: Column,
                          local: DataFrame): DataFrame = {
    // per-(partition, group) subtotals; prefix-summed per group in
    // __pid order (range partitions are key-ordered), tiny frame
    val offW = Window.partitionBy(group.map(col): _*).orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val keyCols = "__pid" +: group
    val offsets = parted.groupBy(keyCols.map(col): _*)
      .agg(subtotal.as("__n"))
      .withColumn("__off", coalesce(sum("__n").over(offW), lit(0L)))
      // null-SAFE join keys: a null group value is a legitimate group
      // for window semantics (groupBy/partitionBy both treat it as
      // one); a plain equi-join would silently drop its rows
      .select(keyCols.map(c => col(c).as(s"__o_$c")) :+ col("__off"): _*)
    // renamed offset keys make every name unique, so unqualified col()
    // resolves unambiguously across the self-derived join
    val cond = keyCols.map(c => col(c) <=> col(s"__o_$c")).reduce(_ && _)
    local.join(broadcast(offsets), cond)
      .drop(keyCols.map(c => s"__o_$c"): _*)
  }

  /** Per-group EXCLUSIVE running sum of `value` in `order` order
    * (sum of all strictly-preceding rows; 0 for the group's first row),
    * added as long column `out`. Equivalent to
    * `sum(value).over(Window.partitionBy(group).orderBy(order)
    * .rowsBetween(unboundedPreceding, -1))` with nulls coalesced to 0,
    * but with partition-count parallelism. `order` must be unique
    * within each group for a deterministic result. */
  def groupedPrefixSum(df: DataFrame, group: Seq[String], order: Seq[String],
                       value: String, out: String): DataFrame = {
    requireIntegral(df, value)
    val p = parted(df, group, order)
    val localW = Window.partitionBy(("__pid" +: group).map(col): _*)
      .orderBy(order.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = p.withColumn("__local",
      coalesce(sum(col(value)).over(localW).cast("long"), lit(0L)))
    withOffsets(p, group, sum(col(value)).cast("long"), local)
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }

  /** Per-group global row number (1-based) in `order` order, added as
    * long column `out`. Ties in `order` get an arbitrary-but-total
    * order (same contract as `row_number` itself). */
  def groupedRowNumber(df: DataFrame, group: Seq[String], order: Seq[String],
                       out: String): DataFrame = {
    val p = parted(df, group, order)
    val localW = Window.partitionBy(("__pid" +: group).map(col): _*)
      .orderBy(order.map(col): _*)
    val local = p.withColumn("__local", row_number().over(localW).cast("long"))
    withOffsets(p, group, count(lit(1)), local)
      .withColumn(out, col("__local") + col("__off"))
      .drop("__pid", "__local", "__off")
  }
}
