package graft.operators

import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}
import graft.sources.Layout

/** Partition-pruned warehouse layout queries.
  *
  * The reference's sink is a partitioned table (hash partitions,
  * `ddl/create_impala_kudu_table.sql:14`) for exactly this reason: a
  * scan that can prove which partitions it needs reads only those. The
  * Spark-native equivalent is a hive-partitioned parquet fact table
  * plus Catalyst's two pruning paths:
  *
  *  - STATIC partition pruning: a literal predicate on the partition
  *    column is resolved against the directory listing at planning
  *    time — unneeded directories are never listed into the scan.
  *  - DYNAMIC partition pruning (DPP): when the filter lives on a
  *    joined dimension ("months of 1995"), Catalyst injects a runtime
  *    subquery filter (`DynamicPruningExpression`) into the fact scan,
  *    reusing the dimension's broadcast — so the fact side still reads
  *    only the partitions the dimension selects, even though the fact
  *    query itself carries no literal date predicate.
  *
  * At 100 TB the fact table is date-partitioned and every dashboard
  * query joins it to a calendar/dim filtered to a window; DPP is what
  * keeps those scans proportional to the window, not the table.
  * `PartitionPruningSpec` pins both plan shapes (pruned directory
  * counts + DynamicPruningExpression in the fact scan).
  */
object Warehouse {
  import QueryDef.sql

  /** Calendar dimension covering the TPC-H order-date span — built
    * independently of the fact (the warehouse date_dim pattern), one
    * row per month. Tiny by construction → always broadcastable. */
  private def monthDim(s: org.apache.spark.sql.SparkSession) = {
    val d0 = add_months(to_date(lit("1992-01-01")), col("id").cast("int"))
    s.range(0, 84).select(
      date_format(d0, "yyyy-MM").as("m_month"),
      year(d0).as("m_year"))
  }

  /** Dynamic partition pruning: month-partitioned `orders` joined to a
    * calendar dim filtered to one year. The fact side has NO literal
    * date predicate — the only filter arrives through the dim join, so
    * a pruned scan proves DPP fired (the spec asserts the
    * DynamicPruningExpression; the oracle proves the answer). */
  val q76PartitionedDpp: QueryDef = sql(
    "q76_partitioned_dpp",
    """SELECT strftime(o_orderdate, '%Y-%m') AS o_month,
      |       COUNT(*) AS n_orders,
      |       ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders
      |WHERE year(o_orderdate) = 1995
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, d) =>
    val fact = s.read.parquet(Layout.partitionedOrders(s, d))
    fact
      .join(broadcast(monthDim(s).filter(col("m_year") === 1995)),
        col("o_month") === col("m_month"))
      .groupBy("o_month")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("o_month")
  }

  /** Static partition pruning: literal predicate on the partition
    * column — the scan lists only the one matching directory. The
    * oracle replays the same month filter over the unpartitioned
    * parquet, proving the partitioned copy is faithful. */
  val q77PartitionPruneStatic: QueryDef = sql(
    "q77_partition_prune_static",
    """SELECT o_orderpriority,
      |       COUNT(*) AS n_orders,
      |       ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders
      |WHERE strftime(o_orderdate, '%Y-%m') = '1995-03'
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    s.read.parquet(Layout.partitionedOrders(s, d))
      .filter(col("o_month") === "1995-03")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[QueryDef] = Seq(q76PartitionedDpp, q77PartitionPruneStatic)
}
