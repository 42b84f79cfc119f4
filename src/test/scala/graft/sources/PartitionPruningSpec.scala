package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}
import graft.operators.Warehouse

/** Pins the partition-pruning contract of the month-partitioned fact
  * layout (`Layout.partitionedOrders`) at the PLAN level:
  *
  *  - static pruning: a literal partition predicate lists ONE
  *    directory of ~80 into the scan (files touched shrink with the
  *    predicate, before any read);
  *  - dynamic partition pruning: with the filter ONLY on a joined
  *    dimension, the fact scan still carries a
  *    DynamicPruningExpression partition filter and reads only the
  *    dim-selected partitions' rows.
  *
  * These are the two scan levers that keep a 100 TB date-partitioned
  * fact readable: both must be visible in the executed plan, not just
  * produce correct answers.
  */
class PartitionPruningSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = SharedSpark.sf0001

  private def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
    case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
    case q: QueryStageExec => deep(q.plan)
    case other => other.children.flatMap(deep)
  })

  /** The (single) parquet scan of the partitioned fact table in df's
    * FINAL adaptive plan. collect() first so AQE finalizes stages. */
  private def factScan(df: DataFrame): FileSourceScanExec = {
    df.collect()
    deep(df.queryExecution.executedPlan)
      .collectFirst { case s: FileSourceScanExec if s.toString.contains("o_month") => s }
      .getOrElse(fail(s"no partitioned scan in plan:\n${df.queryExecution.executedPlan}"))
  }

  test("static partition pruning: literal month predicate lists one directory") {
    val path = Layout.partitionedOrders(spark, sf)
    val full = factScan(spark.read.parquet(path).groupBy("o_month").count())
    val pruned = factScan(spark.read.parquet(path).filter(col("o_month") === "1995-03")
      .groupBy("o_orderpriority").count())
    assert(pruned.partitionFilters.nonEmpty, "pruned scan must carry partition filters")
    val fullFiles = full.metrics("numFiles").value
    val prunedFiles = pruned.metrics("numFiles").value
    info(s"files: full=$fullFiles pruned=$prunedFiles")
    assert(fullFiles >= 50, s"month layout should have ~80 partitions, saw $fullFiles files")
    assert(prunedFiles <= fullFiles / 20,
      s"literal month predicate should prune to ~1/80 of files: $prunedFiles of $fullFiles")
    // pruning must not change the answer
    val expect = Tables.orders(spark, sf)
      .filter(date_format(col("o_orderdate"), "yyyy-MM") === "1995-03").count()
    assert(spark.read.parquet(path).filter(col("o_month") === "1995-03").count() == expect)
  }

  test("combined layout: date partitions prune AND bucketed join skips its shuffle, simultaneously") {
    import org.apache.spark.sql.functions.{count, lit}
    val withMonth = Tables.orders(spark, sf)
      .withColumn("o_month", date_format(col("o_orderdate"), "yyyy-MM"))
    Layout.writePartitionedBucketed(withMonth, "orders_pb", "o_month", 8, "o_custkey")
    Layout.writeBucketed(Tables.customer(spark, sf), "customer_pb_dim", 8, "c_custkey")
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_pb")
        .filter(col("o_month").between("1995-01", "1995-12"))
        .join(spark.table("customer_pb_dim"), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      joined.collect()
      val plans = deep(joined.queryExecution.executedPlan)
      // axis 1: the date predicate pruned partition directories
      val factScan = plans.collectFirst {
        case s: FileSourceScanExec if s.toString.contains("o_month") => s
      }.getOrElse(fail("no fact scan"))
      assert(factScan.partitionFilters.nonEmpty, "fact scan must carry partition filters")
      // count files of an unpruned scan for comparison
      val unprunedScan = {
        val df = spark.table("orders_pb").groupBy("o_custkey").count()
        df.collect()
        deep(df.queryExecution.executedPlan)
          .collectFirst { case s: FileSourceScanExec => s }.get
      }
      val prunedFiles = factScan.metrics("numFiles").value
      val allFiles = unprunedScan.metrics("numFiles").value
      info(s"files: pruned=$prunedFiles all=$allFiles")
      assert(prunedFiles < allFiles / 3,
        s"date filter should prune most partitions: $prunedFiles of $allFiles")
      // axis 2: the join is a sort-merge over co-located buckets — no
      // shuffle under either side
      val smjs = plans.collect {
        case s: org.apache.spark.sql.execution.joins.SortMergeJoinExec => s
      }
      assert(smjs.nonEmpty, s"expected sort-merge join:\n${plans.head}")
      val shuffles = smjs.flatMap(deep).collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
      }
      assert(shuffles.isEmpty, s"bucketed join must not shuffle:\n${plans.head}")
      // and the answer matches the plain computation
      val expect = Tables.orders(spark, sf)
        .filter(date_format(col("o_orderdate"), "yyyy-MM").between("1995-01", "1995-12"))
        .join(Tables.customer(spark, sf), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_pb")
      spark.sql("DROP TABLE IF EXISTS customer_pb_dim")
    }
  }

  test("dynamic partition pruning: dim-join filter reaches the fact scan") {
    val df = Warehouse.q76PartitionedDpp.fn(spark, sf)
    val scan = factScan(df)
    // the fact query has no literal date predicate — a partition filter
    // on the scan can only have come from the dim join (DPP)
    assert(scan.partitionFilters.nonEmpty,
      s"fact scan must carry a dynamic partition filter:\n$scan")
    val dynamic = scan.partitionFilters.exists(
      _.find(_.getClass.getSimpleName == "DynamicPruningExpression").isDefined)
    assert(dynamic, s"expected DynamicPruningExpression in partition filters: " +
      s"${scan.partitionFilters}")
    // and the scan read only 1995's rows, not the whole fact
    val total = Tables.orders(spark, sf).count()
    val y1995 = Tables.orders(spark, sf).filter(year(col("o_orderdate")) === 1995).count()
    val scanned = scan.metrics("numOutputRows").value
    info(s"scanned=$scanned y1995=$y1995 total=$total")
    assert(scanned == y1995, s"DPP scan should read exactly 1995's partitions: $scanned vs $y1995")
    assert(scanned < total / 4, "DPP scan must be a fraction of the full fact")
  }
}
