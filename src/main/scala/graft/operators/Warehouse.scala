package graft.operators

import org.apache.spark.sql.Column
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

  /** Keyed-upsert round-trip through the DSv2 catalog, oracle-checked:
    * batch 1 = per-customer order stats for 1992-1995 (CTAS), batch 2 =
    * the SAME stats for 1996+ upserted over it (append ⇒ upsert,
    * full-row last-writer-wins). The read-back equals "batch-2 row when
    * the customer ordered in 1996+, else batch-1 row" — which DuckDB
    * replays over the raw orders, so the driver gate checks the store's
    * merge semantics AND the catalog write/read paths end-to-end. */
  val q78UpsertRoundtrip: QueryDef = sql(
    "q78_upsert_roundtrip",
    """WITH b1 AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |         ROUND(SUM(o_totalprice), 2) AS total
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1),
      |b2 AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |         ROUND(SUM(o_totalprice), 2) AS total
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01' GROUP BY 1)
      |SELECT custkey, n_orders, total FROM b2
      |UNION ALL
      |SELECT custkey, n_orders, total FROM b1
      |WHERE custkey NOT IN (SELECT custkey FROM b2)
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path",
        graft.Scratch.dir("graft-wh"))
    }
    def stats(pred: Column) = Tables.orders(s, d)
      .filter(pred)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
    val cut = lit("1996-01-01").cast("timestamp")
    s.sql("DROP TABLE IF EXISTS graft.q78_state")
    stats(col("o_orderdate") < cut)
      .writeTo("graft.q78_state").tableProperty("keys", "custkey").create()
    stats(col("o_orderdate") >= cut)
      .writeTo("graft.q78_state").append()
    s.table("graft.q78_state").orderBy("custkey")
  }

  /** Bucketed co-located join, oracle-checked: orders and customer are
    * written `bucketBy(custkey)` ONCE per source dir, then joined from
    * the catalog. The no-shuffle plan property is pinned by
    * BucketingSpec; this query puts the bucketed COPIES' faithfulness
    * under the driver's hash gate (a mis-bucketed or dropped row would
    * mismatch the plain-parquet oracle). */
  val q79BucketedJoin: QueryDef = sql(
    "q79_bucketed_join",
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |       ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    val (ordersTbl, custTbl) = Warehouse.bucketedPair(s, d)
    s.table(ordersTbl)
      .join(s.table(custTbl), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Bucketed (orders, customer) catalog tables for `sfDir`, written
    * once per JVM per source dir (the pay-at-write layout contract —
    * recurring joins then read co-located buckets). */
  private val bucketedTables = new java.util.concurrent.ConcurrentHashMap[String, (String, String)]()
  private def bucketedPair(s: org.apache.spark.sql.SparkSession, sfDir: String): (String, String) =
    bucketedTables.computeIfAbsent(sfDir, (_: String) => {
      val suffix = java.lang.Integer.toHexString(sfDir.hashCode)
      val o = s"orders_bkt_$suffix"; val c = s"customer_bkt_$suffix"
      Seq(o, c).foreach { t =>
        // a previous JVM may have left the managed-table LOCATION on
        // disk without a catalog entry (saveAsTable then refuses even
        // in Overwrite mode) — drop both the entry and the directory
        s.sql(s"DROP TABLE IF EXISTS $t")
        val wh = new org.apache.hadoop.fs.Path(s.conf.get("spark.sql.warehouse.dir"), t)
        val fs = wh.getFileSystem(s.sparkContext.hadoopConfiguration)
        if (fs.exists(wh)) fs.delete(wh, true)
      }
      Layout.writeBucketed(Tables.orders(s, sfDir), o, 8, "o_custkey")
      Layout.writeBucketed(Tables.customer(s, sfDir), c, 8, "c_custkey")
      (o, c)
    })

  /** Z-order-clustered scan, oracle-checked: a box predicate over BOTH
    * clustered keys against the Morton-clustered lineitem copy. The
    * row-group-pruning property is pinned by ZOrderSpec; this query
    * puts the clustered COPY's faithfulness under the driver's hash
    * gate and gives the bench a data-skipping read to time. */
  val q83ZorderScan: QueryDef = sql(
    "q83_zorder_scan",
    """SELECT l_returnflag, COUNT(*) AS n_items,
      |       ROUND(SUM(l_extendedprice), 2) AS revenue
      |FROM lineitem
      |WHERE l_orderkey <= 3000 AND l_partkey <= 500
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    s.read.parquet(Warehouse.zorderedLineitem(s, d))
      .filter(col("l_orderkey") <= 3000 && col("l_partkey") <= 500)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n_items"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy("l_returnflag")
  }

  /** Morton-clustered lineitem copy for `sfDir`, written once per JVM
    * per source dir (16 MB row groups: small enough to prune at test
    * scale, representative granularity). */
  private val zorderedDirs = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def zorderedLineitem(s: org.apache.spark.sql.SparkSession, sfDir: String): String =
    zorderedDirs.computeIfAbsent(sfDir, (_: String) => {
      val path = graft.Scratch.dir("graft-lineitem-z")
      Layout.writeZOrdered(Tables.lineitem(s, sfDir), path,
        "l_orderkey", "l_partkey", rowGroupBytes = 16L * 1024 * 1024)
      path
    })

  /** Change-data-feed roundtrip, oracle-checked: snapshot the
    * pre-1996 per-customer stats (base commit), upsert 1996-H1 stats
    * and then 1996-H2+ stats as two delta commits, and read
    * `changesSince(snapshot)` — exactly the two deltas' rows, tagged
    * with their commit version. The query then does what a real
    * incremental consumer does: folds the feed in commit order
    * (last writer per key wins) and emits the materialized view,
    * which DuckDB replays directly over raw orders — so the driver
    * gate checks that the feed carries exactly the upserted rows AND
    * that applying them in `__commit_version` order reproduces the
    * table's merge semantics. At 100 TB this is the difference
    * between an incremental consumer reading two delta files and
    * re-scanning the whole sink table per sync. */
  val q98UpsertChangefeed: QueryDef = sql(
    "q98_upsert_changefeed",
    """WITH b2 AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |         ROUND(SUM(o_totalprice), 2) AS total
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate <  TIMESTAMP '1996-07-01' GROUP BY 1),
      |b3 AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |         ROUND(SUM(o_totalprice), 2) AS total
      |  FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1)
      |SELECT custkey, n_orders, total FROM b3
      |UNION ALL
      |SELECT custkey, n_orders, total FROM b2
      |WHERE custkey NOT IN (SELECT custkey FROM b3)
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    import graft.streaming.UpsertStore
    def stats(pred: Column) = Tables.orders(s, d)
      .filter(pred)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
    val store = graft.Scratch.dir("graft-cdf") + "/t"
    val (y96, h2) = (lit("1996-01-01").cast("timestamp"), lit("1996-07-01").cast("timestamp"))
    UpsertStore.replace(s, store, stats(col("o_orderdate") < y96), Seq("custkey"))
    val snapshot = UpsertStore.latestVersion(s, store).get
    UpsertStore.upsert(s, store,
      stats(col("o_orderdate") >= y96 && col("o_orderdate") < h2), Seq("custkey"))
    UpsertStore.upsert(s, store, stats(col("o_orderdate") >= h2), Seq("custkey"))
    UpsertStore.changesSince(s, store, snapshot)
      .withColumn("rn", row_number().over(
        Window.partitionBy("custkey").orderBy(col("__commit_version").desc)))
      .filter(col("rn") === 1)
      .select("custkey", "n_orders", "total")
      .orderBy("custkey")
  }

  /** TIME-TRAVEL catalog read, declared end-to-end (VERDICT r12 #7):
    * the q98 store built THROUGH the graft catalog — base commit
    * (pre-1996 per-customer stats), then two delta upserts — and the
    * declared output is SQL `VERSION AS OF` pinned at the MIDDLE
    * commit: the state after base + 1996-H1 but WITHOUT the later
    * H2 upsert that is the store's current tip. The oracle replays
    * that fold directly over raw orders (H1 rows overriding base
    * rows), so the driver's hash compare proves the version-pinned
    * catalog read reconstructs exactly the merge of commits ≤ v —
    * q98's fold AT that version, not the latest snapshot. The
    * snapshot surface (readVersion / V1 `versionAsOf` / crash
    * windows / GC horizon) is pinned by TimeTravelSpec; this row puts
    * the SQL read under the driver's gate. At 100 TB: an audit query
    * over last week's manifest is a pinned-version table read, not a
    * restore. */
  val q161TimeTravelSql: QueryDef = sql(
    "q161_time_travel_sql",
    """WITH b1 AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |         ROUND(SUM(o_totalprice), 2) AS total
      |  FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01' GROUP BY 1),
      |b2 AS (
      |  SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
      |         ROUND(SUM(o_totalprice), 2) AS total
      |  FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |    AND o_orderdate <  TIMESTAMP '1996-07-01' GROUP BY 1)
      |SELECT custkey, n_orders, total FROM b2
      |UNION ALL
      |SELECT custkey, n_orders, total FROM b1
      |WHERE custkey NOT IN (SELECT custkey FROM b2)
      |ORDER BY custkey""".stripMargin) { (s, d) =>
    import graft.streaming.UpsertStore
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[graft.sources.UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path", graft.Scratch.dir("graft-catalog-wh"))
    }
    def stats(pred: Column) = Tables.orders(s, d)
      .filter(pred)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
    val t = s"tt_${PairGraph.dirKey64(d)}"
    val path = s"${PairGraph.catalogWarehouse(s, "graft")}/$t"
    val (y96, h2) = (lit("1996-01-01").cast("timestamp"), lit("1996-07-01").cast("timestamp"))
    UpsertStore.replace(s, path, stats(col("o_orderdate") < y96), Seq("custkey"))
    UpsertStore.upsert(s, path,
      stats(col("o_orderdate") >= y96 && col("o_orderdate") < h2), Seq("custkey"))
    val vMid = UpsertStore.latestVersion(s, path).get
    UpsertStore.upsert(s, path, stats(col("o_orderdate") >= h2), Seq("custkey"))
    PairGraph.ensureTable(s, "graft", t, path, Seq("custkey"))
    s.sql(s"""SELECT custkey, n_orders, total FROM graft.`$t` VERSION AS OF $vMid
             |ORDER BY custkey""".stripMargin)
  }

  /** Star join with an EXPLICIT bloom runtime filter: the selective
    * dimension side (urgent orders) aggregates its join keys into a
    * plan-resident bloom ([[graft.functions.BloomFunctions]] — the
    * same expressions `spark.sql.optimizer.runtime.bloomFilter` would
    * inject, here as a library lever the user controls), and the fact
    * scan drops non-matching rows MAP-SIDE before the exchange. The
    * exact equi-join removes bloom false positives, so the result is
    * identical to the plain join — the oracle replays it unfiltered —
    * while the fact-side shuffle carries ~selectivity·|fact| rows
    * instead of all of them. At 100 TB this is the difference between
    * exchanging a full fact table and exchanging the 20% that can
    * possibly match; the q118 trick on the relational star schema. */
  val q125BloomStarJoin: QueryDef = sql(
    "q125_bloom_star_join",
    """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_items,
      |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    val dim = Tables.orders(s, d)
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderkey"), col("o_orderpriority"))
    val bloom = dim.agg(
      graft.functions.BloomFunctions.bloom_agg(col("o_orderkey"), 1L << 20, 1L << 23)
        .as("bf"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      .filter(graft.functions.BloomFunctions.might_contain(bloom, col("l_orderkey")))
      .join(dim, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy("o_orderpriority")
  }

  val all: Seq[QueryDef] = Seq(
    q76PartitionedDpp, q77PartitionPruneStatic, q78UpsertRoundtrip, q79BucketedJoin,
    q83ZorderScan, q98UpsertChangefeed, q125BloomStarJoin, q161TimeTravelSql)
}
