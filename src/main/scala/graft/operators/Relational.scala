package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** The relational operator inventory (SURVEY.md §2.4–§2.7): aggregations,
  * joins (equi / broadcast / semi / anti / range / as-of), window
  * functions, sorts/limits, set ops, rollup/pivot, scalar & JSON
  * functions — each declared as a DataFrame plan so Catalyst handles
  * pushdown, pruning, partial aggregation, join selection, and AQE.
  *
  * Scale notes per query are in the Scaladoc — the same plans run on a
  * 1000-executor cluster: fact-fact joins shuffle on their keys, dim
  * joins broadcast, aggregations are partial+final (map-side combine).
  */
object Relational {
  import QueryDef.{rowsOnly, sql}

  /** TPC-H Q1-style pricing summary. Scale: partial aggregation on 6
    * grouping values → tiny shuffle regardless of input size; filter and
    * 7-column projection push into the parquet scan.
    * Semantics from the reference's one aggregation query
    * (KafkaToKuduScala.scala:39-45) widened to grouped form. */
  val q01PricingSummary: QueryDef = sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |       ROUND(SUM(l_quantity), 2)        AS sum_qty,
      |       ROUND(SUM(l_extendedprice), 2)   AS sum_base_price,
      |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |       ROUND(AVG(l_quantity), 2)        AS avg_qty,
      |       ROUND(AVG(l_extendedprice), 2)   AS avg_price,
      |       ROUND(AVG(l_discount), 4)        AS avg_disc,
      |       COUNT(*)                         AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg("l_quantity"), 2).as("avg_qty"),
        round(avg("l_extendedprice"), 2).as("avg_price"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** The reference's global traffic aggregation (SURVEY §2.4 A1–A4,
    * KafkaToKuduScala.scala:39-45) re-expressed over `events` with a
    * deterministic key policy (no UNIX_TIMESTAMP(); SURVEY §7.1).
    * Scale: global agg = partial per partition + single-row final. */
  val q02GlobalStats: QueryDef = sql(
    "q02_global_stats",
    """SELECT ROUND(AVG(value), 2)  AS avg_val,
      |       MIN(value)            AS min_val,
      |       MAX(value)            AS max_val,
      |       MIN(epoch_ms(ts))     AS first_ts_ms,
      |       MAX(epoch_ms(ts))     AS last_ts_ms,
      |       COUNT(*)              AS n_events
      |FROM events""".stripMargin) { (s, d) =>
    Tables.events(s, d).agg(
      round(avg("value"), 2).as("avg_val"),
      min("value").as("min_val"),
      max("value").as("max_val"),
      min(expr("unix_millis(ts)")).as("first_ts_ms"),
      max(expr("unix_millis(ts)")).as("last_ts_ms"),
      count(lit(1)).as("n_events"))
  }

  /** Shuffle (sort-merge/hash) equi join fact⋈dim + grouped agg.
    * Scale: orders shuffles on o_custkey; at 100 TB AQE picks the join
    * strategy; customer side would broadcast if filtered small. */
  val q03CustomerOrderStats: QueryDef = sql(
    "q03_customer_order_stats",
    """SELECT c_mktsegment,
      |       COUNT(*)                        AS n_orders,
      |       ROUND(SUM(o_totalprice), 2)     AS total_revenue,
      |       ROUND(AVG(o_totalprice), 2)     AS avg_order_value,
      |       CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_customers
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("total_revenue"),
        round(avg("o_totalprice"), 2).as("avg_order_value"),
        countDistinct(col("c_custkey")).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Multi-way join with explicit broadcast of the dimension tables
    * (TPC-H Q5 shape). Scale: only lineitem⋈supplier shuffles; nation
    * and region are broadcast — no shuffle for dims at any SF. */
  val q04RevenueByRegion: QueryDef = sql(
    "q04_revenue_by_region",
    """SELECT r_name, n_name,
      |       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |       COUNT(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name
      |ORDER BY r_name, n_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name", "n_name")
  }

  /** Left-semi join (EXISTS). Scale: semi join never duplicates rows and
    * short-circuits per key; broadcast-able when the filter side fits. */
  val q05SemiJoin: QueryDef = sql(
    "q05_customers_with_orders",
    """SELECT c_mktsegment, COUNT(*) AS n_customers
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Left-anti join (NOT EXISTS). */
  val q06AntiJoin: QueryDef = sql(
    "q06_customers_without_orders",
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name", "c_mktsegment")
      .orderBy("c_custkey")
  }

  /** Ranking window function: top-3 parts per brand (SURVEY §2.7 window
    * functions). Scale: single shuffle on the partition key; row_number
    * streams per partition — no global sort. */
  val q07TopPartsPerBrand: QueryDef = sql(
    "q07_top_parts_per_brand",
    """SELECT p_brand, p_partkey, p_name, p_retailprice,
      |       CAST(rn AS BIGINT) AS rn
      |FROM (SELECT p_brand, p_partkey, p_name, p_retailprice,
      |             ROW_NUMBER() OVER (PARTITION BY p_brand
      |                                ORDER BY p_retailprice DESC, p_partkey) AS rn
      |      FROM part) t
      |WHERE rn <= 3
      |ORDER BY p_brand, rn""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, d)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
      .orderBy("p_brand", "rn")
  }

  /** Analytic window functions: running total + lag per customer. */
  val q08RunningTotal: QueryDef = sql(
    "q08_customer_running_total",
    """SELECT o_custkey, o_orderkey, o_totalprice,
      |       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
      |       LAG(o_totalprice, 1) OVER (PARTITION BY o_custkey
      |             ORDER BY o_orderdate, o_orderkey) AS prev_price
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        round(sum("o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 2)
          .as("running_total"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** Sort + limit (top-k). Scale: Catalyst plans TakeOrderedAndProject —
    * per-partition top-k then merge on the driver; no global sort. */
  val q09TopOrders: QueryDef = sql(
    "q09_top_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
  }

  /** Set operations: INTERSECT / EXCEPT / UNION over nation keys. */
  val q10SetOps: QueryDef = sql(
    "q10_setops_nations",
    """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
      |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
      |SELECT nationkey, 'both' AS tag          FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'customer_only' AS tag FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
      |UNION ALL
      |SELECT nationkey, 'supplier_only' AS tag FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
      |ORDER BY tag, nationkey""".stripMargin) { (s, d) =>
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
    cn.intersect(sn).withColumn("tag", lit("both"))
      .unionByName(cn.except(sn).withColumn("tag", lit("customer_only")))
      .unionByName(sn.except(cn).withColumn("tag", lit("supplier_only")))
      .orderBy("tag", "nationkey")
  }

  /** ROLLUP with GROUPING() indicators (SURVEY §2.7 grouping sets). */
  val q11Rollup: QueryDef = sql(
    "q11_rollup_lineitem",
    """SELECT l_returnflag, l_linestatus,
      |       ROUND(SUM(l_quantity), 2) AS sum_qty,
      |       COUNT(*) AS n,
      |       CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |       CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        count(lit(1)).as("n"),
        grouping(col("l_returnflag")).cast("long").as("g_rf"),
        grouping(col("l_linestatus")).cast("long").as("g_ls"))
      .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")
  }

  /** JSON extraction over events.props (SURVEY §2.7 json functions). */
  val q12JsonExtract: QueryDef = sql(
    "q12_json_extract",
    """SELECT event_type,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       ROUND(AVG(CAST(json_extract_string(props, '$.k') AS BIGINT)), 2) AS avg_k,
      |       CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, d)
      .select(col("event_type"), k.as("k"))
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        sum("k").as("sum_k"),
        round(avg("k"), 2).as("avg_k"),
        max("k").as("max_k"))
      .orderBy("event_type")
  }

  /** Date/time functions: year/month bucketing. */
  val q13OrdersByMonth: QueryDef = sql(
    "q13_orders_by_month",
    """SELECT CAST(year(o_orderdate) AS BIGINT)  AS yr,
      |       CAST(month(o_orderdate) AS BIGINT) AS mon,
      |       COUNT(*) AS n_orders,
      |       ROUND(SUM(o_totalprice), 2) AS revenue
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, mon""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mon"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(sum("o_totalprice"), 2).as("revenue"))
      .orderBy("yr", "mon")
  }

  /** String functions: upper/substring/length/concat_ws/regexp/LIKE.
    * (DuckDB regexp_replace needs the 'g' flag to match Spark's
    * replace-all semantics.) */
  val q14StringFuncs: QueryDef = sql(
    "q14_string_funcs",
    """SELECT p_partkey,
      |       UPPER(p_name)                              AS name_upper,
      |       SUBSTRING(p_type, 1, 3)                    AS type_prefix,
      |       CAST(LENGTH(p_name) AS BIGINT)             AS name_len,
      |       CONCAT_WS('/', p_brand, p_type)            AS brand_type,
      |       regexp_replace(p_name, '[aeiou]', '', 'g') AS name_novowel
      |FROM part
      |WHERE p_name LIKE '%widget%'
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .filter(col("p_name").like("%widget%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("name_upper"),
        substring(col("p_type"), 1, 3).as("type_prefix"),
        length(col("p_name")).cast("long").as("name_len"),
        concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
        regexp_replace(col("p_name"), "[aeiou]", "").as("name_novowel"))
      .orderBy("p_partkey")
  }

  /** Conditional aggregation (CASE WHEN inside aggregates). */
  val q15CaseAgg: QueryDef = sql(
    "q15_conditional_agg",
    """SELECT o_orderpriority,
      |       ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS finished_total,
      |       COUNT(CASE WHEN o_totalprice > 100000 THEN 1 END) AS n_big,
      |       ROUND(AVG(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2) AS avg_open
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_orderpriority")
      .agg(
        round(sum(when(col("o_orderstatus") === "F", col("o_totalprice")).otherwise(lit(0.0))), 2)
          .as("finished_total"),
        count(when(col("o_totalprice") > 100000, lit(1))).as("n_big"),
        round(avg(when(col("o_orderstatus") === "O", col("o_totalprice"))), 2).as("avg_open"))
      .orderBy("o_orderpriority")
  }

  /** IN-subquery (planned as a semi join in the DataFrame form). */
  val q16InSubquery: QueryDef = sql(
    "q16_in_subquery",
    """SELECT o_orderstatus, COUNT(*) AS n,
      |       ROUND(SUM(o_totalprice), 2) AS total
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    val richCust = Tables.customer(s, d).filter(col("c_acctbal") > 5000).select("c_custkey")
    Tables.orders(s, d)
      .join(richCust, col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))
      .orderBy("o_orderstatus")
  }

  /** Scalar math functions (abs/ceil/floor/sqrt/ln/pow) — all codegen'd
    * Catalyst expressions, no UDFs (SURVEY §2.5). */
  val q17ScalarMath: QueryDef = sql(
    "q17_scalar_math",
    """SELECT l_orderkey, l_linenumber,
      |       ABS(l_discount - 0.05)                        AS abs_disc,
      |       CAST(CEIL(l_extendedprice) AS BIGINT)         AS price_ceil,
      |       CAST(FLOOR(l_extendedprice) AS BIGINT)        AS price_floor,
      |       ROUND(SQRT(l_extendedprice), 4)               AS price_sqrt,
      |       ROUND(LN(l_extendedprice + 1), 4)             AS price_ln,
      |       ROUND(POW(l_quantity, 2), 2)                  AS qty_sq
      |FROM lineitem
      |WHERE l_orderkey <= 100
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_orderkey") <= 100)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_disc"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        round(sqrt(col("l_extendedprice")), 4).as("price_sqrt"),
        round(log(col("l_extendedprice") + 1), 4).as("price_ln"),
        round(pow(col("l_quantity"), 2), 2).as("qty_sq"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Band (interval) join against a small in-memory dimension —
    * broadcast nested-loop on a range predicate. Scale: the band dim is
    * O(1) rows → broadcast; the fact side never shuffles. */
  val q18BandJoin: QueryDef = sql(
    "q18_price_band_join",
    """SELECT band, COUNT(*) AS n_parts, ROUND(AVG(p_retailprice), 2) AS avg_price
      |FROM part
      |JOIN (VALUES ('low', 900.0, 907.0), ('mid', 907.0, 914.0), ('high', 914.0, 921.0))
      |     AS b(band, lo, hi)
      |  ON p_retailprice >= lo AND p_retailprice < hi
      |GROUP BY band
      |ORDER BY band""".stripMargin) { (s, d) =>
    import s.implicits._
    val bands = Seq(("low", 900.0, 907.0), ("mid", 907.0, 914.0), ("high", 914.0, 921.0))
      .toDF("band", "lo", "hi")
    Tables.part(s, d)
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy("band")
      .agg(count(lit(1)).as("n_parts"), round(avg("p_retailprice"), 2).as("avg_price"))
      .orderBy("band")
  }

  /** Equi + range join: lineitems shipped within 90 days of order date.
    * Scale: the equi key carries the shuffle; the range predicate is a
    * post-join filter — no nested-loop blowup. */
  val q19DateRangeJoin: QueryDef = sql(
    "q19_date_range_join",
    """SELECT o_orderstatus, COUNT(*) AS n_items,
      |       ROUND(SUM(l_extendedprice), 2) AS total_price
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |           AND l_shipdate >= o_orderdate
      |           AND l_shipdate <= o_orderdate + INTERVAL 90 DAY
      |GROUP BY o_orderstatus
      |ORDER BY o_orderstatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(
        Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") >= col("o_orderdate")
          && col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL '90' DAY"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_items"), round(sum("l_extendedprice"), 2).as("total_price"))
      .orderBy("o_orderstatus")
  }

  /** Pivot (Spark `pivot`; oracle via conditional aggregation). */
  val q20Pivot: QueryDef = sql(
    "q20_pivot_returnflag",
    """SELECT l_linestatus,
      |       ROUND(SUM(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2) AS "A",
      |       ROUND(SUM(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2) AS "N",
      |       ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2) AS "R"
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(round(sum("l_quantity"), 2))
      .orderBy("l_linestatus")
  }

  /** Statistical aggregates: stddev/variance/correlation (sample). */
  val q21Stats: QueryDef = sql(
    "q21_stat_aggregates",
    """SELECT l_returnflag,
      |       ROUND(STDDEV_SAMP(l_quantity), 4)      AS sd_qty,
      |       ROUND(VAR_SAMP(l_extendedprice), 2)    AS var_price,
      |       ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qty_price,
      |       ROUND(MIN(l_quantity), 2)              AS min_qty,
      |       ROUND(MAX(l_quantity), 2)              AS max_qty
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
        round(min("l_quantity"), 2).as("min_qty"),
        round(max("l_quantity"), 2).as("max_qty"))
      .orderBy("l_returnflag")
  }

  /** Exact distinct + approximate distinct (HLL). The approx count is
    * engine-specific (Spark HLL++ vs DuckDB HLL differ by design), so
    * the oracle covers the exact column; approx is asserted in the
    * ScalaTest spec to be within 5% of exact. Scale: approx_count_
    * distinct is the 100 TB path — constant memory per group. */
  val q22Distinct: QueryDef = sql(
    "q22_distinct_parts_per_status",
    """SELECT l_linestatus,
      |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
      |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps
      |FROM lineitem
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_linestatus")
      .agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_suppkey")).as("exact_supps"))
      .orderBy("l_linestatus")
  }

  val all: Seq[QueryDef] = Seq(
    q01PricingSummary, q02GlobalStats, q03CustomerOrderStats, q04RevenueByRegion,
    q05SemiJoin, q06AntiJoin, q07TopPartsPerBrand, q08RunningTotal, q09TopOrders,
    q10SetOps, q11Rollup, q12JsonExtract, q13OrdersByMonth, q14StringFuncs,
    q15CaseAgg, q16InSubquery, q17ScalarMath, q18BandJoin, q19DateRangeJoin,
    q20Pivot, q21Stats, q22Distinct)
}
