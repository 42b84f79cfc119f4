package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.scalatest.funsuite.AnyFunSuite

import graft.{SharedSpark, Tables}

/** Z-order clustering: row groups own rectangles of the (a, b) key
  * plane, so min/max stats prune on predicates over EITHER column —
  * where a single-column sort prunes only its own column. Measured on
  * real scans: a `l_partkey` predicate over an `l_orderkey`-sorted
  * layout reads ~everything; the Z-ordered layout skips most row
  * groups for the same predicate, and at least matches single-column
  * pruning on box queries. The 100 TB story: one clustered layout
  * serves range queries on both keys without a second copy.
  */
class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  val sf = "/root/testdata/sf0.01"

  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def deep(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => deep(a.executedPlan)
      case q: QueryStageExec => deep(q.plan)
      case other => other.children.flatMap(deep)
    })
    deep(df.queryExecution.executedPlan)
      .collectFirst { case s: FileSourceScanExec => s.metrics("numOutputRows").value }
      .getOrElse(fail("no FileSourceScan in plan"))
  }

  test("z-order normalization survives a 2^50-wide key range (ratio-first, no long overflow)") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder-wide").toString
    val n = 20000L
    val step = (1L << 50) / n
    // a spans ±2^49 (signed), b spans [step, 2^50] — the integer-first
    // normalization ((c - lo) * 65535) overflows a long here and throws
    // under ANSI mode; the ratio-first form must write and prune
    val df = spark.range(n).select(
      (col("id") * step - (1L << 49)).as("a"),
      ((org.apache.spark.sql.functions.lit(n) - col("id")) * step).as("b"),
      col("id").as("v"))
    Layout.writeZOrdered(df, s"$dir/z", "a", "b", rowGroupBytes = 16 * 1024)
    val back = spark.read.parquet(s"$dir/z")
    assert(back.count() == n)
    val pred = s"a <= ${-(1L << 48)} AND b >= ${step * (n * 3 / 4)}"
    val expected = df.filter(pred).count()
    val boxed = back.filter(pred)
    assert(boxed.count() == expected)
    val read = scanRows(back.filter(pred))
    info(s"wide-range box predicate: read $read of $n rows")
    assert(read < n, s"z-order on a 2^50 range must still prune: read $read of $n")
  }

  test("z-ordered layout prunes row groups on both clustered columns") {
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey", "l_extendedprice")
    val total = li.count()
    val (maxO, maxP) = {
      val r = li.agg(org.apache.spark.sql.functions.max("l_orderkey"),
        org.apache.spark.sql.functions.max("l_partkey")).head()
      (r.getLong(0), r.getLong(1))
    }
    // tiny row groups so the small test table has many prunable groups
    Layout.writeZOrdered(li, s"$dir/z", "l_orderkey", "l_partkey", rowGroupBytes = 16 * 1024)
    Layout.writeSorted(li, s"$dir/bya", "l_orderkey", rowGroupBytes = 16 * 1024)
    val pb = s"l_partkey <= ${maxP / 16}"                    // other-column predicate
    val pbox = s"l_orderkey <= ${maxO / 16} AND $pb"         // box predicate
    def rd(p: String) = (scanRows(spark.read.parquet(s"$dir/z").filter(p)),
      scanRows(spark.read.parquet(s"$dir/bya").filter(p)))
    // identical answers from both layouts
    assert(spark.read.parquet(s"$dir/z").filter(pb).count() ==
      spark.read.parquet(s"$dir/bya").filter(pb).count())
    val (zB, aB) = rd(pb)
    info(s"b-only predicate: z=$zB bya=$aB total=$total")
    assert(aB >= (total * 8) / 10,
      s"a-sorted layout cannot prune a b-predicate: read $aB of $total")
    assert(zB <= aB / 2,
      s"z-order should skip most groups on the OTHER column: z=$zB vs sorted=$aB")
    val (zBox, aBox) = rd(pbox)
    info(s"box predicate: z=$zBox bya=$aBox")
    assert(zBox <= aBox,
      s"z-order must at least match single-column pruning on a box query: $zBox vs $aBox")
  }
}
