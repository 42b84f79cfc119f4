package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Round-trips the full DSv2 catalog surface against the upsert store:
  * CTAS with a keys property, `writeTo(...).append()` as UPSERT,
  * SQL INSERT INTO / INSERT OVERWRITE, `spark.table` / `SELECT … FROM
  * graft.t` read-back, additive schema evolution visibility, and DROP
  * TABLE — the SURVEY §2.1 S2 "V2 Table registered in a catalog"
  * mapping (the V1 provider keeps covering `format("graft-upsert")`).
  */
class UpsertCatalogSpec extends AnyFunSuite {
  lazy val spark = {
    val s = SharedSpark.spark
    // set-if-absent: suites share one session, so an unconditional
    // re-set here would leave the conf pointing away from the already-
    // instantiated catalog and race concurrently-running suites
    if (!s.conf.getOption("spark.sql.catalog.graft").exists(_.nonEmpty)) {
      s.conf.set("spark.sql.catalog.graft", classOf[UpsertCatalog].getName)
      s.conf.set("spark.sql.catalog.graft.path",
        java.nio.file.Files.createTempDirectory("graft-v2-catalog").toString)
    }
    s
  }

  test("CTAS + append-as-upsert + spark.table round-trip") {
    import spark.implicits._
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "tag", "v")
      .writeTo("graft.t1").tableProperty("keys", "k").create()
    // read-back via catalog
    val t = spark.table("graft.t1")
    assert(t.orderBy("k").collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // append = upsert: k=2 updated in place, k=3 inserted
    Seq((2L, "B", 21.0), (3L, "c", 30.0)).toDF("k", "tag", "v")
      .writeTo("graft.t1").append()
    val after = spark.table("graft.t1").orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(after == Seq((1L, "a", 10.0), (2L, "B", 21.0), (3L, "c", 30.0)),
      s"append must upsert by key, got $after")
  }

  test("SQL surface: SELECT, INSERT INTO (upsert), INSERT OVERWRITE (replace), DROP") {
    import spark.implicits._
    Seq((1L, 100L), (2L, 200L)).toDF("k", "n")
      .writeTo("graft.t2").tableProperty("keys", "k").create()
    assert(spark.sql("SELECT n FROM graft.t2 WHERE k = 2").head().getLong(0) == 200L)
    spark.sql("INSERT INTO graft.t2 VALUES (2, 201), (3, 300)")
    assert(spark.sql("SELECT k, n FROM graft.t2 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 100L), (2L, 201L), (3L, 300L)))
    spark.sql("INSERT OVERWRITE graft.t2 VALUES (9, 900)")
    assert(spark.sql("SELECT k, n FROM graft.t2")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((9L, 900L)))
    spark.sql("DROP TABLE graft.t2")
    val err = intercept[Exception](spark.table("graft.t2").collect())
    assert(err.getMessage.toLowerCase.contains("t2"))
  }

  test("catalog sees additive schema evolution from any write path") {
    import spark.implicits._
    Seq((1L, "x")).toDF("k", "a")
      .writeTo("graft.t3").tableProperty("keys", "k").create()
    // widen through the V1 provider (same store, different API surface)
    val path = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[UpsertCatalog]
      .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, "t3"))
      .properties().get("path")
    graft.streaming.UpsertStore.upsert(
      spark, path, Seq((2L, "y", 5L)).toDF("k", "a", "extra"), Seq("k"))
    val evolved = spark.table("graft.t3")
    assert(evolved.columns.toSeq == Seq("k", "a", "extra"),
      s"catalog schema must reflect the widened store: ${evolved.columns.toSeq}")
    val rows = evolved.orderBy("k")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSeq
    assert(rows == Seq((1L, "x", None), (2L, "y", Some(5L))))
  }

  test("SQL DDL surface: CREATE TABLE, SHOW TABLES, ALTER rejected, RENAME via catalog") {
    import spark.implicits._
    spark.sql(
      "CREATE TABLE graft.ddl_t (k BIGINT, v DOUBLE) TBLPROPERTIES ('keys' = 'k')")
    spark.sql("INSERT INTO graft.ddl_t VALUES (1, 1.5), (2, 2.5)")
    assert(spark.sql("SELECT k, v FROM graft.ddl_t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 1.5), (2L, 2.5)))
    val listed = spark.sql("SHOW TABLES IN graft").collect().map(_.getString(1)).toSet
    assert(listed.contains("ddl_t"), s"SHOW TABLES must list ddl_t: $listed")
    // keys property is required and validated
    val noKeys = intercept[Exception](
      spark.sql("CREATE TABLE graft.bad_t (k BIGINT) TBLPROPERTIES ('x' = 'y')"))
    assert(noKeys.getMessage.contains("keys"), noKeys.getMessage)
    // ALTER is rejected loudly (schema evolves through writes)
    val alter = intercept[Exception](
      spark.sql("ALTER TABLE graft.ddl_t ADD COLUMN extra BIGINT"))
    assert(alter.getMessage.toLowerCase.contains("not supported"), alter.getMessage)
    // rename moves the store; data survives
    val cat = spark.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[UpsertCatalog]
    import org.apache.spark.sql.connector.catalog.Identifier
    cat.renameTable(Identifier.of(Array.empty, "ddl_t"), Identifier.of(Array.empty, "ddl_t2"))
    assert(spark.table("graft.ddl_t2").count() == 2)
    assert(!cat.tableExists(Identifier.of(Array.empty, "ddl_t")))
  }

  test("three write paths converge: writeTo.append == V1 df.write == direct store upsert") {
    import spark.implicits._
    def mk(tag: String) = {
      Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v").writeTo(s"graft.$tag")
        .tableProperty("keys", "k").create()
      spark.sessionState.catalogManager.catalog("graft").asInstanceOf[UpsertCatalog]
        .loadTable(org.apache.spark.sql.connector.catalog.Identifier.of(Array.empty, tag))
        .properties().get("path")
    }
    val (pa, pb, pc) = (mk("c1"), mk("c2"), mk("c3"))
    val batch = Seq((2L, 9.0), (3L, 3.0)).toDF("k", "v")
    batch.writeTo("graft.c1").append()
    batch.write.format("graft-upsert").option("path", pb).option("keys", "k")
      .mode("append").save()
    graft.streaming.UpsertStore.upsert(spark, pc, batch, Seq("k"))
    val Seq(a, b, c) = Seq("c1", "c2", "c3").map(t =>
      spark.table(s"graft.$t").orderBy("k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq)
    assert(a == b && b == c, s"write paths diverged: $a / $b / $c")
    assert(a == Seq((1L, 1.0), (2L, 9.0), (3L, 3.0)))
  }

  test("catalog reads push filters and prune columns into the scan (VERDICT r10 #8)") {
    import spark.implicits._
    (0L until 100L).map(i => (i, s"tag$i", i.toDouble)).toDF("k", "tag", "v")
      .writeTo("graft.pushdown_t").tableProperty("keys", "k").create()

    // filter pushdown: the scan node must carry the predicate (V1Scan
    // bridge renders accepted filters in PushedFilters), and results
    // must match the unpushed semantics
    val q = spark.sql("SELECT k, v FROM graft.pushdown_t WHERE k < 5")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("LessThan(k,5)"),
      s"filter must reach the scan:\n$plan")
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == (0L until 5L),
      "pushed filter must not change results")

    // column pruning: the scan's output must not include `tag`
    val pr = spark.sql("SELECT v FROM graft.pushdown_t WHERE k >= 98")
    val scanOut = pr.queryExecution.executedPlan.collectLeaves().map(_.output.map(_.name))
    assert(scanOut.exists(cols => cols.contains("v") && !cols.contains("tag")),
      s"scan must prune to the required columns, got $scanOut")
    assert(pr.collect().map(_.getDouble(0)).sorted.toSeq == Seq(98.0, 99.0))

    // a filter the translator rejects must be re-applied above the
    // scan, not lost (string contains → unsupported → residual)
    val resid = spark.sql(
      "SELECT k FROM graft.pushdown_t WHERE tag LIKE '%9' AND k < 20")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(resid == Seq(9L, 19L), s"residual filter semantics broke: $resid")
    spark.sql("DROP TABLE graft.pushdown_t")
  }
}
