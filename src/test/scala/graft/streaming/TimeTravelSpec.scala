package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Snapshot time travel on the upsert store: every commit writes an
  * immutable manifest under `_log/` (the Delta-log pattern), so any
  * still-live commit is addressable — via `UpsertStore.readVersion`,
  * the V1 `option("versionAsOf", v)`, and SQL `VERSION AS OF` through
  * the DSv2 catalog. Readable history spans back to the previous
  * compaction base (compaction GC retires older dirs — the VACUUM
  * contract), and asking for a retired version fails loudly with the
  * readable set.
  */
class TimeTravelSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("readVersion reconstructs every pre-compaction commit; GC'd versions fail loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft-timetravel").toString
    def df(pairs: (Long, String)*) = pairs.toDF("k", "v")
    // commits 0..2 (maxDeltas high: no compaction yet)
    UpsertStore.upsert(spark, dir, df(1L -> "a", 2L -> "b"), Seq("k"))
    UpsertStore.upsert(spark, dir, df(2L -> "B"), Seq("k"))
    UpsertStore.upsert(spark, dir, df(3L -> "c"), Seq("k"))
    def at(v: Long) = UpsertStore.readVersion(spark, dir, v)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(at(0) == Map(1L -> "a", 2L -> "b"))
    assert(at(1) == Map(1L -> "a", 2L -> "B"))
    assert(at(2) == Map(1L -> "a", 2L -> "B", 3L -> "c"))
    // latest read matches the newest version
    assert(UpsertStore.read(spark, dir).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap == at(2))
    assert(UpsertStore.versions(spark, dir).collect { case (v, true) => v } == Seq(0L, 1L, 2L))

    // force TWO compactions (maxDeltas = 1: every upsert compacts) —
    // the second one GCs the dirs versions 0..2 referenced
    UpsertStore.upsert(spark, dir, df(4L -> "d"), Seq("k"), maxDeltas = 1)
    UpsertStore.upsert(spark, dir, df(5L -> "e"), Seq("k"), maxDeltas = 1)
    val readable = UpsertStore.versions(spark, dir).collect { case (v, true) => v }
    assert(!readable.contains(0L), s"pre-compaction versions must be GC'd: $readable")
    assert(readable.contains(4L))
    val err = intercept[IllegalArgumentException](UpsertStore.readVersion(spark, dir, 0L))
    assert(err.getMessage.contains("compacted away") &&
      err.getMessage.contains("readable versions"), err.getMessage)
    // never-committed version also fails loudly
    val err2 = intercept[IllegalArgumentException](UpsertStore.readVersion(spark, dir, 99L))
    assert(err2.getMessage.contains("never committed"), err2.getMessage)
  }

  test("crash window: a _log entry without the _LATEST swap is never servable") {
    import org.apache.hadoop.fs.Path
    val dir = java.nio.file.Files.createTempDirectory("graft-crash").toString
    def df(pairs: (Long, String)*) = pairs.toDF("k", "v")
    UpsertStore.upsert(spark, dir, df(1L -> "a"), Seq("k"))          // commit 0
    UpsertStore.upsert(spark, dir, df(2L -> "b"), Seq("k"))          // commit 1
    // simulate a crash BETWEEN the _log write and the _LATEST pointer
    // swap: a seq-2 log entry exists (pointing at live dirs) but the
    // committed head is still 1
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val latest = {
      val p = new Path(dir, "_LATEST")
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
        in.readFully(0, buf); new String(buf, "UTF-8")
      } finally in.close()
    }
    val orphan = latest.replaceFirst("seq=1", "seq=2")
    val out = fs.create(new Path(dir, "_log/2"), true)
    try out.write(orphan.getBytes("UTF-8")) finally out.close()
    // the never-committed state must be invisible everywhere
    val readable = UpsertStore.versions(spark, dir).map(_._1)
    assert(readable == Seq(0L, 1L), s"orphan seq leaked into versions(): $readable")
    val err = intercept[IllegalArgumentException](UpsertStore.readVersion(spark, dir, 2L))
    assert(err.getMessage.contains("never committed"), err.getMessage)
    assert(UpsertStore.latestVersion(spark, dir).contains(1L))
    // the next real commit overwrites the orphan seq and proceeds normally
    UpsertStore.upsert(spark, dir, df(3L -> "c"), Seq("k"))          // commit 2 (real)
    assert(UpsertStore.readVersion(spark, dir, 2L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("change feed: per-commit upserts after a version; folds fail loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-cdc").toString
    def df(pairs: (Long, String)*) = pairs.toDF("k", "v")
    UpsertStore.upsert(spark, dir, df(1L -> "a"), Seq("k"))          // commit 0 (base)
    UpsertStore.upsert(spark, dir, df(2L -> "b"), Seq("k"))          // commit 1 (delta)
    UpsertStore.upsert(spark, dir, df(2L -> "B", 3L -> "c"), Seq("k")) // commit 2 (delta)
    val changes = UpsertStore.changesSince(spark, dir, 0L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(changes == Set((2L, "b", 1L), (2L, "B", 2L), (3L, "c", 2L)), s"got $changes")
    // replaying the feed over the version-0 snapshot reproduces read()
    val replayed = UpsertStore.readVersion(spark, dir, 0L)
      .withColumn("__commit_version", org.apache.spark.sql.functions.lit(0L))
      .unionByName(UpsertStore.changesSince(spark, dir, 0L))
      .orderBy("__commit_version")
      .collect().foldLeft(Map.empty[Long, String]) { (m, r) => m + (r.getLong(0) -> r.getString(1)) }
    val now = UpsertStore.read(spark, dir).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(replayed == now, s"replay $replayed != table $now")
    // empty window is an empty frame, not an error
    assert(UpsertStore.changesSince(spark, dir, 2L).count() == 0)
    // a replace folds history: the feed across it must fail loudly
    UpsertStore.replace(spark, dir, df(9L -> "z"), Seq("k"))         // commit 3 (base)
    val err = intercept[IllegalArgumentException](
      UpsertStore.changesSince(spark, dir, 1L).collect())
    assert(err.getMessage.contains("re-snapshot"), err.getMessage)
  }

  test("an in-flight reader survives one compaction (lazy-GC horizon contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-inflight").toString
    def df(pairs: (Long, String)*) = pairs.toDF("k", "v")
    UpsertStore.upsert(spark, dir, df(1L -> "a"), Seq("k"))
    UpsertStore.upsert(spark, dir, df(2L -> "b"), Seq("k"))
    // capture a lazy plan over the CURRENT base+delta chain
    val snapshot = UpsertStore.read(spark, dir).get
    // a compacting upsert rewrites the base and GCs only BELOW the
    // previous manifest's live horizon — the captured plan's dirs stay
    UpsertStore.upsert(spark, dir, df(3L -> "c"), Seq("k"), maxDeltas = 1)
    val seen = snapshot.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(seen == Map(1L -> "a", 2L -> "b"),
      s"in-flight reader lost its snapshot across a compaction: $seen")
    // and the post-compaction state is the merged table
    assert(UpsertStore.read(spark, dir).get.count() == 3)
  }

  test("vacuum: reclaims the post-compaction leftovers, current reads unaffected") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-vacuum").toString
    def df(pairs: (Long, String)*) = pairs.toDF("k", "v")
    UpsertStore.upsert(spark, dir, df(1L -> "a"), Seq("k"))
    UpsertStore.upsert(spark, dir, df(2L -> "b"), Seq("k"))
    // nothing to vacuum while everything is referenced by the manifest
    assert(UpsertStore.vacuum(spark, dir) == (0, 0))
    assert(UpsertStore.versions(spark, dir).collect { case (v, true) => v } == Seq(0L, 1L))
    // compaction: lazy GC keeps the previous base chain for in-flight
    // readers — vacuum reclaims it now
    UpsertStore.upsert(spark, dir, df(3L -> "c"), Seq("k"), maxDeltas = 1)
    val (dirs, logs) = UpsertStore.vacuum(spark, dir)
    assert(dirs > 0, "vacuum should reclaim the pre-compaction dirs")
    assert(logs > 0, "vacuum should prune unreadable log entries")
    val readable = UpsertStore.versions(spark, dir).collect { case (v, true) => v }
    assert(readable == Seq(2L), s"only the live commit remains readable: $readable")
    assert(UpsertStore.read(spark, dir).get
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap ==
      Map(1L -> "a", 2L -> "b", 3L -> "c"))
  }

  test("versionAsOf through the V1 reader and SQL VERSION AS OF through the catalog") {
    val s = spark
    val wh = java.nio.file.Files.createTempDirectory("graft-tt-catalog").toString
    s.conf.set("spark.sql.catalog.graft_tt", classOf[graft.sources.UpsertCatalog].getName)
    s.conf.set("spark.sql.catalog.graft_tt.path", wh)
    Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v")
      .writeTo("graft_tt.t").tableProperty("keys", "k").create()
    Seq((2L, 21.0), (3L, 30.0)).toDF("k", "v").writeTo("graft_tt.t").append()
    // SQL time travel: version 0 = the CTAS state
    val v0 = s.sql("SELECT k, v FROM graft_tt.t VERSION AS OF 0 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(v0 == Seq((1L, 10.0), (2L, 20.0)), s"got $v0")
    val now = s.sql("SELECT k, v FROM graft_tt.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(now == Seq((1L, 10.0), (2L, 21.0), (3L, 30.0)), s"got $now")
    // V1 reader option against the same table path
    val path = s"$wh/t"
    val viaOption = s.read.format("graft-upsert")
      .option("path", path).option("versionAsOf", "0").load()
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    assert(viaOption == Seq((1L, 10.0), (2L, 20.0)), s"got $viaOption")
  }
}
