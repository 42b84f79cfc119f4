package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Pins `UpsertStore.readScoped`'s superset contract (ADVICE r19): a
  * value-column scope keeps WHOLE key groups whose ANY live version
  * matches, so a current row whose superseded version matched rides
  * along (and must be re-filtered by the caller's join), while a key
  * group with no matching version anywhere is pruned — and a
  * key-column scope is exactly `read().semiJoin(scope)`. The fixture
  * is a multi-part store (base + delta) where one key's OLD version
  * matches the scope but its current does not, and another key's
  * current matches but its old did not — both directions of the
  * rider subtlety JoinViewMaintain's ingest/retract paths lean on. */
class ReadScopedSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("value-column scope: whole key groups, riders re-filterable; key-column scope: exact semi-join") {
    val dir = Files.createTempDirectory("graft-readscoped").toString + "/store"
    // base commit: k=1→fkA, k=2→fkB, k=3→fkA, k=4→fkC
    UpsertStore.replace(spark, dir,
      Seq((1L, "A", "v1"), (2L, "B", "v2"), (3L, "A", "v3"), (4L, "C", "v4"))
        .toDF("k", "fk", "v"),
      Seq("k"), assumeKeyUnique = true)
    // delta commit (store stays multi-part — upsert appends a delta):
    // k=1 moves A→B (old version matches scope, current does NOT),
    // k=2 moves B→A (current matches, old did not)
    UpsertStore.upsert(spark, dir,
      Seq((1L, "B", "v1b"), (2L, "A", "v2b")).toDF("k", "fk", "v"),
      Seq("k"), assumeKeyUnique = true)
    val partDirs = new java.io.File(dir).listFiles().map(_.getName)
    assert(partDirs.exists(_.startsWith("v=")) && partDirs.exists(_.startsWith("d=")),
      s"fixture must be multi-part (base + delta) or the scope short-circuit hides the merge: ${partDirs.toSeq}")

    val current = UpsertStore.read(spark, dir).get
      .as[(Long, String, String)].collect().toSet
    assert(current == Set((1L, "B", "v1b"), (2L, "A", "v2b"),
      (3L, "A", "v3"), (4L, "C", "v4")), "merge sanity")

    // value-column scope fk=A
    val scope = Seq("A").toDF("fk")
    val scoped = UpsertStore.readScoped(spark, dir, scope).get
      .as[(Long, String, String)].collect().toSet
    // every returned row is a CURRENT row (never a superseded version)
    assert(scoped.subsetOf(current),
      s"scoped read must never surface superseded versions: $scoped")
    // whole-group contract: k=1 rides along (old version matched),
    // k=2 and k=3 match currently, k=4 (no version ever matched) pruned
    assert(scoped.map(_._1) == Set(1L, 2L, 3L),
      s"expected key groups {1,2,3} (1 = rider via its superseded version), got $scoped")
    // the caller's re-filter restores exactness: ≡ read().filter(scope)
    assert(scoped.filter(_._2 == "A") ==
      current.filter(_._2 == "A"),
      "re-filtered scoped read must equal the filtered full read")

    // key-column scope: exact semi-join equivalence, no riders
    val kScope = Seq(2L, 4L).toDF("k")
    val kScoped = UpsertStore.readScoped(spark, dir, kScope).get
      .as[(Long, String, String)].collect().toSet
    assert(kScoped == current.filter(r => r._1 == 2L || r._1 == 4L),
      "key-column scope must equal read() semi-joined on the keys")
  }
}
