package graft.streaming

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** Model-based randomized test of the delta-log store: a random
  * sequence of the five verbs runs against both the store and a plain
  * in-memory Map model; after every few steps the merged read
  * (base + deltas, last-writer-wins, through compaction turns) must
  * equal the model exactly. This exercises the paths a scripted spec
  * can't enumerate — delta chains of every length, compaction at
  * arbitrary points, empty-delta skips, evolution of the txn field —
  * with a fixed seed so failures replay deterministically.
  */
class UpsertStoreProps extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("random verb sequences: store read == reference model at every checkpoint") {
    val rnd = new scala.util.Random(20260812L)
    val dir = Files.createTempDirectory("graft-store-props").toString
    val keys = Seq("k")
    var model = Map.empty[Long, String]

    def df(rows: Seq[(Long, String)]) = rows.toDF("k", "v")
    def randRows(): Seq[(Long, String)] = {
      val n = 1 + rnd.nextInt(4)
      // key space 0..9 → plenty of collisions with prior state
      Seq.fill(n)((rnd.nextInt(10).toLong, s"v${rnd.nextInt(1000)}"))
        // model applies last-writer-wins per batch like dedupByKey's
        // deterministic greatest-value rule: keep max value per key
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }.toSeq
    }

    for (step <- 1 to 60) {
      val rows = randRows()
      rnd.nextInt(5) match {
        case 0 => // upsert
          UpsertStore.upsert(spark, dir, df(rows), keys)
          model = model ++ rows
        case 1 => // insertIgnore
          UpsertStore.insertIgnore(spark, dir, df(rows), keys)
          model = rows.filterNot { case (k, _) => model.contains(k) }.toMap ++ model
        case 2 => // update
          UpsertStore.update(spark, dir, df(rows), keys)
          model = model ++ rows.filter { case (k, _) => model.contains(k) }
        case 3 => // delete
          UpsertStore.delete(spark, dir, df(rows), keys)
          model = model -- rows.map(_._1)
        case 4 => // insert (only when no key clashes — else it must throw)
          val fresh = rows.filterNot { case (k, _) => model.contains(k) }
            .groupBy(_._1).map(_._2.head).toSeq
          if (fresh.nonEmpty) {
            UpsertStore.insert(spark, dir, df(fresh), keys)
            model = model ++ fresh
          }
      }
      if (step % 5 == 0) {
        val got = UpsertStore.read(spark, dir)
          .map(_.as[(Long, String)].collect().toMap).getOrElse(Map.empty)
        assert(got == model,
          s"step $step diverged: store=${got.toSeq.sorted} model=${model.toSeq.sorted}")
      }
    }
  }

  test("random verb sequences: every readable snapshot and change feed agrees with the history model") {
    val rnd = new scala.util.Random(20260813L)
    val dir = Files.createTempDirectory("graft-history-props").toString
    val keys = Seq("k")
    var model = Map.empty[Long, String]
    var history = Map.empty[Long, Map[Long, String]] // commit seq -> state

    def df(rows: Seq[(Long, String)]) = rows.toDF("k", "v")
    def randRows(): Seq[(Long, String)] = {
      val n = 1 + rnd.nextInt(4)
      Seq.fill(n)((rnd.nextInt(10).toLong, s"v${rnd.nextInt(1000)}"))
        .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).max) }.toSeq
    }

    for (step <- 1 to 40) {
      val rows = randRows()
      rnd.nextInt(3) match {
        case 0 => UpsertStore.upsert(spark, dir, df(rows), keys); model = model ++ rows
        case 1 =>
          UpsertStore.insertIgnore(spark, dir, df(rows), keys)
          model = rows.filterNot { case (k, _) => model.contains(k) }.toMap ++ model
        case 2 => UpsertStore.delete(spark, dir, df(rows), keys); model = model -- rows.map(_._1)
      }
      UpsertStore.latestVersion(spark, dir).foreach(v => history += v -> model)

      if (step % 8 == 0) {
        val readable = UpsertStore.versions(spark, dir).toMap
        history.foreach { case (v, expect) =>
          if (readable.getOrElse(v, false)) {
            // every still-readable commit reconstructs its recorded state
            val got = UpsertStore.readVersion(spark, dir, v).as[(Long, String)].collect().toMap
            assert(got == expect, s"step $step v$v: $got != $expect")
            // and when the change feed from v is readable, replaying it
            // over the snapshot reproduces the CURRENT table
            try {
              val feed = UpsertStore.changesSince(spark, dir, v)
                .select("k", "v", "__commit_version")
                .as[(Long, String, Long)].collect().sortBy(_._3)
              val replayed = feed.foldLeft(expect) { case (m, (k, value, _)) => m + (k -> value) }
              assert(replayed == model, s"step $step feed from v$v: $replayed != $model")
            } catch {
              case e: IllegalArgumentException =>
                assert(e.getMessage.contains("re-snapshot"), e.getMessage) // fold: declared loudly
            }
          } else {
            // GC'd versions must fail loudly, never fabricate data
            val e = intercept[IllegalArgumentException](UpsertStore.readVersion(spark, dir, v))
            assert(e.getMessage.contains("compacted away"), e.getMessage)
          }
        }
      }
    }
  }
}
