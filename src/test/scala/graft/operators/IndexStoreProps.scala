package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.UpsertStore

/** Seeded randomized equivalence tests for the two text-index stores —
  * the invariant their incremental paths stand on, exercised over
  * corpora a scripted spec can't enumerate: random vocabularies,
  * shared and unique words, empty and whitespace-mangled texts,
  * arbitrary base/delta split points.
  *
  *  - [[PostingsIndex]]: ensure(base) + extend(delta) must leave
  *    postings, vocabulary, AND the stats row bit-identical to
  *    ensure(base ∪ delta) into a fresh store.
  *  - [[ShingleIndex]]: probe over an ensured train index must equal
  *    a from-scratch DataFrame recompute of the same contamination
  *    scan.
  *
  * Fixed seed so failures replay deterministically.
  */
class IndexStoreProps extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
    "zeta", "eta", "theta")

  private def randText(rnd: scala.util.Random): String = {
    val n = rnd.nextInt(11) // 0..10 words
    val words = Seq.fill(n)(vocab(rnd.nextInt(vocab.length)))
    val sep = if (rnd.nextBoolean()) " " else "  "
    val body = words.mkString(sep)
    if (rnd.nextInt(4) == 0) s" $body" else body // occasional leading space
  }

  test("postings index: extend ≡ rebuild over random corpora (fixed seed)") {
    val rnd = new scala.util.Random(20260814L)
    for (iter <- 1 to 4) {
      val n = 3 + rnd.nextInt(6)
      val docs = (1L to n).map(i => (i, randText(rnd))).toDF("doc_id", "text")
      val cut = 1 + rnd.nextInt(n - 1)
      val root = Files.createTempDirectory(s"graft-pprops-$iter").toString

      PostingsIndex.ensure(spark, docs.filter($"doc_id" <= cut), s"$root/grown")
      PostingsIndex.extend(spark, docs.filter($"doc_id" > cut), s"$root/grown")
      PostingsIndex.ensure(spark, docs, s"$root/scratch")

      def tf(p: String) = UpsertStore.read(spark, p).get
        .select("term", "doc_id", "tf", "dl")
        .as[(String, Long, Long, Int)].collect().toSet
      def dft(p: String) = UpsertStore.read(spark, s"${p}__df").get
        .select("term", "df").as[(String, Long)].collect().toSet
      def stats(p: String) = {
        val r = UpsertStore.read(spark, s"${p}__stats").get.head()
        (r.getAs[Long]("n"), r.getAs[Long]("total_dl"), r.getAs[Double]("avgdl"),
          r.getAs[Long]("corpus_n"), r.getAs[Long]("corpus_h"),
          r.getAs[Boolean]("dirty"))
      }
      assert(tf(s"$root/grown") == tf(s"$root/scratch"),
        s"iter $iter (n=$n cut=$cut): postings diverge")
      assert(dft(s"$root/grown") == dft(s"$root/scratch"),
        s"iter $iter (n=$n cut=$cut): vocabulary diverges")
      assert(stats(s"$root/grown") == stats(s"$root/scratch"),
        s"iter $iter (n=$n cut=$cut): stats diverge — " +
          s"grown=${stats(s"$root/grown")} scratch=${stats(s"$root/scratch")}")
    }
  }

  test("shingle index: probe ≡ from-scratch recompute over random corpora (fixed seed)") {
    val rnd = new scala.util.Random(20260815L)
    val gramN = 3
    for (iter <- 1 to 3) {
      val nTrain = 4 + rnd.nextInt(4)
      val trainRows = (1L to nTrain).map(i => (i, randText(rnd)))
      // eval: some fresh texts, some copied from train (guaranteed hits)
      val evalRows = (101L to (101L + rnd.nextInt(3))).map { i =>
        if (rnd.nextBoolean() && trainRows.nonEmpty)
          (i, trainRows(rnd.nextInt(trainRows.length))._2)
        else (i, randText(rnd))
      }
      val train = trainRows.toDF("doc_id", "text")
      val eval = evalRows.toDF("doc_id", "text")
      val cap = 1L + rnd.nextInt(3)
      val root = Files.createTempDirectory(s"graft-sprops-$iter").toString

      ShingleIndex.ensure(spark, train, s"$root/idx", gramN)
      val served = ShingleIndex.probe(spark, s"$root/idx", eval, gramN, cap)
        .as[(Long, Long, Long)].collect().toSeq

      val tg = ShingleIndex.grams(train, gramN)
      val stop = tg.groupBy("g").agg(count(lit(1)).as("dfreq"))
        .filter(col("dfreq") > cap).select("g")
      val pruned = tg.join(stop, Seq("g"), "left_anti")
        .select(col("doc_id").as("train_doc"), col("g"))
      val expect = ShingleIndex.grams(eval, gramN)
        .select(col("doc_id").as("test_doc"), col("g"))
        .join(pruned, "g")
        .groupBy("test_doc", "train_doc").agg(count(lit(1)).as("shared"))
        .groupBy("test_doc")
        .agg(count(lit(1)).as("n_train_docs"),
          max("shared").cast("long").as("max_shared"))
        .orderBy("test_doc")
        .as[(Long, Long, Long)].collect().toSeq

      assert(served == expect,
        s"iter $iter (nTrain=$nTrain cap=$cap): served=$served expect=$expect")
    }
  }

  test("dedup gate: decisions ≡ global min-wins recompute over random batch sequences (fixed seed)") {
    val rnd = new scala.util.Random(20260814L)
    for (iter <- 1 to 3) {
      val root = Files.createTempDirectory(s"graft-gateprops-$iter").toString
      // random content pool smaller than the id space ⇒ guaranteed dups,
      // spread over 3 batches with strictly increasing ids
      val pool = Vector.tabulate(5 + rnd.nextInt(5))(i => s"content $i " + randText(rnd))
      var nextId = 0L
      val batches = Seq.fill(3) {
        val sz = 2 + rnd.nextInt(5)
        val b = (1 to sz).map { _ =>
          nextId += 1
          (nextId, pool(rnd.nextInt(pool.length)))
        }
        b
      }
      val gate = new graft.streaming.DedupGateMaintainer(spark, s"$root/gate")
      gate.bootstrap(batches.head.toDF("doc_id", "text"))
      batches.tail.zipWithIndex.foreach { case (b, i) =>
        gate.ingestBatch(b.toDF("doc_id", "text"), txnId = Some(i.toLong))
      }
      val got = gate.decisions().collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      val all = batches.flatten
      val expect = all.map { case (id, text) =>
        val first = all.filter(_._2 == text).map(_._1).min
        id -> ((first, if (id == first) "new" else "duplicate"))
      }.toMap
      assert(got == expect, s"iter $iter: first diffs " +
        expect.collect { case (k, v) if got.get(k) != Some(v) => (k, v, got.get(k)) }.take(3))
    }
  }

  test("pq index: stored serve ≡ from-scratch search over random corpora (fixed seed)") {
    val rnd = new scala.util.Random(20260814L)
    for (iter <- 1 to 2) {
      val root = Files.createTempDirectory(s"graft-pqprops-$iter").toString
      val n = 40 + rnd.nextInt(30)
      val emb = (0L until n.toLong).map { i =>
        (i, Seq.fill(64)(rnd.nextGaussian()))
      }.toDF("vec_id", "emb")
      val cut = n / 2
      // grown-by-extend store vs one-shot store over the SAME corpus:
      // codebooks differ (trained on base vs full), but both serves
      // exact-rerank their ADC pools — outputs must agree wherever the
      // pools cover the true neighbors; with |corpus| ≤ C the pool IS
      // the corpus, so equality is exact by construction
      PqIndex.ensure(spark, emb.filter($"vec_id" < cut), s"$root/grown")
      PqIndex.extend(spark, emb.filter($"vec_id" >= cut), s"$root/grown")
      PqIndex.ensure(spark, emb, s"$root/scratch")
      def out(p: String) = PqIndex.search(spark, emb, p, $"vec_id" < 4)
        .as[(Long, Long, Long)].collect().toSeq
      assert(out(s"$root/grown") == out(s"$root/scratch"),
        s"iter $iter (n=$n): grown-store serve diverged from one-shot store")
    }
  }
}
