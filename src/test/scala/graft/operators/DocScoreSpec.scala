package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark

/** The pluggable document-quality scorer seam (q183): one scorer
  * instance per partition, scores a pure function of the row — pinned
  * by batch-size invariance (the MultimodalEmbedSpec rule), a
  * swapped-in custom scorer, and the keep/drop boundary contract. */
class DocScoreSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "a a a a a a a a a a a a"),                  // stopword-heavy → drop
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4L, "word word word word word word word word word word"), // low diversity
    (5L, "short"),
    (6L, (1 to 60).map(i => s"tok$i").mkString(" "))) // long, fully distinct

  test("seam is batch-size invariant: any partitioning yields identical rows") {
    val ref = DocScore.scoreDocs(docs.toDS().repartition(1), DocScore.HeuristicBlendScorer)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    for (parts <- Seq(2, 7, 32)) {
      val got = DocScore.scoreDocs(docs.toDS().repartition(parts),
          DocScore.HeuristicBlendScorer)
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
      assert(got == ref, s"partitioning $parts changed scores: $got vs $ref")
    }
  }

  test("verdict boundary: keep ⇔ qscore ≥ 0.5; degenerate rows score, never crash") {
    val rows = DocScore.scoreDocs(docs.toDS(), DocScore.HeuristicBlendScorer)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getString(2))).toMap
    assert(rows.size == docs.size)
    rows.foreach { case (id, (s, v)) =>
      assert(s >= 0.0 && s <= 1.0, s"doc $id score $s outside the squash range")
      assert((v == "keep") == (s >= 0.5), s"doc $id verdict $v vs score $s")
    }
    // the blend must separate the designed extremes: a fully-distinct
    // long doc keeps, the stopword wall and the one-word wall drop
    assert(rows(6L)._2 == "keep", s"diverse long doc must keep: ${rows(6L)}")
    assert(rows(2L)._2 == "drop", s"stopword wall must drop: ${rows(2L)}")
    assert(rows(4L)._2 == "drop", s"low-diversity wall must drop: ${rows(4L)}")
  }

  test("the seam binds a SWAPPED scorer per partition (the production model slot)") {
    object LengthScorer extends DocScore.DocScorer {
      override def score(text: String): Double = math.min(text.length / 100.0, 1.0)
    }
    val got = DocScore.scoreDocs(docs.toDS().repartition(3), LengthScorer)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    docs.foreach { case (id, text) =>
      val want = BigDecimal(math.min(text.length / 100.0, 1.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id) == want, s"doc $id: swapped scorer not applied (${got(id)} vs $want)")
    }
  }
}
