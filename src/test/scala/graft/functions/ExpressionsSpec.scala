package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SharedSpark
import graft.streaming.TrafficPipeline

class ExpressionsSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  test("cosine_similarity: codegen path matches double-precision reference") {
    val a = Array(1.0f, 2.0f, 3.0f)
    val b = Array(-1.0f, 0.5f, 2.0f)
    val expected = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) * math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    val got = Seq((a, b)).toDF("a", "b")
      .select(VectorFunctions.cosine_similarity(col("a"), col("b"))).as[Double].head()
    assert(math.abs(got - expected) < 1e-15)
    // self-similarity == 1
    val self = Seq((a, a)).toDF("a", "b")
      .select(VectorFunctions.cosine_similarity(col("a"), col("b"))).as[Double].head()
    assert(math.abs(self - 1.0) < 1e-12)
  }

  test("dot_product matches reference") {
    val got = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
      .select(VectorFunctions.dot_product(col("a"), col("b"))).as[Double].head()
    assert(got == 11.0)
  }

  test("rolling_hash: deterministic, codegen == eval, order-sensitive") {
    val df = Seq("hello world", "world hello", "hello world").toDF("t")
    val hs = df.select(TextFunctions.rolling_hash(col("t"))).as[Long].collect()
    assert(hs(0) == hs(2))
    assert(hs(0) != hs(1))
    // matches the documented polynomial over UTF-8 bytes
    val manual = "hello world".getBytes("UTF-8").foldLeft(0L)((h, b) => h * 1000003L + (b & 0xffL))
    assert(hs(0) == manual)
  }

  test("simhash64: identical token sets agree; near-identical differ in few bits") {
    val base = (1 to 40).map(i => s"tok$i")
    val near = base.updated(5, "CHANGED")
    val far = (1 to 40).map(i => s"other$i")
    val df = Seq(base, near, far).toDF("toks")
    val hs = df.select(TextFunctions.simhash64(col("toks"))).as[Long].collect()
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(hs(0), hs(0)) == 0)
    assert(hamming(hs(0), hs(1)) <= 16, s"near-dup hamming was ${hamming(hs(0), hs(1))}")
    assert(hamming(hs(0), hs(2)) > hamming(hs(0), hs(1)))
  }

  test("minhash signature estimates Jaccard within 0.2 (k=64)") {
    val a = (1 to 100).map(i => s"sh$i")
    val b = (31 to 130).map(i => s"sh$i") // |∩|=70, |∪|=130 → J≈0.538
    val df = Seq(a, b).toDF("toks")
      .select(TextFunctions.minhash_signature(col("toks"), 64, 42L).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    val est = sigs(0).zip(sigs(1)).count { case (x, y) => x == y }.toDouble / 64
    val exact = 70.0 / 130.0
    assert(math.abs(est - exact) < 0.2, s"est=$est exact=$exact")
  }

  test("property: traffic parser is total on well-formed input with whitespace") {
    // deterministic sweep (seeded) standing in for a ScalaCheck forAll —
    // the scalatest+scalacheck bridge artifact is not on the offline path
    val rnd = new scala.util.Random(42)
    val cases = (1 to 50).map { _ =>
      (math.abs(rnd.nextLong()) % 4102444800000L, rnd.nextInt(1000),
        Seq("", " ", "\t", "\n", "  ")(rnd.nextInt(5)))
    }
    val raw = cases.map { case (t, n, ws) => s"$t,$n$ws" }.toDF("value")
    val parsed = TrafficPipeline.parse(raw).collect()
    assert(parsed.length == cases.length)
    assert(parsed.map(r => (r.getLong(0), r.getInt(1))).toSet ==
      cases.map { case (t, n, _) => (t, n) }.toSet)
  }

  test("splitmix/fnv1a pinned values (editing the constants silently changes every signature)") {
    assert(Hash64.splitmix(0L) == -2152535657050944081L)
    assert(Hash64.fnv1a("abc".getBytes("UTF-8")) == -1792535898324117685L)
    assert(Hash64.fnv1a("abc".getBytes("UTF-8")) != Hash64.fnv1a("abd".getBytes("UTF-8")))
  }
}
