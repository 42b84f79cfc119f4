package graft.functions

import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure (Spark-free) kernels —
  * SURVEY §5.3 property-based testing. */
object TopKHeapProps extends Properties("TopKHeap") {

  private val entriesGen: Gen[List[(Double, Long)]] =
    Gen.listOf(Gen.zip(
      Gen.chooseNum(-1e6, 1e6),
      Gen.chooseNum(Long.MinValue / 2, Long.MaxValue / 2)))

  property("top-k equals sort-based reference (score desc, id asc ties)") =
    Prop.forAll(entriesGen, Gen.chooseNum(1, 16)) { (xs, k) =>
      val h = new TopKHeap(k)
      xs.foreach { case (s, i) => h.add(s, i) }
      val ref = xs.sortBy { case (s, i) => (-s, i) }.take(k)
        .map { case (s, i) => (i, s) }
      h.sortedPairs.toList == ref
    }

  property("merge of split halves equals single-heap result") =
    Prop.forAll(entriesGen, Gen.chooseNum(1, 8)) { (xs, k) =>
      val (a, b) = xs.splitAt(xs.length / 2)
      val h1 = new TopKHeap(k); a.foreach { case (s, i) => h1.add(s, i) }
      val h2 = new TopKHeap(k); b.foreach { case (s, i) => h2.add(s, i) }
      val whole = new TopKHeap(k); xs.foreach { case (s, i) => whole.add(s, i) }
      h1.mergeWith(h2).sortedPairs.toList == whole.sortedPairs.toList
    }

  property("NaN scores never enter the heap") =
    Prop.forAll(entriesGen) { xs =>
      val h = new TopKHeap(4)
      xs.foreach { case (s, i) => h.add(s, i) }
      h.add(Double.NaN, 42L)
      h.sortedPairs.forall(!_._2.isNaN)
    }

  property("splitmix64 is injective on small ranges (no accidental collisions)") =
    Prop.forAll(Gen.chooseNum(-1000000L, 1000000L)) { seed =>
      val vals = (0L until 64L).map(i => Hash64.splitmix(seed + i))
      vals.distinct.size == 64
    }

  property("fnv1a distinguishes single-byte changes") =
    Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      val bytes = s.getBytes("UTF-8")
      val mutated = bytes.clone(); mutated(0) = (mutated(0) ^ 0x01).toByte
      Hash64.fnv1a(bytes) != Hash64.fnv1a(mutated)
    }
}
