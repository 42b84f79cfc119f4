package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic 64-bit hashing used by the fingerprint / minhash /
  * simhash expressions. FNV-1a and splitmix64 — public-domain
  * constructions, chosen over Spark's xxhash64 so behavior is defined by
  * this library (stable across Spark upgrades).
  */
object Hash64 {
  final val FnvOffset: Long = 0xcbf29ce484222325L
  final val FnvPrime: Long = 0x100000001b3L

  def fnv1a(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) { h ^= (bytes(i) & 0xffL); h *= FnvPrime; i += 1 }
    h
  }
  def fnv1a(s: UTF8String): Long = fnv1a(s.getBytes)

  /** splitmix64 — mixes a seed into a stream of well-distributed longs. */
  def splitmix(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
}

/** Polynomial rolling hash (Rabin–Karp style) over a string's UTF-8
  * bytes → long. Document fingerprinting primitive: equal fingerprints
  * ⇒ candidate duplicates with no full-text shuffle. Codegen'd —
  * self-contained loop, stays inside whole-stage codegen.
  */
case class RollingHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_hash"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 1000003L + (bytes(i) & 0xffL); i += 1 }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val (bytes, h, i) = (ctx.freshName("bytes"), ctx.freshName("h"), ctx.freshName("i"))
      s"""
         |byte[] $bytes = $c.getBytes();
         |long $h = 0L;
         |for (int $i = 0; $i < $bytes.length; $i++) {
         |  $h = $h * 1000003L + (long)($bytes[$i] & 0xff);
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over a token array: each token contributes its FNV-1a
  * hash's bits weighted ±1; the sign of each accumulated bit position
  * forms the output. Near-duplicate docs have small Hamming distance.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  /** Codegen'd: a fallback here forces the ENTIRE enclosing projection
    * interpreted — including re-evaluating the shingle-array transform
    * that feeds this — which made the q176 fingerprint pass ~20×
    * slower than the same pass under whole-stage codegen. */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b2")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      s"""
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  if (!$c.isNullAt($i)) {
         |    long $h = graft.functions.Hash64.fnv1a($c.getUTF8String($i));
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |    }
         |  }
         |}
         |long $out = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) {
         |  if ($counts[$b2] > 0) $out |= (1L << $b2);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = Hash64.fnv1a(arr.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature over a token/shingle array: k independent affine
  * permutations h_i(x) = a_i*x + b_i (a_i, b_i from splitmix64(seed)),
  * min over the set per permutation → array<long> of length k.
  * P(sig_a[i] == sig_b[i]) ≈ Jaccard(a, b) — the LSH banding in
  * [[graft.operators.Dedup]] builds on this.
  */
case class MinHashSignature(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with CodegenFallback {
  require(k > 0 && k <= 1024, s"minhash k out of range: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"

  @transient private lazy val coeffs: Array[(Long, Long)] = {
    Array.tabulate(k) { i =>
      val a = Hash64.splitmix(seed + 2L * i) | 1L  // odd => bijective mod 2^64
      val b = Hash64.splitmix(seed + 2L * i + 1)
      (a, b)
    }
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val x = Hash64.fnv1a(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val (a, b) = coeffs(j)
          val h = a * x + b
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Single-pass text canonicalization, equivalent (for ASCII input) to
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9 ]", ""), " +", " "))`
  * — lowercase A-Z, keep [a-z0-9 ], drop everything else, collapse
  * space runs, trim. One byte loop instead of two java.util.regex
  * passes: this is the ingest-scan normalize (q57/q80), and at 10×
  * probe scale the regex pair was the pipeline's measured cost floor.
  * Codegen'd; the deferred-space trick folds collapse AND trim into
  * the same loop (a space is emitted only when a kept character
  * follows it and output is non-empty).
  *
  * Caveat (documented, corpus is pure ASCII): multi-byte characters
  * are dropped byte-wise, which matches the regex for every input
  * except exotic case-foldings that lower() maps INTO [a-z] (e.g.
  * U+0130 → "i̇") — those keep the base letter under the regex chain
  * and are dropped here. */
case class NormalizeText(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "normalize_text"

  override def nullSafeEval(v: Any): Any = {
    val in = v.asInstanceOf[UTF8String].getBytes
    val out = new Array[Byte](in.length)
    var n = 0
    var pendingSpace = false
    var i = 0
    while (i < in.length) {
      var c = in(i) & 0xff
      if (c >= 'A' && c <= 'Z') c += 32
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSpace && n > 0) { out(n) = ' '; n += 1 }
        pendingSpace = false
        out(n) = c.toByte; n += 1
      } else if (c == ' ') pendingSpace = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      val (in, out, n, sp, i, c) = (ctx.freshName("in"), ctx.freshName("out"),
        ctx.freshName("n"), ctx.freshName("sp"), ctx.freshName("i"), ctx.freshName("c"))
      s"""
         |byte[] $in = $s.getBytes();
         |byte[] $out = new byte[$in.length];
         |int $n = 0;
         |boolean $sp = false;
         |for (int $i = 0; $i < $in.length; $i++) {
         |  int $c = $in[$i] & 0xff;
         |  if ($c >= 'A' && $c <= 'Z') $c += 32;
         |  if (($c >= 'a' && $c <= 'z') || ($c >= '0' && $c <= '9')) {
         |    if ($sp && $n > 0) { $out[$n++] = ' '; }
         |    $sp = false;
         |    $out[$n++] = (byte) $c;
         |  } else if ($c == ' ') { $sp = true; }
         |}
         |${ev.value} = UTF8String.fromBytes($out, 0, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object TextFunctions {
  def rolling_hash(c: Column): Column =
    GraftSqlBridge.column(RollingHash(GraftSqlBridge.expression(c)))
  def normalize_text(c: Column): Column =
    GraftSqlBridge.column(NormalizeText(GraftSqlBridge.expression(c)))
  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))
  def minhash_signature(tokens: Column, k: Int, seed: Long): Column =
    GraftSqlBridge.column(MinHashSignature(GraftSqlBridge.expression(tokens), k, seed))
}
