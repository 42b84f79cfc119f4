package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-set sketch in the THETA framework (KMV / theta
  * sketches: Beyer et al. SIGMOD 2007 "On Synopses for Distinct-Value
  * Estimation"; Dasgupta et al. 2016 "The Theta-Sketch Framework"; the
  * same math behind Apache DataSketches' theta family). The one
  * capability the engine's HLL rows (q126/q151/q153/q158) cannot give:
  * SET OPERATIONS between sketches — intersection and difference, not
  * just union — so "users active in BOTH periods" / "eval shingles
  * seen in train" become sketch-store reads instead of corpus joins.
  *
  * State = (θ ∈ (0,1], V = the set of retained item-hash values, all
  * < θ, |V| ≤ k). Each distinct item hashes (xxhash64, fixed seed) to
  * a uniform double in [0,1); V is exactly {h(item) : h(item) < θ}
  * over the distinct items absorbed. While fewer than k+1 distinct
  * values have been seen, θ stays 1.0 and the sketch is EXACT
  * (estimate = |V|). On overflow, θ collapses to the (k+1)-th minimum
  * and the estimate |V|/θ = k / v₍ₖ₊₁₎ is the classical unbiased KMV
  * estimator with relative standard error ≈ 1/√(k−1).
  *
  * Set ops on two sketches (the theta-framework rules — each yields a
  * valid sketch at θ′ = min(θa, θb)):
  *   union:      V′ = (Va ∪ Vb) ∩ [0,θ′), re-capped to k
  *   intersect:  V′ = (Va ∩ Vb) ∩ [0,θ′)
  *   a-not-b:    V′ = (Va \ Vb) ∩ [0,θ′)
  * and estimate = |V′|/θ′ in every case. Distinct-ness makes the
  * UNION merge IDEMPOTENT — re-absorbing the same delta is a no-op —
  * which is why the theta store maintainer can replay a batch without
  * a ledger guard (contrast MG/DSIR additive merges, q166/q170).
  *
  * Oracle discipline (q37/q120/q126/q169): the DECLARED query output
  * is exact values plus bound FLAGS; raw estimates never leave the
  * engine. Estimates here are deterministic for fixed data (fixed
  * hash, and V is a set — merge order cannot change it), so the flags
  * are hash-stable for the driver's compare.
  *
  * Scale: one k-bounded row per group in the shuffle (map-side
  * combine), k·8 B state; a 100 TB-scan's distinct-intersection
  * question becomes two store-row reads and a set op.
  */
final class ThetaBuf(val k: Int) {
  var theta: Double = 1.0
  var seen: Boolean = false
  val values: java.util.TreeSet[java.lang.Double] = new java.util.TreeSet()

  /** Collapse to the k smallest values; θ ← the evicted (k+1)-th min. */
  private def shrink(): Unit = while (values.size > k) {
    val last = values.last()
    values.remove(last)
    theta = last.doubleValue()
  }

  def updateHash(h: Double): Unit = {
    seen = true
    if (h < theta) {
      values.add(h)
      shrink()
    }
  }

  def mergeWith(o: ThetaBuf): ThetaBuf = {
    seen |= o.seen
    if (o.theta < theta) {
      theta = o.theta
      val it = values.tailSet(theta, true).iterator()
      while (it.hasNext) { it.next(); it.remove() }
    }
    o.values.forEach { v => if (v.doubleValue() < theta) values.add(v) }
    shrink()
    this
  }

  def estimate: Double =
    if (theta >= 1.0) values.size.toDouble else values.size / theta

  def serialized: Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 4 + 4 + 1 + 8 * values.size)
    buf.putDouble(theta).putInt(k).putInt(values.size)
      .put(if (seen) 1.toByte else 0.toByte)
    values.forEach(v => buf.putDouble(v.doubleValue()))
    buf.array()
  }
}

object ThetaBuf {
  private val Seed = 0x5eed07e7aL

  def deserialize(bytes: Array[Byte]): ThetaBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val theta = buf.getDouble; val k = buf.getInt
    var sz = buf.getInt
    val b = new ThetaBuf(k)
    b.theta = theta
    b.seen = buf.get() == 1
    while (sz > 0) { b.values.add(buf.getDouble); sz -= 1 }
    b
  }

  /** Item hash → uniform double in [0,1): top 53 bits of xxhash64. */
  def hashToUnit(h64: Long): Double = (h64 >>> 11) * (1.0 / (1L << 53))

  def hashString(s: UTF8String): Double = {
    val b = s.getBytes
    hashToUnit(XXH64.hashUnsafeBytes(
      b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, Seed))
  }

  def hashLong(v: Long): Double = hashToUnit(XXH64.hashLong(v, Seed))

  /** θ-framework set op over two serialized sketches; op ∈
    * {union, intersect, anotb}. Returns the derived estimate. */
  def setOpEstimate(a: Array[Byte], b: Array[Byte], op: String): Double = {
    val sa = deserialize(a); val sb = deserialize(b)
    val theta = math.min(sa.theta, sb.theta)
    var n = 0L
    op match {
      case "intersect" =>
        sa.values.forEach { v =>
          if (v.doubleValue() < theta && sb.values.contains(v)) n += 1
        }
      case "anotb" =>
        sa.values.forEach { v =>
          if (v.doubleValue() < theta && !sb.values.contains(v)) n += 1
        }
      case "union" =>
        val merged = new java.util.TreeSet[java.lang.Double]()
        sa.values.forEach { v => if (v.doubleValue() < theta) merged.add(v) }
        sb.values.forEach { v => if (v.doubleValue() < theta) merged.add(v) }
        // re-cap to the smaller k so the derived union is a valid sketch
        val k = math.min(sa.k, sb.k)
        var t = theta
        while (merged.size > k) { val last = merged.last(); merged.remove(last); t = last.doubleValue() }
        return if (t >= 1.0) merged.size.toDouble else merged.size / t
    }
    if (theta >= 1.0) n.toDouble else n / theta
  }
}

private[functions] trait ThetaAggBase extends TypedImperativeAggregate[ThetaBuf] {
  def k: Int
  override def nullable: Boolean = true
  override def createAggregationBuffer(): ThetaBuf = new ThetaBuf(k)
  override def merge(b: ThetaBuf, o: ThetaBuf): ThetaBuf = b.mergeWith(o)
  override def serialize(b: ThetaBuf): Array[Byte] = b.serialized
  override def deserialize(bytes: Array[Byte]): ThetaBuf = ThetaBuf.deserialize(bytes)
}

/** `theta_sketch_bytes(item, k)` — build a serialized theta sketch of
  * the distinct items (string or integral). */
case class ThetaSketchBytesAgg(
    item: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  require(k >= 8, s"k must be ≥ 8: $k")
  override def children: Seq[Expression] = Seq(item)
  override def checkInputDataTypes(): TypeCheckResult = item.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string or integral item, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_sketch_bytes"

  override def update(b: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = item.eval(input)
    if (v != null) {
      val h = v match {
        case s: UTF8String => ThetaBuf.hashString(s)
        case l: java.lang.Long => ThetaBuf.hashLong(l.longValue())
        case i: java.lang.Integer => ThetaBuf.hashLong(i.longValue())
      }
      b.updateHash(h)
    }
    b
  }
  override def eval(b: ThetaBuf): Any = if (!b.seen) null else b.serialized

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchBytesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchBytesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(item = c(0))
}

/** `theta_union_merge(sk, k)` — fold serialized sketches by θ-union:
  * the store-advance primitive. Idempotent (V is a set), so a replayed
  * delta cannot move a committed group. */
case class ThetaUnionMergeAgg(
    sk: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends ThetaAggBase {
  require(k >= 8, s"k must be ≥ 8: $k")
  override def children: Seq[Expression] = Seq(sk)
  override def checkInputDataTypes(): TypeCheckResult = sk.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized sketch (binary), got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "theta_union_merge"

  override def update(b: ThetaBuf, input: InternalRow): ThetaBuf = {
    val v = sk.eval(input)
    if (v != null) b.mergeWith(ThetaBuf.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def eval(b: ThetaBuf): Any = if (!b.seen) null else b.serialized

  override def withNewMutableAggBufferOffset(o: Int): ThetaUnionMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaUnionMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sk = c(0))
}

/** `theta_estimate(sk)` — distinct estimate of one serialized sketch.
  * Eval-only: runs on STORE rows, never in a corpus-scan hot path. */
case class ThetaEstimateExpr(sketch: Expression)
    extends UnaryExpression with CodegenFallback {
  override def child: Expression = sketch
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized sketch (binary), got ${other.catalogString}")
  }
  override def prettyName: String = "theta_estimate"
  override def nullSafeEval(input: Any): Any =
    ThetaBuf.deserialize(input.asInstanceOf[Array[Byte]]).estimate
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(sketch = c)
}

private[functions] trait ThetaSetOpExpr extends BinaryExpression with CodegenFallback {
  def op: String
  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two serialized sketches, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
  override def nullSafeEval(a: Any, b: Any): Any =
    ThetaBuf.setOpEstimate(
      a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]], op)
}

/** `theta_intersect_estimate(a, b)` — |A ∩ B| estimate. */
case class ThetaIntersectExpr(left: Expression, right: Expression)
    extends ThetaSetOpExpr {
  override def op: String = "intersect"
  override def prettyName: String = "theta_intersect_estimate"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `theta_anotb_estimate(a, b)` — |A \ B| estimate. */
case class ThetaAnotBExpr(left: Expression, right: Expression)
    extends ThetaSetOpExpr {
  override def op: String = "anotb"
  override def prettyName: String = "theta_anotb_estimate"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** `theta_union_estimate(a, b)` — |A ∪ B| estimate (pairwise scalar;
  * the aggregate fold is [[ThetaUnionMergeAgg]]). */
case class ThetaUnionPairExpr(left: Expression, right: Expression)
    extends ThetaSetOpExpr {
  override def op: String = "union"
  override def prettyName: String = "theta_union_estimate"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object ThetaFunctions {
  /** Aggregate Column: serialized theta sketch of distinct items. */
  def theta_sketch_bytes(item: Column, k: Int): Column =
    GraftSqlBridge.column(
      ThetaSketchBytesAgg(GraftSqlBridge.expression(item), k).toAggregateExpression())

  /** Aggregate Column: θ-union fold of serialized sketches. */
  def theta_union_merge(sk: Column, k: Int): Column =
    GraftSqlBridge.column(
      ThetaUnionMergeAgg(GraftSqlBridge.expression(sk), k).toAggregateExpression())

  /** Scalar Column: distinct estimate of one sketch. */
  def theta_estimate(sk: Column): Column =
    GraftSqlBridge.column(ThetaEstimateExpr(GraftSqlBridge.expression(sk)))

  /** Scalar Column: |A ∩ B| estimate. */
  def theta_intersect_estimate(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ThetaIntersectExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Scalar Column: |A \ B| estimate. */
  def theta_anotb_estimate(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ThetaAnotBExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** Scalar Column: |A ∪ B| estimate (pairwise). */
  def theta_union_estimate(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      ThetaUnionPairExpr(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
