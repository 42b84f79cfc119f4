package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: min-heap over (score, id); ties broken by
  * smaller id winning (deterministic across partitionings). */
final class TopKHeap(val k: Int) {
  // parallel arrays, heap-ordered by (score asc, id desc) at the root,
  // i.e. the WORST kept element sits at index 0
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // `a` is worse than `b` if lower score, or equal score and larger id
  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  def add(score: Double, id: Long): Unit = {
    if (score.isNaN) {
      // NaN compares false under every ordering: once admitted it would
      // pin the heap root and block all future replacements — drop it.
    } else if (size < k) {
      var i = size
      scores(i) = score; ids(i) = id; size += 1
      while (i > 0) { // sift up (min-heap on "worse")
        val p = (i - 1) / 2
        if (worse(scores(i), ids(i), scores(p), ids(p))) {
          swap(i, p); i = p
        } else i = 0
      }
    } else if (worse(scores(0), ids(0), score, id)) {
      scores(0) = score; ids(0) = id
      var i = 0 // sift down
      var continue = true
      while (continue) {
        val l = 2 * i + 1; val r = 2 * i + 2
        var m = i
        if (l < size && worse(scores(l), ids(l), scores(m), ids(m))) m = l
        if (r < size && worse(scores(r), ids(r), scores(m), ids(m))) m = r
        if (m != i) { swap(i, m); i = m } else continue = false
      }
    }
  }

  @inline private def swap(a: Int, b: Int): Unit = {
    val ts = scores(a); scores(a) = scores(b); scores(b) = ts
    val ti = ids(a); ids(a) = ids(b); ids(b) = ti
  }

  def mergeWith(o: TopKHeap): TopKHeap = {
    var i = 0
    while (i < o.size) { add(o.scores(i), o.ids(i)); i += 1 }
    this
  }

  /** (id, score) pairs, best first; ties by ascending id. */
  def sortedPairs: Array[(Long, Double)] =
    (0 until size).map(i => (ids(i), scores(i))).toArray
      .sortBy { case (id, s) => (-s, id) }
}

/** `top_k_by_score(score, id, k)` — partial-aggregatable exact top-k:
  * each partition keeps a k-element heap (map-side combine), merge is
  * heap-union, so a 100 TB ANN scan shuffles k rows per partition
  * instead of every candidate pair (SURVEY §4 item 2: the scalable
  * alternative to `row_number() OVER (...)` re-ranking).
  * Output: array<struct<id, score>>, best-first, deterministic ties.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKHeap] {
  require(k > 0 && k <= 100000, s"top_k k out of range: $k")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double score, bigint id), got " +
          s"${s.catalogString}, ${i.catalogString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKHeap = new TopKHeap(k)

  override def update(b: TopKHeap, input: InternalRow): TopKHeap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    }
    b
  }

  override def merge(b: TopKHeap, o: TopKHeap): TopKHeap = b.mergeWith(o)

  override def eval(b: TopKHeap): Any =
    new GenericArrayData(b.sortedPairs.map { case (i, s) =>
      InternalRow(i, s)
    }.toArray[Any])

  override def serialize(b: TopKHeap): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + b.size * 16)
    buf.putInt(b.k).putInt(b.size)
    var i = 0
    while (i < b.size) { buf.putDouble(b.scores(i)).putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKHeap = {
    val buf = ByteBuffer.wrap(bytes)
    val kk = buf.getInt; val n = buf.getInt
    val h = new TopKHeap(kk)
    var i = 0
    while (i < n) { h.add(buf.getDouble, buf.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(score = c(0), id = c(1))
}

/** Tie-closure-tracking buffer for [[PoolTieClosed]]: a [[TopKHeap]]
  * of capacity `maxKeep` (= headroom over the nominal pool size `c`)
  * plus the best score this buffer ever EVICTED or dropped. After the
  * final merge, the pool's `c`-boundary tie group is provably complete
  * iff every eviction anywhere scored strictly below the c-th best
  * kept score — any eviction AT that score means a tie group member
  * was cut and the pool is no longer a pure function of scores. */
final class TieClosedBuf(val c: Int, val maxKeep: Int) {
  val heap = new TopKHeap(maxKeep)
  var evictedBest: Double = Double.NegativeInfinity

  def add(score: Double, id: Long): Unit = {
    if (score.isNaN) return
    if (heap.size < maxKeep) { heap.add(score, id); return }
    // heap full: either the incoming row is dropped, or it replaces the
    // current worst — both are evictions of the LOSING row's score.
    // Decide the loser BEFORE the add (the heap's tie rule: the
    // incoming row wins iff the root has a lower score, or an equal
    // score and a larger id).
    val (ws, wi) = (heap.scores(0), heap.ids(0))
    val incomingWins = ws < score || (ws == score && wi > id)
    val lost = if (incomingWins) ws else score
    heap.add(score, id)
    if (lost > evictedBest) evictedBest = lost
  }

  def mergeWith(o: TieClosedBuf): TieClosedBuf = {
    if (o.evictedBest > evictedBest) evictedBest = o.evictedBest
    var i = 0
    while (i < o.heap.size) { add(o.heap.scores(i), o.heap.ids(i)); i += 1 }
    this
  }
}

/** `top_k_pool_tie_closed(score, id, c, maxKeep)` — the ADC candidate
  * pool with a TIE-CLOSED boundary (round 19 — VERDICT r18 #5): the
  * returned pool is the top-`c` by descending score PLUS every row
  * tied with the c-th score, so the pool is a pure function of SCORES
  * — never of id order. Rationale: [[TopKByScore]]'s deterministic
  * id tie-break is the right contract for a FINAL top-k (ties at the
  * k-th similarity are declared), but for a candidate POOL it silently
  * cuts boundary-tied candidates on code-degenerate corpora (many
  * vectors sharing a PQ code ⇒ identical ADC distances), and a cut
  * true neighbor is unrecoverable by the exact re-rank. `maxKeep`
  * bounds memory (the dynamic-C growth allowance); if the boundary
  * tie group still cannot close within it, eval REFUSES loudly rather
  * than serve an id-arbitrary pool — the corpus is code-degenerate
  * beyond the certified margin at this pool size. Partial-aggregatable
  * like [[TopKByScore]]: per-partition buffers of ≤ maxKeep rows plus
  * one eviction watermark; a merge can only raise the watermark. */
case class PoolTieClosed(
    score: Expression,
    id: Expression,
    c: Int,
    maxKeep: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TieClosedBuf] {
  require(c > 0 && maxKeep >= c && maxKeep <= 1000000,
    s"pool sizes out of range: c=$c maxKeep=$maxKeep")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double score, bigint id), got " +
          s"${s.catalogString}, ${i.catalogString}")
    }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_pool_tie_closed"

  override def createAggregationBuffer(): TieClosedBuf =
    new TieClosedBuf(c, maxKeep)

  override def update(b: TieClosedBuf, input: InternalRow): TieClosedBuf = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) b.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    b
  }

  override def merge(b: TieClosedBuf, o: TieClosedBuf): TieClosedBuf = b.mergeWith(o)

  override def eval(b: TieClosedBuf): Any = {
    val pairs = b.heap.sortedPairs // best first, ties by ascending id
    val kept =
      if (pairs.length < c) {
        // fewer candidates than the nominal pool ⇒ no buffer ever
        // filled to maxKeep ⇒ provably nothing was evicted anywhere
        pairs
      } else {
        // pairs.length == c must take this branch too: with
        // maxKeep == c evictions CAN occur at exactly c kept rows,
        // and the early return above would hand back a silently
        // split tie group
        val sC = pairs(c - 1)._2
        if (b.evictedBest >= sC) throw new IllegalStateException(
          s"$prettyName: the ADC pool's c=$c boundary tie group exceeds " +
            s"maxKeep=$maxKeep — the corpus is code-degenerate beyond the " +
            "certified pool margin; raise the pool cap or serve a smaller k")
        pairs.takeWhile { case (_, s) => s >= sC }
      }
    new GenericArrayData(kept.map { case (i, s) => InternalRow(i, s) }.toArray[Any])
  }

  override def serialize(b: TieClosedBuf): Array[Byte] = {
    val buf = ByteBuffer.allocate(24 + b.heap.size * 16)
    buf.putInt(b.c).putInt(b.maxKeep).putDouble(b.evictedBest).putInt(b.heap.size)
    var i = 0
    while (i < b.heap.size) { buf.putDouble(b.heap.scores(i)).putLong(b.heap.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TieClosedBuf = {
    val buf = ByteBuffer.wrap(bytes)
    val cc = buf.getInt; val mk = buf.getInt; val ev = buf.getDouble; val n = buf.getInt
    val b = new TieClosedBuf(cc, mk)
    b.evictedBest = ev
    var i = 0
    while (i < n) { b.heap.add(buf.getDouble, buf.getLong); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): PoolTieClosed =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): PoolTieClosed =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c2: IndexedSeq[Expression]): Expression =
    copy(score = c2(0), id = c2(1))
}

object TopKFunctions {
  /** Aggregate Column: exact top-k (id, score) pairs by descending
    * score with deterministic ties. */
  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByScore(GraftSqlBridge.expression(score), GraftSqlBridge.expression(id), k)
        .toAggregateExpression())

  /** Aggregate Column: tie-closed candidate pool — top-`c` by
    * descending score plus every row tied with the c-th score (see
    * [[PoolTieClosed]]). Refuses loudly if the boundary tie group
    * exceeds `maxKeep`. */
  def top_k_pool_tie_closed(score: Column, id: Column, c: Int,
                            maxKeep: Int): Column =
    GraftSqlBridge.column(
      PoolTieClosed(GraftSqlBridge.expression(score),
        GraftSqlBridge.expression(id), c, maxKeep)
        .toAggregateExpression())
}
