package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic mergeable heavy-hitters summary — Misra–Gries with k
  * counters (Misra & Gries 1982; merge rule from Agarwal et al.,
  * "Mergeable Summaries", PODS 2012). Invariants, for a summary that
  * has absorbed N items (directly or through merges):
  *
  *   est(x) ≤ true(x)                 (counts only ever shrink)
  *   true(x) − est(x) ≤ N/(k+1)       (each truncation that subtracts
  *                                     m wipes ≥ (k+1)·m total count)
  *
  * so any item with true count > N/(k+1) is GUARANTEED present with a
  * positive counter. Both bounds hold for ANY merge tree — Spark's
  * nondeterministic partial-aggregate order changes which small-count
  * items survive but can never push an estimate past the bound, which
  * is why the DECLARED query output is (exact count, bound flags), the
  * q37/q120/q126 discipline, never the raw estimate.
  *
  * update: counter bump, or insert, or — at k+1 live counters — one
  * truncation (subtract the (k+1)-th largest = the min, drop zeros),
  * which is exactly the classical decrement-all step. merge: pointwise
  * sum, then the same truncation down to ≤ k counters. Memory is
  * k·(term + 8 B) per group — constant for the planner, the property
  * that lets a 100 TB token scan answer "what's frequent" in one pass
  * with map-side combine and a k-bounded shuffle row per partition.
  */
final class MgSummary(val k: Int) {
  var n: Long = 0L
  val counters: mutable.HashMap[UTF8String, Long] = mutable.HashMap.empty

  /** Subtract the (k+1)-th largest count from every counter and drop
    * the non-positive — leaves ≤ k live counters. No-op under k+1. */
  private def truncate(): Unit = if (counters.size > k) {
    val vals = counters.values.toArray
    java.util.Arrays.sort(vals)
    val m = vals(vals.length - (k + 1))
    val keep = counters.collect { case (t, c) if c > m => (t, c - m) }
    counters.clear()
    counters ++= keep
  }

  def update(t: UTF8String): Unit = {
    n += 1
    counters.get(t) match {
      case Some(c) => counters(t) = c + 1
      case None =>
        // clone: the eval'd UTF8String may point into a reused row buffer
        counters(t.clone()) = 1L
        truncate()
    }
  }

  def mergeWith(o: MgSummary): MgSummary = {
    n += o.n
    o.counters.foreach { case (t, c) =>
      counters(t) = counters.getOrElse(t, 0L) + c
    }
    truncate()
    this
  }

  def serialized: Array[Byte] = {
    val entries = counters.toArray
    val payload = entries.map { case (t, _) => 4 + t.numBytes() + 8 }.sum
    val buf = ByteBuffer.allocate(8 + 4 + 4 + payload)
    buf.putLong(n).putInt(k).putInt(entries.length)
    entries.foreach { case (t, c) =>
      val b = t.getBytes
      buf.putInt(b.length)
      buf.put(b)
      buf.putLong(c)
    }
    buf.array()
  }
}

object MgSummary {
  def deserialize(bytes: Array[Byte]): MgSummary = {
    val buf = ByteBuffer.wrap(bytes)
    val n = buf.getLong; val k = buf.getInt; var sz = buf.getInt
    val s = new MgSummary(k)
    s.n = n
    while (sz > 0) {
      val len = buf.getInt
      val b = new Array[Byte](len)
      buf.get(b)
      s.counters(UTF8String.fromBytes(b)) = buf.getLong
      sz -= 1
    }
    s
  }
}

private[functions] trait MgAggBase extends TypedImperativeAggregate[MgSummary] {
  def k: Int
  override def nullable: Boolean = true
  override def createAggregationBuffer(): MgSummary = new MgSummary(k)
  override def merge(b: MgSummary, o: MgSummary): MgSummary = b.mergeWith(o)
  override def serialize(b: MgSummary): Array[Byte] = b.serialized
  override def deserialize(bytes: Array[Byte]): MgSummary = MgSummary.deserialize(bytes)
}

/** `mg_sketch(term, k)` — the live summary as map<term, est>. */
case class MgSketchAgg(
    term: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MgAggBase {
  require(k >= 1, s"k must be ≥ 1: $k")
  override def children: Seq[Expression] = Seq(term)
  override def checkInputDataTypes(): TypeCheckResult = term.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string term, got ${other.catalogString}")
  }
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def prettyName: String = "mg_sketch"

  override def update(b: MgSummary, input: InternalRow): MgSummary = {
    val v = term.eval(input)
    if (v != null) b.update(v.asInstanceOf[UTF8String])
    b
  }

  override def eval(b: MgSummary): Any =
    if (b.n == 0) null
    else {
      val entries = b.counters.toArray
      new ArrayBasedMapData(
        new GenericArrayData(entries.map(_._1.asInstanceOf[Any])),
        new GenericArrayData(entries.map(_._2.asInstanceOf[Any])))
    }

  override def withNewMutableAggBufferOffset(o: Int): MgSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(term = c(0))
}

/** `mg_sketch_bytes(term, k)` — the summary SERIALIZED: the persistence
  * form a heavy-hitter store keeps per group. */
case class MgSketchBytesAgg(
    term: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MgAggBase {
  require(k >= 1, s"k must be ≥ 1: $k")
  override def children: Seq[Expression] = Seq(term)
  override def checkInputDataTypes(): TypeCheckResult = term.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string term, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_sketch_bytes"

  override def update(b: MgSummary, input: InternalRow): MgSummary = {
    val v = term.eval(input)
    if (v != null) b.update(v.asInstanceOf[UTF8String])
    b
  }
  override def eval(b: MgSummary): Any = if (b.n == 0) null else b.serialized

  override def withNewMutableAggBufferOffset(o: Int): MgSketchBytesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketchBytesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(term = c(0))
}

/** `mg_sketch_merge(sk, k)` — fold SERIALIZED summaries distributively:
  * the store-advance primitive (`(stored ∪ delta).groupBy(g).agg(...)`
  * keeps group cardinality unbounded — the QuantileSketchMergeAgg
  * discipline). The MG bounds hold for any merge tree, so partial-merge
  * order cannot break the bound flags downstream. */
case class MgSketchMergeAgg(
    sk: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends MgAggBase {
  require(k >= 1, s"k must be ≥ 1: $k")
  override def children: Seq[Expression] = Seq(sk)
  override def checkInputDataTypes(): TypeCheckResult = sk.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized summary (binary), got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "mg_sketch_merge"

  override def update(b: MgSummary, input: InternalRow): MgSummary = {
    val v = sk.eval(input)
    if (v != null) b.mergeWith(MgSummary.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }
  override def eval(b: MgSummary): Any = if (b.n == 0) null else b.serialized

  override def withNewMutableAggBufferOffset(o: Int): MgSketchMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MgSketchMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): Expression =
    copy(sk = c(0))
}

/** `mg_entries(sk)` — per-row scalar: decode a serialized summary into
  * array<struct<term, est>> ordered (est desc, term asc). Eval-only
  * (CodegenFallback): it runs on STORE rows — one per maintained group
  * — never in a corpus-scan hot path; keeping the decode in an
  * expression keeps "read the heavy hitters" a distributed select. */
case class MgEntriesExpr(sketch: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def child: Expression = sketch
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized summary (binary), got ${other.catalogString}")
  }
  override def prettyName: String = "mg_entries"

  override def nullSafeEval(input: Any): Any = {
    val s = MgSummary.deserialize(input.asInstanceOf[Array[Byte]])
    if (s.n == 0) null
    else {
      val sorted = s.counters.toArray.sortWith { case ((t1, c1), (t2, c2)) =>
        if (c1 != c2) c1 > c2 else t1.compareTo(t2) < 0
      }
      new GenericArrayData(sorted.map { case (t, c) =>
        InternalRow(t, c)
      }.map(_.asInstanceOf[Any]))
    }
  }
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(sketch = c)
}

/** `mg_n(sk)` — per-row scalar: the total item count a serialized
  * summary has absorbed (the N of the N/(k+1) error bound). */
case class MgCountExpr(sketch: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def child: Expression = sketch
  override def nullable: Boolean = true
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a serialized summary (binary), got ${other.catalogString}")
  }
  override def prettyName: String = "mg_n"
  override def nullSafeEval(input: Any): Any =
    MgSummary.deserialize(input.asInstanceOf[Array[Byte]]).n
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(sketch = c)
}

object HeavyFunctions {
  /** Aggregate Column: live Misra–Gries summary as map<term, est>. */
  def mg_sketch(term: Column, k: Int): Column =
    GraftSqlBridge.column(
      MgSketchAgg(GraftSqlBridge.expression(term), k).toAggregateExpression())

  /** Aggregate Column: the serialized summary (storage/merge form). */
  def mg_sketch_bytes(term: Column, k: Int): Column =
    GraftSqlBridge.column(
      MgSketchBytesAgg(GraftSqlBridge.expression(term), k).toAggregateExpression())

  /** Aggregate Column: fold serialized summaries — the store advance. */
  def mg_sketch_merge(sk: Column, k: Int): Column =
    GraftSqlBridge.column(
      MgSketchMergeAgg(GraftSqlBridge.expression(sk), k).toAggregateExpression())

  /** Scalar Column: decoded (term, est) entries, est desc. */
  def mg_entries(sk: Column): Column =
    GraftSqlBridge.column(MgEntriesExpr(GraftSqlBridge.expression(sk)))

  /** Scalar Column: total absorbed item count N. */
  def mg_n(sk: Column): Column =
    GraftSqlBridge.column(MgCountExpr(GraftSqlBridge.expression(sk)))
}
