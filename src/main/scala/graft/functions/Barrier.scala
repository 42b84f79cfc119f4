package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.DataType

/** Identity expression declared NON-deterministic — a PUSHDOWN BARRIER.
  *
  * Catalyst has no cost model for predicate pushdown: a filter over an
  * expensive derived column (e.g. `size(shingles) > 0` above the
  * shingling projection) is rewritten by substituting the full
  * producing expression and pushed to the scan, where it re-derives the
  * whole computation per row — and when a small input scans as ONE
  * split, that duplicated work runs single-core below the repartition
  * that was supposed to spread it (measured on the near-dup sketch:
  * 8.5 s vs 0.7 s for identical results). Spark never reorders
  * non-deterministic filters, so wrapping the condition keeps it
  * exactly where it was declared: above its producing projection,
  * above the parallelizing exchange, referencing the computed column
  * once.
  *
  * Evaluation and codegen delegate to the child unchanged — the only
  * effect is on the optimizer. Use ONLY on conditions whose placement
  * was chosen deliberately; a barrier on a genuinely pushable cheap
  * predicate costs scan pruning.
  */
case class PushdownBarrier(child: Expression) extends UnaryExpression {
  override lazy val deterministic: Boolean = false
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    child.eval(input)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = c.code, isNull = c.isNull, value = c.value)
  }
  override protected def withNewChildInternal(newChild: Expression): PushdownBarrier =
    copy(child = newChild)
}

object BarrierFunctions {
  /** Wrap a boolean (or any) column so the optimizer cannot move it. */
  def no_pushdown(c: Column): Column =
    GraftSqlBridge.column(PushdownBarrier(GraftSqlBridge.expression(c)))
}
