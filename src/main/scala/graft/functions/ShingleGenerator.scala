package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{CollectionGenerator, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-generating expression (UDTF; SURVEY §2.7 "Generator/
  * explode for tokenization fan-out"): emits one row per word-n-gram
  * shingle of a token array, deduplicated, without materializing the
  * intermediate shingle array per row (the `transform(sequence(...))` +
  * `explode` composition builds the whole array first — this streams).
  */
case class ShingleGenerator(child: Expression, n: Int)
    extends UnaryExpression with CollectionGenerator with CodegenFallback {
  require(n >= 1 && n <= 16, s"shingle width out of range: $n")

  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))
  override def collectionType: DataType = ArrayType(elementSchema, containsNull = false)
  override def position: Boolean = false
  override def inline: Boolean = false
  override def prettyName: String = "shingles"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val m = arr.numElements()
      if (m < n) Iterator.empty
      else {
        val seen = new java.util.HashSet[UTF8String]()
        (0 to m - n).iterator.flatMap { i =>
          val parts = (i until i + n).map { j =>
            if (arr.isNullAt(j)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(j)
          }
          val s = UTF8String.concatWs(UTF8String.fromString(" "), parts: _*)
          if (seen.add(s)) Iterator.single(InternalRow(s)) else Iterator.empty
        }
      }
    }
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object GeneratorFunctions {
  /** Distinct word-n-gram shingles of a token array column, one row
    * each (use with `select(col("id"), shingles(tokens, 3))`). */
  def shingles(tokens: Column, n: Int): Column =
    GraftSqlBridge.column(ShingleGenerator(GraftSqlBridge.expression(tokens), n))
}
