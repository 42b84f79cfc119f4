package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.types._

/** Input-type contract for the graft vector expressions. Lives in the
  * sql package because `AbstractDataType` (and thus `inputTypes`) is
  * `private[sql]`. The TypeCollection accepts array<float> and
  * array<double> as-is (no cast inserted — the expressions read either
  * element width natively, keeping the hot path allocation-free) and
  * implicit-casts anything else numeric (e.g. the array<decimal> that
  * bare SQL literals like `array(3.0, 4.0)` produce) to array<float>.
  */
trait GraftVectorArgs extends ImplicitCastInputTypes { self: Expression =>
  /** number of vector arguments (trailing non-vector args excluded) */
  def vectorArity: Int
  override def inputTypes: Seq[AbstractDataType] =
    Seq.fill(vectorArity)(TypeCollection(
      // double listed first: other numeric arrays (decimal/bigint
      // literals) coerce to double (exact to 2^53) rather than float;
      // float and double inputs still match exactly -> no cast inserted
      ArrayType(DoubleType), ArrayType(FloatType)))
}
