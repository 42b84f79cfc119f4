package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed aggregators (`Aggregator[IN, BUF, OUT]`,
  * SURVEY §2.7 UDAF row) — the Dataset-API counterpart of the untyped
  * [[TopKByScore]]. Partial-aggregatable: `reduce` runs map-side,
  * `merge` combines partials.
  */
object TypedAggregators {

  case class WeightedMeanBuf(sum: Double, weight: Double)

  /** Weighted mean of (value, weight) pairs; NaN-free (empty → 0.0). */
  val weightedMean: Aggregator[(Double, Double), WeightedMeanBuf, Double] =
    new Aggregator[(Double, Double), WeightedMeanBuf, Double] {
      override def zero: WeightedMeanBuf = WeightedMeanBuf(0.0, 0.0)
      override def reduce(b: WeightedMeanBuf, a: (Double, Double)): WeightedMeanBuf =
        WeightedMeanBuf(b.sum + a._1 * a._2, b.weight + a._2)
      override def merge(x: WeightedMeanBuf, y: WeightedMeanBuf): WeightedMeanBuf =
        WeightedMeanBuf(x.sum + y.sum, x.weight + y.weight)
      override def finish(b: WeightedMeanBuf): Double =
        if (b.weight == 0.0) 0.0 else b.sum / b.weight
      override def bufferEncoder: Encoder[WeightedMeanBuf] = Encoders.product
      override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
    }
}
