package graft.functions

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Plan-resident bloom-filter pruning — Spark's own runtime-filter
  * machinery ([[BloomFilterAggregate]] / [[BloomFilterMightContain]],
  * the expressions behind `spark.sql.optimizer.runtime.bloomFilter`)
  * exposed as library functions, so an operator can build a bloom over
  * a SMALL key set (e.g. an eval split's n-gram hashes) and prune a
  * corpus-sized side MAP-SIDE before any shuffle.
  *
  * The filter is aggregated distributed (partial blooms OR-merge — the
  * sketch is a union-homomorphism) and embedded as a scalar subquery,
  * so the serialized bitmap travels plan-side like a broadcast: no
  * driver round-trip, no collect. Probes evaluate per-row against the
  * subquery result.
  *
  * Contract: both build and probe sides must feed the SAME 64-bit key
  * (we use xxhash64 of the payload, computed before the value leaves
  * its row). Bloom semantics guarantee NO false negatives — a
  * downstream exact equi-join removes the false positives, so
  * bloom-prune-then-join is result-identical to join-alone while
  * shuffling only |build side| + ε rows of the big side.
  */
object BloomFunctions {

  /** Aggregate `keys` (LongType) into a serialized bloom filter sized
    * for `expectedItems` distinct keys in `numBits` bits. */
  def bloom_agg(keys: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(keys),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe of `key` (LongType) against the single-row
    * bloom-filter aggregate `bloom` (one binary column), embedded as a
    * scalar subquery — Catalyst requires the bloom side to be a
    * constant or scalar subquery, and the subquery form keeps the
    * build distributed and the bitmap out of the driver. */
  def might_contain(bloom: DataFrame, key: Column): Column =
    GraftSqlBridge.column(
      BloomFilterMightContain(
        ScalarSubquery(GraftSqlBridge.analyzedPlan(bloom)),
        GraftSqlBridge.expression(key)))
}
