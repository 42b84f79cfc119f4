package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge: `ExpressionUtils` (Column ⇄ catalyst Expression) is
  * `private[sql]` in Spark 4, so extension libraries expose it via a
  * shim in the `org.apache.spark.sql` package — the standard pattern
  * for Spark-native function libraries.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The ANALYZED logical plan of a Dataset — the shape subquery
    * expressions (e.g. a plan-resident bloom filter) embed. Classic
    * `Dataset.queryExecution` is public but the api-facing type isn't
    * classic, hence the bridge cast. */
  def analyzedPlan(df: Dataset[_]): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]].queryExecution.analyzed

  /** Register a function on an EXISTING session (`sessionState` is
    * `private[sql]`; extensions only apply at session build time). */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** The session's LIVE instance of a registered V2 catalog,
    * instantiating it from the current conf on first access
    * (`catalogManager` is `private[sql]`). Catalog instances are
    * cached per session, so asking the instance — rather than
    * re-reading the conf — is the only way to agree with what reads
    * through `<catalog>.<table>` will actually resolve. */
  def catalogPlugin(spark: SparkSession, name: String)
      : org.apache.spark.sql.connector.catalog.CatalogPlugin =
    spark.sessionState.catalogManager.catalog(name)
}
