package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine capability: a Spark-first DataFrame program plus
  * (when SQL-expressible) an equivalent ANSI/DuckDB oracle query the
  * driver replays over the same parquet tables.
  *
  * Column names in `fn`'s output and the oracle SELECT list must match
  * exactly — the driver sorts columns by name before hashing values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
