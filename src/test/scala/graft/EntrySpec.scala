package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver's smoke contract: entry() returns rows on sf0.001. */
class EntrySpec extends AnyFunSuite {
  test("entry() flagship query returns rows") {
    val df = SparkEntry.entry(SharedSpark.spark)
    assert(df.count() > 0)
  }
  test("every declared query has a unique name and total fn") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    // no name lost to map-key collision; oracle SQL is well-formed
    assert(SparkEntry.queries.size == SparkEntry.allQueries.size)
    SparkEntry.oracleSql.values.foreach { q =>
      assert(q.trim.toUpperCase.startsWith("SELECT") || q.trim.toUpperCase.startsWith("WITH"))
      assert(Tables.all.exists(t => q.contains(t)), s"oracle references no known table: $q")
    }
  }
}
