package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryDef, Tables}

/** As-of (point-in-time) join — an operator Spark lacks natively
  * (SURVEY §2.7 "joins … as-of"). Implemented by composing built-ins
  * (preference order (a) from the build brief): union both sides,
  * single sort within each key partition, and a running `last(...,
  * ignoreNulls)` window to carry the most recent right-side row forward.
  *
  * Scale: ONE shuffle on the join key + a per-partition sort — the same
  * cost profile as a sort-merge join. No per-row subqueries, no
  * nested-loop blowup, no driver-side state; each key's timeline is
  * processed streamingly inside its partition, so it holds at 100 TB
  * provided keys fit a partition (skewed keys: pre-salt by time bucket).
  */
object AsOf {

  /** For each left row, attach the latest right row with the same key
    * and rightTime <= leftTime. `payload` columns are carried from the
    * right side (each must exist there); left columns pass through.
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      payload: Seq[(String, String)]): DataFrame = {
    val leftCols = left.columns
    // Right rows sort BEFORE left rows at equal timestamps (side 0 < 1)
    // => "at or before" semantics, matching DuckDB's ASOF (>=) join.
    val taggedLeft = payload.foldLeft(
      left.withColumn("__t", col(leftTime)).withColumn("__side", lit(1))) {
      case (df, (src, dst)) => df.withColumn(dst, lit(null).cast(right.schema(src).dataType))
    }
    val taggedRight = {
      val base = right
        .withColumn("__t", col(rightTime))
        .withColumn("__side", lit(0))
      val withPayload = payload.foldLeft(base) { case (df, (src, dst)) =>
        df.withColumn(dst, col(src))
      }
      // null out the left-only columns, keep schema aligned for union
      leftCols.foldLeft(withPayload) { case (df, c) =>
        if (right.columns.contains(c) && c != key) df.withColumn(c, col(c))
        else if (c == key) df
        else df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }
    }
    val unioned = taggedLeft.select((leftCols.map(col) ++ Seq(col("__t"), col("__side")) ++
        payload.map { case (_, dst) => col(dst) }): _*)
      .unionByName(taggedRight.select((leftCols.map(col) ++ Seq(col("__t"), col("__side")) ++
        payload.map { case (_, dst) => col(dst) }): _*))
    // final payload-id tie-break: multiple right rows sharing (key, t)
    // would otherwise carry a partition-order-dependent payload
    val tieBreak = payload.headOption
      .map { case (_, dst) => col(dst).asc_nulls_first }
      .toSeq
    val w = Window.partitionBy(col(key))
      .orderBy(Seq(col("__t").asc, col("__side").asc) ++ tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(unioned) { case (df, (_, dst)) =>
      df.withColumn(dst, last(col(dst), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1).drop("__t", "__side")
  }

  /** Declared query: each event joined as-of to the user's most recent
    * signup event (at or before its timestamp). Oracle uses DuckDB's
    * native ASOF LEFT JOIN — same semantics, independent engine. */
  val q30AsOfJoin: QueryDef = QueryDef.sql(
    "q30_asof_last_signup",
    """SELECT e.event_id, e.user_id, e.event_type,
      |       s.event_id AS last_signup_event_id
      |FROM events e
      |ASOF LEFT JOIN (SELECT user_id, ts, event_id FROM events WHERE event_type = 'signup') s
      |  ON e.user_id = s.user_id AND e.ts >= s.ts
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val events = Tables.events(s, d)
    val left = events.select("event_id", "user_id", "event_type", "ts")
    val signups = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("event_id").as("signup_id"))
    asOfJoin(left, signups, key = "user_id", leftTime = "ts", rightTime = "ts",
      payload = Seq("signup_id" -> "last_signup_event_id"))
      .select("event_id", "user_id", "event_type", "last_signup_event_id")
      .orderBy("event_id")
  }

  val all: Seq[QueryDef] = Seq(q30AsOfJoin)
}
