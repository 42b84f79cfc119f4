package graft.streaming

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Streaming observability: a `StreamingQueryListener` that captures
  * per-batch progress (rows, duration, event-time watermark) into a
  * bounded in-memory ring, queryable as a DataFrame — the ops feed a
  * production pipeline exports to its metrics store. Listener events
  * arrive on Spark's listener bus (async, off the query path), so the
  * capture adds no per-batch work to the stream itself.
  */
final class ProgressRecorder(maxEvents: Int = 1000) extends StreamingQueryListener {
  import ProgressRecorder.BatchProgress

  private val ring = ListBuffer.empty[BatchProgress]

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit =
    ring.synchronized {
      val p = e.progress
      ring += BatchProgress(
        p.id.toString, p.batchId, p.numInputRows,
        Option(p.durationMs.get("triggerExecution")).map(_.longValue).getOrElse(-1L),
        Option(p.eventTime.get("watermark")).getOrElse(""),
        p.timestamp)
      if (ring.size > maxEvents) ring.remove(0, ring.size - maxEvents)
    }

  def snapshot(spark: SparkSession): DataFrame = {
    import spark.implicits._
    ring.synchronized { ring.toList }.toDF()
  }

  def attach(spark: SparkSession): this.type = {
    spark.streams.addListener(this); this
  }
  def detach(spark: SparkSession): Unit = spark.streams.removeListener(this)
}

object ProgressRecorder {
  // top-level so Spark can derive a product encoder for snapshot()
  final case class BatchProgress(
      query_id: String, batch_id: Long, num_input_rows: Long,
      duration_ms: Long, watermark: String, timestamp: String)
}
