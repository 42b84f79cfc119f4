package graft

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** DRIFT-IMMUNE per-query profiler (round 19): the optimization
  * sandbox's wall-clock swings 2-6× within minutes (BASELINE.md's
  * standing calibration problem), so structural A/B evidence uses
  * DETERMINISTIC plan metrics instead — Spark jobs launched, stages,
  * tasks, shuffle bytes read/written — which depend only on the code
  * and the data, never on machine speed. One warm run (codegen, store
  * build) then one counted run per query.
  *
  * Usage: runMain graft.ProfileJobs <dataDir> <query> [<query> ...]
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val names = args.tail.toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-profile-jobs")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val exec = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          exec.addAndGet(m.executorRunTime)
        }
      }
    })

    def drain(): Unit = Thread.sleep(1500) // listener bus is async

    val rows = names.map { q =>
      val fn = SparkEntry.queries(q)
      fn(spark, dir).write.format("noop").mode("overwrite").save() // warm
      spark.catalog.clearCache(); System.gc(); drain()
      jobs.set(0); stages.set(0); tasks.set(0)
      shufR.set(0); shufW.set(0); exec.set(0)
      val t0 = System.nanoTime()
      fn(spark, dir).write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      drain()
      System.err.println(f"[pjobs] $q%-30s jobs=${jobs.get}%4d stages=${stages.get}%4d " +
        f"tasks=${tasks.get}%6d shufR=${shufR.get}%10d shufW=${shufW.get}%10d " +
        f"execMs=${exec.get}%8d wall=$wall%6.2f")
      f""""$q":{"jobs":${jobs.get},"stages":${stages.get},"tasks":${tasks.get},""" +
        f""""shuffle_read":${shufR.get},"shuffle_write":${shufW.get},""" +
        f""""executor_ms":${exec.get},"wall_sec":$wall%.3f}"""
    }
    println(s"""{"metric":"profile_jobs","dir":"$dir",${rows.mkString(",")}}""")
    spark.stop()
  }
}
