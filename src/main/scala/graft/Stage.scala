package graft

/** Shared driver-side STAGE pool for compositions whose store families
  * are disjoint (guide §2.6 "overlap independent jobs"): each stage is
  * an independent Spark job DAG — actions are only sequential because
  * driver code calls them sequentially, so independent store builds /
  * serves run from driver threads and back-fill executor cores freed
  * by each other's fixed-cost tails. Daemon threads (a crashed query
  * never pins the JVM).
  *
  * BOUNDED since round 20 (VERDICT r19 #4): the r19 pool was
  * unbounded, and nested compositions (CrawlDay's 3 index chains ×
  * each chain's parallel store writes + the detached ANN leg) could
  * put ~10 concurrent Spark jobs in flight — at 8 cores their cached /
  * checkpointed blocks thrash the unified memory pool (the measured
  * q190 8-core remeasure pathology: 20.3 s first-pass → 174.3 s). Two
  * rules bound it:
  *  - a semaphore of `max(2, cores/4)` permits gates every RUNNING
  *    top-level stage (cores = the session's defaultParallelism, so
  *    the bound scales with `local[N]` / the cluster, never a constant
  *    tuned for one machine);
  *  - a NESTED [[par]]/[[detach]] (called from a thread already inside
  *    a stage) runs its work INLINE on the calling thread — the outer
  *    permit already accounts for it, and inline nesting is what makes
  *    the semaphore deadlock-free: a permit holder only ever runs leaf
  *    work, it never blocks acquiring a second permit.
  *
  * [[par]] awaits ALL stages before surfacing any failure (ADVICE r18):
  * a sequential first-failure rethrow would leave sibling stages
  * running Spark jobs against the same session after the query has
  * failed — stray concurrent writes to scratch stores and confusing
  * secondary errors. Every outcome is collected, then the first
  * failure is rethrown with the rest attached as suppressed.
  *
  * Single-writer discipline is the CALLER's contract, as everywhere:
  * stages passed to one [[par]] call must touch disjoint stores.
  */
object Stage {
  lazy val ec: concurrent.ExecutionContext =
    concurrent.ExecutionContext.fromExecutor(
      java.util.concurrent.Executors.newCachedThreadPool(r => {
        val t = new Thread(r, "graft-stage")
        t.setDaemon(true)
        t
      }))

  /** Stage-concurrency bound: max(2, cores/4) — 8 in-flight stages at
    * local[32], 2 at local[8]/local[4] (the VERDICT r19 #4 sizing). The
    * MAIN query thread is not a stage, so total concurrent job DAGs =
    * bound + 1. Resolved lazily from the active session's scheduler
    * parallelism (the bench/verify mains all build the session before
    * any operator runs); the processor count is only the no-session
    * fallback. */
  private lazy val maxInFlight: Int = {
    val cores = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.defaultParallelism)
      .getOrElse(Runtime.getRuntime.availableProcessors())
    math.max(2, cores / 4)
  }
  private lazy val permits = new java.util.concurrent.Semaphore(maxInFlight, true)
  private val inStage = new ThreadLocal[Boolean] {
    override def initialValue: Boolean = false
  }

  /** Run `f` as a permit-holding stage. The permit covers the whole
    * stage INCLUDING its inline-nested sub-stages (see class doc). */
  private def gated[A](f: () => A): A = {
    permits.acquire()
    inStage.set(true)
    try f()
    finally { inStage.set(false); permits.release() }
  }

  def par[A](fs: (() => A)*): Seq[A] = {
    if (inStage.get) return fs.map(_()) // nested: outer permit covers us
    val futs = fs.map(f => concurrent.Future(gated(f))(ec))
    val outcomes = futs.map(f => scala.util.Try(
      concurrent.Await.result(f, concurrent.duration.Duration.Inf)))
    val failures = outcomes.collect { case scala.util.Failure(t) => t }
    if (failures.nonEmpty) {
      failures.tail.foreach(failures.head.addSuppressed)
      throw failures.head
    }
    outcomes.map(_.get)
  }

  /** A DETACHED stage (the CrawlDay/Takedown ANN-leg shape): runs
    * concurrently with the caller's own work and is awaited later.
    * Bounded by the same permit pool as [[par]] stages; from a thread
    * already inside a stage it degrades to eager inline execution
    * (completed future) — same deadlock-freedom rule. */
  def detach[A](f: => A): concurrent.Future[A] =
    if (inStage.get) concurrent.Future.fromTry(scala.util.Try(f))
    else concurrent.Future(gated(() => f))(ec)

  /** Eagerly materialize a corpus-fraction frame to executor-local
    * DISK and return it (round 20 — ADVICE r19): `localCheckpoint`
    * pins blocks at MEMORY_AND_DISK, and several concurrent stages'
    * pinned blocks compete with the unified execution pool exactly
    * when the stage pool overlaps jobs (the q190 remeasure tail).
    * DISK_ONLY keeps the reuse (computed once, scanned by N stages)
    * without the memory contention. Caller unpersists when the scope
    * ends; small detached scopes should keep using localCheckpoint. */
  def pinDisk(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    df.persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    df.count() // eager: materialize before concurrent stages scan it
    df
  }
}
