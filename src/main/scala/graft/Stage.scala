package graft

/** Shared driver-side STAGE pool for compositions whose store families
  * are disjoint (guide §2.6 "overlap independent jobs"): each stage is
  * an independent Spark job DAG — actions are only sequential because
  * driver code calls them sequentially, so independent store builds /
  * serves run from driver threads and back-fill executor cores freed
  * by each other's fixed-cost tails. Daemon threads (a crashed query
  * never pins the JVM); unbounded pool (stages block on Spark actions,
  * so live threads ≈ in-flight stages, a handful per composition).
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

  def par[A](fs: (() => A)*): Seq[A] = {
    val futs = fs.map(f => concurrent.Future(f())(ec))
    val outcomes = futs.map(f => scala.util.Try(
      concurrent.Await.result(f, concurrent.duration.Duration.Inf)))
    val failures = outcomes.collect { case scala.util.Failure(t) => t }
    if (failures.nonEmpty) {
      failures.tail.foreach(failures.head.addSuppressed)
      throw failures.head
    }
    outcomes.map(_.get)
  }
}
