ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkstreamkuduspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// PARALLEL TEST GROUPS (round 20 — VERDICT r19 #1/#2): the suite
// outgrew the driver's wall-clock budget (38 min serial in this
// sandbox; the r19 run was killed mid-suite, failing the gate with a
// "SparkContext was shut down" tail). Suites are deterministically
// packed into FORKED groups — each group is its own JVM with its own
// SparkSession (SharedSpark is per-JVM), so there is NO shared-session
// state across concurrently running suites (rule-injection and
// conf-mutating specs stay correct by construction). Coverage is
// untouched: same tests, same assertions, ~6× less wall clock.
// Weights are the measured round-20 per-suite seconds; unknown (new)
// suites default to 10 s and the greedy longest-processing-time pack
// keeps groups balanced as the suite grows.
val testGroupCount = 6
val testSuiteWeights: Map[String, Int] = Map(
  "TakedownIndexSpec" -> 372, "PlanAuditSpec" -> 309,
  "DerivedStoreCompactionSpec" -> 167, "UpsertStoreProps" -> 96,
  "PairGraphSpec" -> 89, "JavaApiParitySpec" -> 87,
  "ManifestMaintainSpec" -> 78, "StreamingOpsSpec" -> 70,
  "PartitionPruningSpec" -> 68, "RetractionPolicySpec" -> 56,
  "ContinuousPipelineSpec" -> 55, "IndexStoreProps" -> 53,
  "CrashDisciplineSpec" -> 52, "IvfPqIndexSpec" -> 51,
  "TakedownSpec" -> 50, "RetrievalSpec" -> 50,
  "JoinViewMaintainSpec" -> 45, "OperatorsSpec" -> 44,
  "DerivedCatalogSpec" -> 32, "UpsertSinkSpec" -> 29,
  "PostingsMaintainSpec" -> 27, "SourcesSpec" -> 25,
  "ShingleIndexSpec" -> 22, "PqIndexSpec" -> 20,
  "AnnRewriteSpec" -> 18, "SpanBloomPqSpec" -> 18,
  "AttributionProps" -> 17, "TrigramMaintainSpec" -> 17,
  "IvfPqMaintainSpec" -> 17, "VectorIndexMaintainSpec" -> 16,
  "ThetaSketchSpec" -> 16, "AnalyticsSpec" -> 16,
  "SimhashMaintainSpec" -> 14, "TrigramRewriteSpec" -> 13)
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  def w(t: sbt.TestDefinition): Int =
    testSuiteWeights.getOrElse(t.name.split('.').last, 10)
  val sorted = tests.sortBy(t => (-w(t), t.name)) // deterministic LPT
  val bins = Array.fill(testGroupCount)(
    scala.collection.mutable.ListBuffer.empty[sbt.TestDefinition])
  val load = Array.fill(testGroupCount)(0L)
  sorted.foreach { t =>
    val i = load.indexOf(load.min)
    bins(i) += t; load(i) += w(t)
  }
  bins.zipWithIndex.map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toList,
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }.toSeq
}
// default sbt caps concurrently running forked test groups at 1;
// raise exactly that cap (6 groups × local[4] task threads fits the
// 32-core sandbox with headroom for the driver threads)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(8),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
