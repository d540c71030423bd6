ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "biosetsspark"
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

// Driver bench contract (round 17): the driver captures the final ~2000
// chars of `sbt "runMain graft.Bench"` stdout and JSON-parses the LAST
// line. Two sbt behaviors have broken that parse every round so far:
//  1. forked-run output is routed through sbt's logger and prefixed
//     "[info] " (LoggedOutput is the default strategy) — StdoutOutput
//     passes the child's stdout through verbatim instead;
//  2. sbt prints "[success] Total time: ..." AFTER the run, so the
//     record is never the last line — showSuccess := false drops it.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
Global / excludeLintKeys += showSuccess

// Parallel forked test groups (round 17): the sequential suite run is
// ~14.5 min wall (828 s of test time, single forked JVM) — past the
// driver's `sbt test` budget (VERIFY_r16 shows the run cut off
// mid-suite with zero failures). Suites are packed into 8 groups by
// greedy LPT over measured suite durations (weights below, seconds,
// from a -oD run at r17 head; unknown suites default to 5) and each
// group forks its OWN JVM: suites never share a SparkSession across
// groups, so no session-conf races are introduced — within a group,
// execution stays sequential as before.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  // each group JVM must size its GC/JIT/common pools for its share
  // of the box, not for all 32 cores: without the cap, 8 concurrent
  // JVMs ran 145 min of SYSTEM CPU in an 18 min wall (thread-pool
  // thrash), slower than the sequential run they replace
  val forkOpts = ForkOptions().withRunJVMOptions(
    (Test / javaOptions).value.toVector :+ "-XX:ActiveProcessorCount=6")
  val weights = Map(
    "QueriesSmokeSpec" -> 45, "QueriesSmokeSpecB" -> 40,
    "QueriesSmokeSpecC" -> 40, "QueriesSmokeSpecD" -> 40,
    "OracleFuzzSpec" -> 64, "LouvainSpec" -> 59, "GraphOpsSpec" -> 51,
    "PipelineEndToEndSpec" -> 43, "OracleFuzz5Spec" -> 36,
    "DatasetIoIvfSpec" -> 24, "RetrievalOpsSpec" -> 22,
    "StreamingMultimodalSpec" -> 21, "OracleFuzz4Spec" -> 13,
    "HitsSpec" -> 12, "SourcesSpec" -> 11, "OracleFuzz2Spec" -> 11,
    "EntityResolutionStreamSpec" -> 11, "DedupKnnTextSpec" -> 10,
    "OracleFuzz3Spec" -> 10, "LayoutOpsSpec" -> 9, "PlanQualitySpec" -> 9,
    "OracleFuzz6Spec" -> 8, "IvfRecallRefitSpec" -> 8, "OracleFuzz9Spec" -> 8,
    "MixSpec" -> 7, "BandIndexSpec" -> 7, "StreamingMinhashStateSpec" -> 6,
    "ApiAsofExtensionsSpec" -> 6)
  def w(fqcn: String): Int = weights.getOrElse(fqcn.split('.').last, 5)
  val n = 8
  val buckets = Vector.fill(n)(scala.collection.mutable.ArrayBuffer.empty[TestDefinition])
  val load = scala.collection.mutable.ArrayBuffer.fill(n)(0)
  tests.sortBy(t => (-w(t.name), t.name)).foreach { t =>
    val i = load.indexOf(load.min)
    buckets(i) += t
    load(i) += w(t.name)
  }
  buckets.zipWithIndex.map { case (ts, i) =>
    Tests.Group(s"g$i", ts.toVector, Tests.SubProcess(forkOpts))
  }
}
// default is ForkedTestGroup=1 (groups would still run one at a time)
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(java.lang.Runtime.getRuntime.availableProcessors(), 8)),
  Tags.limit(Tags.ForkedTestGroup, 8))
