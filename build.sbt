ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deeplakespark"
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
// Parallel forked test groups: the suite is ~30 min sequential on this
// host, dominated by a handful of heavy suites (ConcurrencySpec alone is
// ~570s), and the driver's post-round `sbt test` has a finite window —
// r16's VERIFY flagged tests_ok:false with zero failing tests in the
// tail, i.e. a timeout, not a failure. Each group runs in its OWN forked
// JVM (own SparkContext — no shared driver state across groups; the only
// cross-process shared state, the IndexStore artifact cache, takes an OS
// file lock around builds). Weights are measured per-suite seconds from
// target/test-reports; unknown/new suites default small. LPT bin-packing
// into 4 groups keeps every group under the heaviest single suite.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withOutputStrategy(outputStrategy.value)
  val weight: Map[String, Int] = Map(
    "graft.ConcurrencySpec" -> 570, "graft.IndexMaintenanceSpec" -> 265,
    "graft.AnnSpec" -> 175, "graft.QueryOutputSpec" -> 151,
    "graft.PlanSpec" -> 128, "graft.TqlSpec" -> 85, "graft.DedupSpec" -> 63,
    "graft.EventAnalyticsSpec" -> 59, "graft.SnapshotsSpec" -> 50,
    "graft.GraphsSpec" -> 50, "graft.StreamingAndMultimodalSpec" -> 40,
    "graft.AuditSpec" -> 34, "graft.PipelineSpec" -> 19,
    "graft.QualityRulesSpec" -> 15, "graft.IncrementalAggSpec" -> 9)
  val nGroups = 4
  val bins = Array.fill(nGroups)(0L)
  val assign = Array.fill(nGroups)(List.empty[TestDefinition])
  tests.sortBy(t => -weight.getOrElse(t.name, 5)).foreach { t =>
    val i = bins.indices.minBy(bins(_))
    bins(i) += weight.getOrElse(t.name, 5)
    assign(i) = t :: assign(i)
  }
  assign.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    Tests.Group(s"g$i", ts, Tests.SubProcess(opts))
  }
}
// allow the forked groups to actually run concurrently
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 4), Tags.limitAll(8))
// Forked run output defaults to LoggedOutput, which prefixes every stdout
// line with "[info] " — that breaks machine parsing of Bench's JSON line.
// StdoutOutput passes the child's stdout/stderr through verbatim.
outputStrategy := Some(StdoutOutput)
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
) ++ {
  // shuffle/spill to tmpfs: this host's OS disk has ~100x the small-file
  // latency of memory (warm 100k-row groupBy: 10s on /tmp vs 0.55s on
  // /dev/shm). On a real cluster spark.local.dir is instance-local NVMe;
  // this is the single-node analog. See graft.core.FastLocalDir.
  val shm = new java.io.File("/dev/shm")
  if (shm.isDirectory && shm.canWrite) Seq("-Dspark.local.dir=/dev/shm/graft-spark-local")
  else Seq.empty
}
