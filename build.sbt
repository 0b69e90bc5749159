ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "oc_metaspark"
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
// r19 (VERDICT r18 #2: the driver's `sbt test` timed out): with plain
// `Test / fork := true` sbt runs every suite SEQUENTIALLY in one forked
// JVM at local[4] — 28 of the sandbox's 32 cores idle for the whole run.
// One forked JVM per suite, up to (cores/4) groups in flight, keeps each
// suite's local[4] session untouched while the suites themselves overlap.
// Safe: no suite uses a catalog/metastore, fixed temp paths, or ports
// (all temp dirs via Files.createTempDirectory, spark.ui disabled).
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  (Test / definedTests).value.map { t =>
    Tests.Group(t.name, Seq(t),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  }
}
// sbt's default restrictions pin ForkedTestGroup to 1 (that alone forces
// the sequential run); keep the default all-tasks bound, raise the group cap.
Global / concurrentRestrictions := Seq(
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors),
  Tags.limit(Tags.ForkedTestGroup,
    math.max(2, java.lang.Runtime.getRuntime.availableProcessors / 4)))
// The driver's bench capture parses the process's FINAL stdout line as
// JSON. Under sbt's default LoggedOutput every forked-run line arrives
// "[info] "-prefixed and sbt appends a "[success] Total time" epilogue —
// both defeat the parser (BENCH_r10..r16 all show parsed:null). Route the
// forked JVM's stdout straight through and drop the epilogue so
// `sbt "runMain graft.Bench"` ends with Bench's own compact contract line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command layer, not a task — lint
// can't see that (verified: the [success] epilogue is gone from runMain)
Global / excludeLintKeys += showSuccess
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
