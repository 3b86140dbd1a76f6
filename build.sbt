ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flumespark"
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
// The round driver parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as JSON. Two pieces of sbt decoration defeat that: the `[info] ` prefix on
// logged subprocess output, and the `[success] Total time: ...` epilogue.
// StdoutOutput sends the forked JVM's stdout through undecorated, and
// showSuccess kills the epilogue, so Bench's compact summary line is the
// literal last line.
run / outputStrategy := Some(StdoutOutput)
Compile / run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
// Heap is PINNED, not inherited: the round driver's environment exports
// SPARK_DRIVER_MEM (observed 89 GiB), which floated maxHeapGb between
// rounds and made bench numbers incomparable. 32g is generous for sf0.1
// on local[32] and identical everywhere. GRAFT_HEAP is a deliberate
// escape hatch the driver does not set.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("GRAFT_HEAP", "32g")}",
)

Test / parallelExecution := false
