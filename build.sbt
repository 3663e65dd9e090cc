ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dlticebergspark"
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
// The driver parses Bench's stdout as JSON. Two sbt behaviors break that:
// the logger prefixes forked-process lines with "[info] ", and batch mode
// appends "[success] Total time: ..." AFTER the JSON line (every
// BENCH_r1..r7 artifact shows parsed:null because of it). Pass the child's
// streams through verbatim and drop the success banner so the bench JSON
// is the last line of stdout.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by sbt's command engine, not a task — exclude it
// from the unused-key lint
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
// The spec tier stages its ANN oracle intermediates in its own directory
// so a concurrent `sbt test` can never clobber a Verify/Bench run's
// staged set under the default /tmp/graft-oracle-stage (the oracle SQL
// embeds the path read at JVM start, so each JVM stays self-consistent).
Test / javaOptions += "-Dgraft.oracle.stage.dir=/tmp/graft-oracle-stage-test"
