ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prlibspark"
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
// pass the forked JVM's stdout through UNWRAPPED (no "[info] " prefix):
// the bench/verify drivers parse a raw JSON line from stdout
run / outputStrategy := Some(StdoutOutput)
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
  // Xms pinned to Xmx: without it the collector thrashes to avoid growing
  // the heap and GC dominates wall time at high task concurrency
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  s"-XX:+${sys.env.getOrElse("GRAFT_GC", "UseG1GC")}",
) ++ (
  // commit the whole heap at startup: lazy heap-page commit across several
  // concurrent JVMs is a measured 6-40x CPU storm on this VM (fault/TLB-
  // shootdown pileup; see BENCH/BASELINE.md round-5 cluster diagnosis).
  // Pre-touch makes -Xms a HARD physical-RAM requirement, so machines with
  // less RAM than SPARK_DRIVER_MEM can opt out with GRAFT_NO_PRETOUCH=1.
  if (sys.env.contains("GRAFT_NO_PRETOUCH")) Seq.empty
  else Seq("-XX:+AlwaysPreTouch")
) ++ sys.env.getOrElse("GRAFT_JVM_EXTRA", "").split(" ").filter(_.nonEmpty)
