ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "datafusionmonoidspark"
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
// Suites share ONE SparkContext (TestSpark singleton), and its cache
// manager is global JVM state: PlanSpec/CachingSpec call clearCache and
// assert on getPersistentRDDs, so two suites interleaving can unpersist
// each other's entries mid-assertion (observed as a rare CachingSpec
// flake under machine load). Suite-serial execution makes the cache
// state deterministic; tests within a suite were already sequential.
Test / parallelExecution := false
// Forked run output goes straight to sbt's stdout WITHOUT the "[info] "
// logger prefix. The driver parses Bench's one-line {"metric":...} JSON
// from the process output; with the default LoggedOutput strategy every
// line arrives as "[info] {...}" and the parse fails (BENCH_r01/r02
// recorded parsed:null with the full line visible in the tail).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))

// Dev/diagnostic mains (Scratch, ExplainAll) live under tools/, OUT of the
// library source tree, but still compile on the Compile classpath so
// `runMain graft.Scratch ...` keeps working for single-query iteration.
Compile / unmanagedSourceDirectories += baseDirectory.value / "tools" / "scala"
