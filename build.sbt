ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "change_data_capturespark"
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
// The round driver parses the LAST 2000 chars of `sbt runMain` stdout for
// graft.Bench's one-line JSON. sbt's default LoggedOutput strategy prefixes
// every forked-process line with "[info] ", which is why BENCH_r01..r04 all
// recorded `parsed: null` even once the line fit the window. StdoutOutput
// pipes the forked JVM's stdout/stderr through verbatim — the JSON line
// reaches the driver bare.
run / connectInput := false
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
  // 24g default (box has 128g): at 8g the ~1000 gate executions of a
  // full Bench session (two warm passes + timed best-of-2) aged the
  // heap enough that LATE-timed gates read 1.5-2x their isolation
  // steady state — measured round 10, q86 control 1.21s vs timed 2.0s
  // in one session. More headroom keeps the timed section honest.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
