ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cptdatabasesyncspark"
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
// Pass forked-run stdout through RAW (no "[info] " decoration) so the
// driver can json-parse graft.Bench's single JSON output line, and drop
// sbt's trailing "[success] Total time" line for the same reason.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
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
  // local[32] with 32 shuffle partitions needs headroom: an 8g heap made
  // the full 45-query bench GC-bound (cube/outer-join outliers 3-10x
  // slower). The box has 128 GiB; 48g keeps every query CPU-bound.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 85 queries × whole-stage codegen ≈ thousands of generated classes in
  // one JVM; the default 240 MB JIT code cache fills mid-bench, C2 stops
  // compiling, and later iterative queries (d8's label-propagation loop)
  // run interpreted at 5-10x — measured as d8 3.5 s isolated vs 25-33 s
  // benched-after-84-queries. A driver hosting many codegen-heavy plans
  // needs code-cache headroom just like heap headroom.
  "-XX:ReservedCodeCacheSize=1g",
)
