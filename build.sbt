ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aeon_mechaspark"
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
// Driver-contract fix (optimization r13, VERDICT r12 #2): the bench/verify
// mains print machine-read JSON lines, but sbt's default LoggedOutput
// strategy prefixes every forked-process line with "[info] " — the driver's
// parser has returned `parsed: null` for 12 straight rounds even when the
// full JSON line sat inside its capture window (BENCH_r01). StdoutOutput
// passes the child's stdout through verbatim; showSuccess drops the
// trailing "[success] Total time" line so the final stdout line IS the
// bench's JSON object.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Spark's SQL lower() slow path (non-ASCII input) lowercases under the
  // JVM default locale; pin it so e.g. a tr/az host locale cannot
  // desynchronize SQL normalizeForDedup from its Locale.ROOT JVM twin.
  "-Duser.language=en", "-Duser.country=US",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_LOCAL_DIR").map(d => s"-Dspark.local.dir=$d").toSeq ++ sys.env.get("SPARK_GRAFT_TMPDIR").map(d => s"-Djava.io.tmpdir=$d").toSeq
