ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "interpro7dwspark"
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
  // 24g default: the full 108-query bench session accumulates cached
  // frames + loop checkpoints; at 8g the tail of the run degrades into
  // GC bursts that add 3-4x noise to unrelated two-operator queries
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 150+ codegen'd queries overflow the 240m default JIT code cache,
  // after which late queries run interpreted (10-20x) — same flags as
  // tools/run.sh
  "-XX:ReservedCodeCacheSize=512m", "-XX:+UseCodeCacheFlushing",
) ++
  // propagate opt-in gate properties into the FORKED test JVM:
  // `sbt -Dgraft.oracle.sf1=true testOnly ...` otherwise sets the
  // property only in the sbt JVM and the suite silently cancels —
  // a gate that reports "canceled" while looking invoked
  sys.props.get("graft.oracle.sf1").map(v => s"-Dgraft.oracle.sf1=$v").toSeq
