// External-consumer smoke: a MINIMAL sbt project that depends on the
// PACKAGED graft jar (copied into lib/graft.jar by
// tools/consumer_smoke.sh) plus the stock Spark distribution — the
// library driven as a black box from outside its own build, the way a
// real adopter would. No source-level dependency on the repo.
scalaVersion := "2.13.17"
name := "graft-consumer-smoke"
// Spark 4.1.2 jars ship with the image (zero-egress):
unmanagedBase := file("/opt/spark/jars")
Compile / unmanagedJars += Attributed.blank(
  baseDirectory.value / "lib" / "graft.jar")
run / fork := true
// same JDK17 module opens every out-of-spark-submit SparkSession needs
javaOptions ++= Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED")) ++ Seq(
  "-Xmx4g", "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC")
