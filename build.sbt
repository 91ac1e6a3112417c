ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pretalxhubetlspark"
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
  // 16g default: a 168-query suite in ONE JVM accumulates old-gen pressure
  // (broadcast remnants, codegen classloaders, shuffle bookkeeping) that an
  // 8g heap turns into GC churn taxing LATE queries — the r8 bench showed
  // +15% on an unchanged query slice purely from suite growth.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // JIT code cache: 168 queries x dozens of whole-stage-codegen classes
  // overflow the 240m JDK17 default; when it fills, the JIT silently stops
  // compiling and every later query runs interpreted-slow.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // extra JVM flags for A/B experiments (e.g. JIT tiering/compiler-thread
  // knobs) without editing the build: space-separated in SPARK_GRAFT_JVM
  sys.env.get("SPARK_GRAFT_JVM").map(_.trim).filter(_.nonEmpty)
    .map(_.split("\\s+").toSeq).getOrElse(Seq.empty)
