ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "highspeedrailwaybigdatasystemspark"
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
  // Default heap 24g (round-16, was 8g): local[32] runs driver AND all
  // 32 executor threads in THIS one JVM, so the suite's allocation rate
  // is 32 cores' worth against one heap — at 8g the 175-query bench was
  // GC-bound (same-host A/B at quiet calibration: warm 44.6 -> 38.5 s,
  // cold 135.5 -> 115.3 s) and the ~4.6 GiB storage pool evicted cache
  // blocks mid-build (q_dedup_cluster cold read 17.6 s on an eviction
  // storm vs 3.1 s with headroom). Still env-parameterised: scale
  // rehearsals and spill checks pass their own SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
// Belt for deep-plan task serialization in tests: plan-tree recursion
// during ObjectOutputStream writes scales with plan depth, and the
// default 1 MiB stack sits at the edge for iterate-in-a-loop specs.
// The real fix is lineage truncation in the tests themselves; this
// keeps ambient-JVM-state variance from flipping a green suite.
Test / javaOptions += "-Xss4m"
