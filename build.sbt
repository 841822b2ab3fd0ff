ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "aspepetlspark"
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
  // 16g default: the box has 128 GiB and local[32] runs 32 concurrent
  // tasks in ONE JVM — at 8g the sf1 pair/register aggregations
  // (basket_pairs' ~18M near-unique pair keys) spill and GC-thrash,
  // which measured as 11-74 s run-to-run variance on an unchanged
  // plan. Heap is the bench variance knob, not the plan.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+UseParallelGC",
  // 190 registered queries x 2 scales each compile distinct generated
  // classes; at the default 240m the JIT code cache can fill late in a
  // full bench run, silently disabling compilation so late-position
  // queries measure 3-5x their plan cost with BOTH min-of-2 runs slow
  // (the r7 importance_resample/repetition_filter driver-bench
  // signature: no code change, position-dependent, unreproducible in
  // a short JVM). 512m keeps the whole registry compiled.
  "-XX:ReservedCodeCacheSize=512m",
)
