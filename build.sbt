ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "technicaltestdataengineerspark"
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
  // 24g default (optimization round 21): local[$SPARK_GRAFT_CPUS] runs
  // up to 32 task slots inside this ONE JVM — 8g was executor-sized
  // for 4-8 cores and G1 collected constantly under 32 concurrent
  // allocation-heavy tasks (dedup_ngram_jaccard: stage executorRunTime
  // 5x its cpuTime at 8g; the key measured 5.7s at 8g vs 3.5s at 24g,
  // dedup_minhash 2.0s vs 1.0s, same tree, same host). Pro-rata for
  // the 128 GiB sandbox and still right at lower $SPARK_GRAFT_CPUS;
  // SPARK_DRIVER_MEM stays the override for smaller hosts.
  // (-XX:+UseParallelGC was measured WORSE than default G1 here:
  // 5.2-9.1s on the same key/heap — keep G1.)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
) ++ sys.env.get("SPARK_JVM_EXTRA").toSeq.flatMap(_.split("\\s+").filter(_.nonEmpty))
