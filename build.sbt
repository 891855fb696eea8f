ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tableone_pysparkspark"
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
// No "[success] Total time: …" footer, and the forked JVM writes RAW
// to stdout (no "[info] " logger prefix): the bench driver
// machine-parses the LAST stdout line of `sbt "runMain graft.Bench"`
// as the result JSON, and both sbt decorations otherwise break that
// parse (every prior round's official record carried parsed:null).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
run / outputStrategy := Some(StdoutOutput)
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
  // local[32] runs driver+executor in one JVM: 32 concurrent tasks'
  // shuffle/aggregation state plus in-call caches need real headroom, or
  // long benches degrade into GC thrash (t1 drifted 3.6 -> 5.1 s across
  // consecutive full runs at 8g; stable at 24g on the 128 GiB box).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Pin the heap: Bench drains the JVM (explicit GC) between queries so
  // ContextCleaner actually releases shuffle/broadcast state, and an
  // unpinned heap then uncommits pages on every full GC — the next
  // query's scan re-faults gigabytes and measures the page faults, not
  // the query (a2 at 100x scale: 4.5 s unpinned vs 0.9 s pinned).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
  // The 240 MB default JIT code cache thrashes after ~50 queries of
  // whole-stage codegen: compiled query code is evicted and
  // late-alphabet queries run deoptimized (full-suite sf0.1: t1 9.2 s /
  // t9 11.9 s under the default vs 2.9 s / 1.9 s at 1g — and the total
  // dropped 52 s -> 34.5 s). Explains prior rounds' full-run-only
  // inflation (e.g. x3 at 102 s full vs 1.25 s isolated in round 3).
  // Round 10's 136-query sweep re-hit the same class at 1g (x9 17.9 s
  // in-sweep vs 4.3 s isolated at sf10) — 2g plus the wider Spark
  // codegen class cache (Bench.scala) restores headroom; reservation
  // is address space, committed only as used.
  "-XX:ReservedCodeCacheSize=2g",
)
