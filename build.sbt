ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ocrrecognitionspark"
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
// Forked `run` output goes STRAIGHT to stdout, not through sbt's logger:
// the logger prefixes every line with `[info] `, which made the bench
// driver's JSON-line parse fail (BENCH_r02 `parsed: null`). Applies to
// run/runMain child processes; the test framework reports via its own
// protocol and is unaffected.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
// Heap is CLAMPED to 16g no matter what SPARK_DRIVER_MEM asks for:
// Xms=Xmx + AlwaysPreTouch below commit the whole heap at startup, and the
// bench spawns pinned child JVMs that inherit these flags — an oversized
// request (observed: ~89g in the round-1 driver run) commits 2x the host's
// RAM across parent+child and gets the runner OOM-killed (exit 137).
val driverMem: String = {
  val req = sys.env.getOrElse("SPARK_DRIVER_MEM", "16g").trim.toLowerCase
  val gb: Double =
    try {
      if (req.endsWith("g")) req.dropRight(1).toDouble
      else if (req.endsWith("m")) req.dropRight(1).toDouble / 1024.0
      else req.toDouble / (1024.0 * 1024 * 1024)
    } catch {
      // unparseable (e.g. '1t', 'abc') must fall back to the DEFAULT, not
      // pass the raw request through to -Xmx
      case _: NumberFormatException => -1.0
    }
  if (gb > 16.0 || gb <= 0.0) "16g" else req
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx$driverMem",
  s"-Xms$driverMem",
  // stable young gen: G1's adaptive resizing oscillates badly when the
  // 32-thread kernel phases alternate with relational phases
  "-XX:+UnlockExperimentalVMOptions",
  "-XX:G1NewSizePercent=30",
  // first-touch page faults of a 16g heap are charged to task threads
  // mid-run; pre-touch at startup instead
  "-XX:+AlwaysPreTouch",
  // page planes are multi-MB int arrays; without this they are G1
  // "humongous" allocations (>= 50% of the default 4m region) and
  // progressively fragment the heap under 32-thread kernel load
  "-XX:G1HeapRegionSize=32m",
) ++ sys.env.get("GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(" ").toSeq)
