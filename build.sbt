ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectorstorespark"
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
// ExtensionsSpec calls SparkSession.clearActiveSession/clearDefaultSession to
// build its extensions-bearing session; with the default single forked test
// JVM, sbt schedules suites in parallel and a sibling suite whose in-flight
// plan resolves its session through the cleared JVM-wide default dies with
// "SparkPlan.session() is null" (the r12 gate failure — a coin-flip race, not
// a code bug). Isolate that one suite into its OWN forked JVM; every other
// suite keeps the shared-JVM parallel schedule.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withOutputStrategy((Test / outputStrategy).value)
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withWorkingDirectory(Option((Test / baseDirectory).value))
    .withEnvVars(sys.env.toMap)
  val (ext, rest) = tests.partition(_.name == "graft.ExtensionsSpec")
  Seq(
    Tests.Group("graft.ExtensionsSpec", ext, Tests.SubProcess(forkOpts)),
    Tests.Group("rest", rest, Tests.SubProcess(forkOpts)),
  ).filter(_.tests.nonEmpty)
}
// Raw stdout passthrough for the forked run: the driver's bench recorder
// parses Bench's single JSON line from stdout, and sbt's default
// LoggedOutput strategy prefixes every line with "[info] ", which breaks
// that parse (BENCH_r1..r6 all recorded "parsed": null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 8g caused old-gen GC thrash ~35 queries into a local[32] bench run
  // (lww_live 25s vs 1.5s; whole run 75s vs 42s) — the single-JVM local
  // mode holds driver + all executor state in one heap, so size it for
  // both. Default adapts to physical RAM (half of it, clamped to [8g, 24g])
  // so a smaller dev machine degrades to GC pressure instead of OS
  // swap/OOM-kill. Override with SPARK_DRIVER_MEM.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", defaultHeap)}",
) ++
  // dev aid: extra forked-JVM flags (e.g. -Dspark.eventLog.enabled=true for
  // stage-level profiling, or a spark conf A/B) without editing the build —
  // space-separated in SPARK_GRAFT_EXTRA_JAVA_OPTS
  // filter(_.nonEmpty): a set-but-blank env var would otherwise pass a
  // single empty-string argument, which the java launcher reads as the
  // main class and fails to launch (ADVICE r12)
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
    .map(_.trim.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Nil)

def defaultHeap: String = {
  val physGb =
    try {
      val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    (os.getTotalMemorySize / (1L << 30)).toInt
    } catch { case _: Throwable => 32 }
  s"${math.max(8, math.min(24, physGb / 2))}g"
}
