ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gokaspark"
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
// The forked run JVM's output normally goes through sbt's logger,
// which decorates every line with `[info] ` — breaking the driver
// contract's "one bare JSON stdout line" (BENCH_r17/r18 recorded
// `parsed: null` on rc-0 runs because the summary arrived as
// `[info] {...}`). Inherit sbt's own stdout/stderr instead: run
// output (Bench's summary lines, Verify's progress) arrives exactly
// as printed.
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
  // Shuffle spill, streaming checkpoints and fixture staging are all
  // ephemeral here; tmpfs keeps them off the VM's block device, whose
  // fsync latency is erratic (measured 3-16 s for 512 MB) and was
  // dominating streaming micro-batch times. A real deployment puts
  // these on fast local disks; object-store checkpoints for dura-
  // bility are a cluster concern, not a local[32] one.
  "-Djava.io.tmpdir=/dev/shm",
  "-Dspark.local.dir=/dev/shm",
  // Single-JVM local[32] with 128 GiB on the box: 8g starved the
  // 86-query Bench/Verify mains near the end of a run (accumulated
  // localCheckpoint blocks + RocksDB state + broadcasts -> GC thrash;
  // the lexically-last query paid up to 20x). 28g leaves ample head-
  // room for the driver-side tooling while staying far under the box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "28g")}",
)
