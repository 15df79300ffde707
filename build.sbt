ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "parallelmapreducewordcounterforonemachinespark"
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
// Forked-run output passes straight through to this process's
// stdout/stderr instead of being re-logged with [info]/[error]
// prefixes: the bench/verify harness tail-parses stdout for the one
// JSON summary line, and a prefixed line never parses (every round
// through r13 recorded parsed:null). StdoutOutput makes the JSON line
// a bare line; showSuccess drops sbt's trailing "[success] Total
// time" so nothing sbt-side prints after it.
outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// the forked-run machinery reads outputStrategy through a delegate
// chain the lint cannot see (the bare bench output above proves it
// binds) — exclude it from the unused-key lint
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
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
// Harness scratch on tmpfs when the box has one (r15 optimization
// round): java.io.tmpdir is where EVERY harness intermediate lands —
// Spark's local dirs (shuffle files; spark.local.dir defaults to
// java.io.tmpdir), streaming temp checkpoints, the drains' replay
// directories, and the stored-index tables (Files.createTempDirectory
// in DedupIndexStore/AnnIndexStore). On this sandbox /tmp is ext4 on
// virtio while /dev/shm is a 126 GiB tmpfs; a 4-leg paired A/B over
// the 10 most write-heavy queries read 0.89x (per-query min-of-legs)
// with visibly lower variance on tmpfs (OPTIMIZATION_r15.md). The
// production analog is fast local NVMe scratch — the medium changes,
// the plans and bytes written do not (nothing is skipped or cached
// across runs; the exit sweeps still run). SPARK_GRAFT_TMPDIR
// overrides; boxes without a writable /dev/shm keep the JVM default.
val graftTmpDir: Option[String] = {
  val chosen =
    sys.env.get("SPARK_GRAFT_TMPDIR").filter(_.nonEmpty).orElse {
      val shm = new java.io.File("/dev/shm")
      if (shm.isDirectory && shm.canWrite) Some("/dev/shm/graft-tmp")
      else None
    }
  chosen.foreach(d => // the forked JVM needs the dir to pre-exist
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(d)))
  chosen
}
javaOptions ++= graftTmpDir.map(d => s"-Djava.io.tmpdir=$d").toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 8g, measured twice over (r14): the r13 move to 24g was meant to
  // spare the drained-stream tail the accumulated-heap GC debt of
  // 200+ earlier queries, but a paired full-bench A/B on a quiet box
  // reads 233.5 s (8g) vs 234.9 s (24g) over the identical 244
  // queries — the debt theory was the degraded r13 host, not the
  // heap. Meanwhile the big LAZY heap actively hurts short jobs on
  // virtualized hosts: G1 keeps expanding into uncommitted pages and
  // every fresh region is a first-touch fault taken in parallel by
  // all 32 executor threads — the 700 MB WordCountApp reads 25-31 s
  // at -Xmx24g vs 7.5-9.6 s at -Xmx8g (same binary, same box), and
  // pinning -Xms24g with -XX:+AlwaysPreTouch moves the cost to
  // startup at 43 CPU-MINUTES of sys time (parallel page-zeroing
  // contention; single-threaded zeroing on this VM is ~1.6 GB/s).
  // Commit only what the workload needs; SPARK_DRIVER_MEM always
  // wins for boxes/workloads that differ (PERF.md §"Driver heap").
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // The full 146-query bench compiles thousands of Janino/whole-stage
  // classes in one JVM; the JDK default 240 MB code cache fills mid-run
  // and the JIT shuts off, slowing the CPU-bound tail queries ~5x
  // (round-6 bench regression). 512 MB kept compilation on through
  // ~230 queries; 1g gives the 238-query run the same headroom.
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JVM").map(_.split(" ").toSeq)
  .getOrElse(Nil)
