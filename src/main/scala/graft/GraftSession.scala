package graft

import org.apache.spark.sql.SparkSession

/** THE engine-level session policy, in one place — every entry point
  * (Bench, Verify, tests, and a library user's own driver) builds through
  * here so the measured decisions below apply uniformly instead of being
  * re-stated per main:
  *
  *  - `spark.sql.shuffle.partitions` = the session's core count for local
  *    runs (not Spark's 200 default — 200 tiny partitions on a laptop-
  *    class pool is pure scheduling overhead). On a real cluster the
  *    caller passes the executor-core total, and AQE coalescing owns the
  *    per-stage number from there.
  *  - AQE stays at Spark DEFAULTS for batch (BENCH_NOTES r11: advisory
  *    64 MiB but parallelism-first coalescing, A/B-measured strictly
  *    better here — forcing parallelismFirst=false coalesced
  *    compute-dense shuffles onto too few cores, q101 at sf1 11.1 s vs
  *    6.3 s). Streaming state-store counts, which AQE cannot resize,
  *    come from [[streaming.Incremental.withStreamPolicy]].
  *  - `spark.sql.artifact.isolation.enabled` = false: session-artifact
  *    classloader isolation routes every Janino codegen class-name MISS
  *    through an RPC file download that can stall a 0.6 s query for
  *    minutes (observed; see Bench.scala history). These processes never
  *    add session artifacts, so isolation buys nothing.
  *  - UI off for headless runs.
  *
  * `timeZone = Some("UTC")` pins the session zone (Verify does, so oracle
  * comparisons are zone-stable); `None` leaves the JVM default — Bench
  * measures whatever the deployment would run.
  */
object GraftSession {

  def local(cpus: Int, timeZone: Option[String] = None,
      appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      // Output-commit machinery (r17): every lake/state write in this
      // engine lands under a per-version `_data/vN` directory that only
      // becomes VISIBLE via the VersionedLake manifest CAS — the
      // FileOutputCommitter's own job-commit atomicity is redundant
      // here, so take the cheaper v2 protocol (task commits rename
      // straight to the destination instead of a second sequential
      // driver-side rename pass at job commit) and skip the _SUCCESS
      // marker file (one create+close per write; nothing reads it —
      // manifest presence IS completeness). Matters because the
      // streaming/arrival flows commit several small tables per
      // micro-batch: the fixed per-write commit cost is the
      // lifecycle-floor term the sf0.001 probes measure.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
    timeZone.foreach(tz => b.config("spark.sql.session.timeZone", tz))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** The driver-contract entry: core count from `SPARK_GRAFT_CPUS`. */
  def fromEnv(timeZone: Option[String] = None,
      appName: String = "graft"): SparkSession =
    local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt, timeZone, appName)
}
