package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Profiling harness (test scope, never shipped): run one query with a
  * job listener, print every Spark job's wall clock + description so the
  * per-batch lifecycle cost decomposes into named jobs.
  *
  *   sbt "Test/runMain graft.JobProfile q116_stream_dedup [sfDir] [iters]"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val iters = if (args.length > 2) args(2).toInt else 1
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, appName = "profile")
    val fn = SparkEntry.queries(name)

    @volatile var log = false
    val lastEnd = new java.util.concurrent.atomic.AtomicLong(0L)
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val site = js.stageInfos.lastOption.map(_.name).getOrElse("?")
        val gap = if (lastEnd.get() == 0) 0L else js.time - lastEnd.get()
        starts.put(js.jobId, (js.time, f"gap=${gap / 1000.0}%6.3f  $site"))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        lastEnd.set(je.time)
        if (log) {
          val (t0, desc) = starts.getOrDefault(je.jobId, (je.time, "?"))
          System.err.println(
            f"[job] ${je.jobId}%5d ${(je.time - t0) / 1000.0}%8.3f s  $desc")
        }
      }
    })

    fn(spark, sfDir).count() // warmup (codegen+JIT), untimed & unlogged
    (1 to iters).foreach { i =>
      System.gc()
      log = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      log = false
      System.err.println(f"[total] $name iter $i: $sec%8.3f s")
    }
    spark.stop()
  }
}
