package graft

/** Same-JVM A/B for a hadoopConf (or sql conf) toggle: runs the query
  * alternating A/B iterations so host drift hits both sides equally.
  *
  *   sbt "Test/runMain graft.ABConf q116_stream_dedup hadoop:KEY V_A V_B [iters]"
  */
object ABConf {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val key = args(1)
    val va = args(2)
    val vb = args(3)
    val iters = if (args.length > 4) args(4).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, appName = "ab")
    val fn = SparkEntry.queries(name)
    def set(v: String): Unit =
      if (key.startsWith("hadoop:"))
        spark.sparkContext.hadoopConfiguration.set(key.stripPrefix("hadoop:"), v)
      else spark.conf.set(key, v)
    fn(spark, sfDir).count() // warmup
    val as = scala.collection.mutable.ListBuffer.empty[Double]
    val bs = scala.collection.mutable.ListBuffer.empty[Double]
    (1 to iters).foreach { i =>
      for ((v, buf) <- Seq((va, as), (vb, bs))) {
        set(v)
        System.gc()
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        buf += (System.nanoTime() - t0) / 1e9
      }
    }
    System.err.println(f"[ab] $name $key A=$va%s: min=${as.min}%7.3f  all=${as.map(x => f"$x%.2f").mkString(",")}")
    System.err.println(f"[ab] $name $key B=$vb%s: min=${bs.min}%7.3f  all=${bs.map(x => f"$x%.2f").mkString(",")}")
    spark.stop()
  }
}
