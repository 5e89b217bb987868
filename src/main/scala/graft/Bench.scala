package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/file-listing cold start otherwise lands
    // entirely on whichever query runs first (standard bench practice; every
    // timed query below still executes in full)
    try {
      val warm = graft.sources.Lake.table(spark, sfDir, "lineitem")
      warm.groupBy("l_returnflag").count().count()
    } catch { case _: Throwable => () }
    // optional comma-separated filter for profiling single queries
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    // A failed query must not masquerade as a fast one: report its timing as
    // -1 and list it under "failed" so regressions are visible in the JSON.
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
          failed += name; false
        }
      val dt = (System.nanoTime() - t0) / 1e9
      val reported = if (ok) dt else -1.0
      System.err.println(f"[bench] $name%-22s $reported%8.2f s")
      name -> reported
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
