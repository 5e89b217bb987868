package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // same engine-level AQE partition policy as Bench (see BENCH_NOTES
      // r11: AQE defaults for batch, measured better than
      // parallelismFirst=false on compute-dense stages; streaming state
      // partitions from Incremental.statePartitions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // see Bench.scala: codegen class-name misses must not hit the
      // artifact-isolation RPC classloader (minutes-long stalls)
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // written FIRST: if a later query kills the JVM, the completed dumps
    // can still be oracle-checked instead of zeroing the whole round
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    var failed = 0
    // optional comma-separated filter (same contract as Bench) for fast
    // single-query iteration against tools/check_oracle.py
    val only = sys.env.get("SPARK_GRAFT_QUERIES").map(_.split(",").toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      System.gc() // see Bench.scala — expunge stale ThreadLocals between queries
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += 1
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    System.err.println(
      s"[verify] ${SparkEntry.queries.size - failed}/${SparkEntry.queries.size} queries dumped to $outDir")
    spark.stop()
  }
}
