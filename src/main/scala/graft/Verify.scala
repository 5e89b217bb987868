package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    // session policy lives in ONE place (GraftSession scaladoc); UTC
    // pinned so oracle comparisons are zone-stable
    val spark = GraftSession.fromEnv(timeZone = Some("UTC"),
      appName = "graft-verify")
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
