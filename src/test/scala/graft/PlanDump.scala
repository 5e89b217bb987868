package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Scratch tool: dump a query's finalized physical plan to a file.
  * Usage: sbt "Test/runMain graft.PlanDump <queryName> <sfDir> <outFile>"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, out) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.artifact.isolation.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = Queries.queries(name)(spark, sfDir)
    df.count()
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    java.nio.file.Files.write(java.nio.file.Paths.get(out), p.getBytes)
    println(s"[plandump] $name -> $out (${p.length} chars)")
    spark.stop()
  }
}
