package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned JDBC ingestion. The reference hand-builds pagination —
  * COUNT(*) then LIMIT/OFFSET pages fanned out over flow runs
  * (vitai_db/tasks.py:100-179, smsrio_mysql/tasks.py:16-52) — which Spark's
  * native partitioned JDBC source subsumes: `partitionColumn` +
  * lowerBound/upperBound/numPartitions issues one range query per task,
  * with predicate pushdown for the incremental window. LIMIT/OFFSET paging
  * is strictly worse at scale (O(n²) server-side skips, unstable without a
  * total order); range partitioning is the correct translation.
  */
object JdbcReader {

  final case class TableScan(
      url: String,
      table: String,                       // schema-qualified table or (subquery) alias
      partitionColumn: Option[String] = None,
      numPartitions: Int = 32,
      fetchSize: Int = 10000,              // the reference's page size, as wire batch
      properties: Map[String, String] = Map.empty)

  /** Full or incremental scan; `window` pushes `ref BETWEEN start AND end`
    * into the source as a dbtable subquery (the reference's historical_mode
    * predicate, relational_db/tasks.py:24-27).
    */
  def read(spark: SparkSession, scan: TableScan,
      window: Option[(String, String, String)] = None): DataFrame = {
    // bounds are data, not SQL: escape quotes so a crafted window value
    // can't break out of the literal
    def q(s: String) = s.replace("'", "''")
    val where = window match {
      case Some((refCol, start, end)) =>
        s" WHERE $refCol BETWEEN '${q(start)}' AND '${q(end)}'"
      case None => ""
    }
    val base =
      if (where.isEmpty) scan.table
      else s"(SELECT * FROM ${scan.table}$where) AS w"
    var reader = spark.read.format("jdbc")
      .option("url", scan.url)
      .option("dbtable", base)
      .option("fetchsize", scan.fetchSize.toString)
    scan.properties.foreach { case (k, v) => reader = reader.option(k, v) }
    scan.partitionColumn.foreach { pc =>
      // bounds probed with one min/max query over the SAME window, then
      // numPartitions range scans (the probe rebuilds the subquery itself —
      // `base` already carries an alias and cannot be re-aliased)
      val bounds = spark.read.format("jdbc")
        .option("url", scan.url)
        .option("dbtable", s"(SELECT MIN($pc) lo, MAX($pc) hi FROM ${scan.table}$where) AS b")
        .options(scan.properties)
        .load().collect().head
      if (!bounds.isNullAt(0)) {
        reader = reader
          .option("partitionColumn", pc)
          .option("lowerBound", bounds.get(0).toString)
          .option("upperBound", bounds.get(1).toString)
          .option("numPartitions", scan.numPartitions.toString)
      }
    }
    reader.load()
  }
}
