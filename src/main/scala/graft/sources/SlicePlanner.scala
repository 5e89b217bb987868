package graft.sources

/** Slice planning for sources that must be extracted in bounded ranges —
  * the common core of the Mongo sliced scan (min/max of the slice variable →
  * N inclusive ranges, minhasaude_mongodb/tasks.py:161-256), the Metabase
  * MBQL slicer (min/max via MBQL aggregation then filtered slices,
  * ser_metabase/tasks.py:39-217), and the keyset/LIMIT-OFFSET batchers
  * (vitai_db, smsrio_mysql).
  *
  * In Spark these feed `JdbcReader`'s partitioned read directly
  * (lowerBound/upperBound/numPartitions) or parameterize per-slice source
  * queries when the source enforces its own pagination. Pure functions —
  * the planner has no Spark dependency.
  */
object SlicePlanner {

  /** Split the inclusive [min, max] id space into `n` contiguous inclusive
    * ranges covering every value exactly once. Mirrors Spark's JDBC stride
    * logic: ranges differ by at most one unit in width.
    */
  def longRanges(min: Long, max: Long, n: Int): Seq[(Long, Long)] = {
    require(n > 0, "need at least one slice")
    require(min <= max, s"min $min > max $max")
    val span = BigInt(max) - BigInt(min) + 1
    val slices = math.min(n.toLong, span.toLong max 1L).toInt
    val base = span / slices
    val extra = (span % slices).toLong
    val bounds = Iterator.iterate((BigInt(min), 0)) { case (lo, i) =>
      (lo + base + (if (i < extra) 1 else 0), i + 1)
    }.take(slices + 1).map(_._1).toSeq
    bounds.sliding(2).map(b => (b.head.toLong, (b(1) - 1).toLong)).toSeq
  }

  /** Page count for a LIMIT/OFFSET-style batcher (reference batch planners
    * do COUNT(*) then ceil-divide).
    */
  def pageCount(totalRows: Long, pageSize: Int): Long = {
    require(pageSize > 0, "pageSize must be positive")
    (totalRows + pageSize - 1) / pageSize
  }

  /** Truncation guard: sources with a hard per-query cap (Metabase 1M rows)
    * must fail loudly when a slice hits the cap — silent truncation is data
    * loss (reference: ser_metabase/tasks.py:211-213).
    */
  def assertNotTruncated(rowsReturned: Long, cap: Long): Unit =
    require(rowsReturned < cap,
      s"slice returned $rowsReturned rows at the source cap $cap — result truncated; re-slice smaller")
}
