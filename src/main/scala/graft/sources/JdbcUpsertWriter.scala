package graft.sources

import java.sql.{Connection, SQLException}
import org.apache.spark.sql.DataFrame

/** Reverse-ETL batched upsert with retryable-error handling (reference:
  * migrate/bq_to_subpav/utils.py:35-121,204-249 — MySQL
  * INSERT…ON DUPLICATE KEY UPDATE in batches, retrying deadlock/timeout
  * classes with backoff, failing fast on constraint errors).
  *
  * Spark-first: the distributed part is `foreachPartition` — one connection
  * and one prepared statement per partition, executeBatch every `batchSize`
  * rows. The connection factory is injected (serializable) so tests can
  * drive the writer without a live database.
  */
object JdbcUpsertWriter {

  /** MySQL-dialect upsert: INSERT … ON DUPLICATE KEY UPDATE col=VALUES(col)
    * for every non-key column. Pure SQL generation — unit-testable.
    */
  def upsertSql(table: String, cols: Seq[String], keyCols: Seq[String]): String = {
    require(cols.nonEmpty, "no columns")
    val collist = cols.map(c => s"`$c`").mkString(", ")
    val placeholders = cols.map(_ => "?").mkString(", ")
    val updates = cols.filterNot(keyCols.contains)
      .map(c => s"`$c` = VALUES(`$c`)").mkString(", ")
    val updateClause = if (updates.isEmpty)
      s"`${keyCols.head}` = `${keyCols.head}`" // no-op update (all-key table)
    else updates
    s"INSERT INTO `$table` ($collist) VALUES ($placeholders) " +
      s"ON DUPLICATE KEY UPDATE $updateClause"
  }

  /** Retry classifier mirroring the reference's error classes: deadlocks,
    * lock-wait timeouts, and connection failures retry; constraint and
    * syntax errors fail fast.
    */
  def isRetryable(e: SQLException): Boolean = {
    val code = e.getErrorCode
    val msg = Option(e.getMessage).getOrElse("").toLowerCase
    code == 1213 || code == 1205 || // MySQL deadlock / lock wait timeout
      msg.contains("deadlock") || msg.contains("lock wait timeout") ||
      msg.contains("connection") && msg.contains("refused") ||
      msg.contains("communications link failure")
  }

  /** Run `body` with retry/backoff on retryable SQLExceptions. */
  def withRetries[T](maxRetries: Int, backoffMs: Long)(body: => T): T = {
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: SQLException if isRetryable(e) && attempt < maxRetries =>
          attempt += 1
          Thread.sleep(backoffMs * attempt)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Upsert every row of `df` into `table`. `connect` runs on executors —
    * it must construct its own connection (DriverManager/pool), never
    * capture one from the driver.
    */
  def write(df: DataFrame, table: String, keyCols: Seq[String],
      connect: () => Connection, batchSize: Int = 1000,
      maxRetries: Int = 3, backoffMs: Long = 1000): Unit = {
    val cols = df.columns.toSeq
    val sql = upsertSql(table, cols, keyCols)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val st = conn.prepareStatement(sql)
          // rows are buffered per batch and RE-ADDED inside the retry body:
          // executeBatch clears the statement's batch even on failure, so a
          // bare retry of executeBatch would commit an empty batch and
          // silently drop the rows
          val buffer = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
          def flush(): Unit = if (buffer.nonEmpty) {
            withRetries(maxRetries, backoffMs) {
              st.clearBatch()
              buffer.foreach { vals =>
                vals.zipWithIndex.foreach { case (v, i) => st.setObject(i + 1, v) }
                st.addBatch()
              }
              st.executeBatch()
              conn.commit()
            }
            buffer.clear()
          }
          rows.foreach { r =>
            buffer += cols.indices.map(r.get)
            if (buffer.size >= batchSize) flush()
          }
          flush()
        } finally conn.close()
      }
    }
  }
}
