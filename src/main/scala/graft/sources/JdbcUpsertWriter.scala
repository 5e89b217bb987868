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

  /** ANSI MERGE upsert — the standard-SQL dialect (H2 in ANSI mode,
    * Postgres 15+, SQL Server; NOT Derby, whose MERGE source must be a base
    * table or table function — use `"update-insert"` there).
    * One parameterized VALUES row as the source;
    * every parameter is CAST to its column's SQL type because strict
    * engines (Derby) reject parameter markers whose type can't be inferred
    * inside VALUES. Parameter order matches `cols` — identical binding to
    * [[upsertSql]], so [[write]] drives both dialects with the same loop.
    */
  def ansiMergeSql(table: String, cols: Seq[String], keyCols: Seq[String],
      sqlTypes: Seq[String]): String = {
    require(cols.nonEmpty, "no columns")
    require(cols.size == sqlTypes.size, "one SQL type per column")
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), "keys ⊆ cols")
    val src = sqlTypes.map(t => s"CAST(? AS $t)").mkString(", ")
    val vcols = cols.mkString(", ")
    val on = keyCols.map(k => s"t.$k = v.$k").mkString(" AND ")
    val sets = cols.filterNot(keyCols.contains)
      .map(c => s"$c = v.$c").mkString(", ")
    val matched = if (sets.isEmpty) "" else s" WHEN MATCHED THEN UPDATE SET $sets"
    s"MERGE INTO $table t USING (VALUES ($src)) AS v($vcols) ON $on" +
      matched +
      s" WHEN NOT MATCHED THEN INSERT ($vcols) VALUES (${cols.map(c => s"v.$c").mkString(", ")})"
  }

  /** Spark type → ANSI SQL type for the MERGE source row's CASTs. */
  def sqlTypeFor(dt: org.apache.spark.sql.types.DataType): String = {
    import org.apache.spark.sql.types._
    dt match {
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case ShortType => "SMALLINT"
      case DoubleType => "DOUBLE"
      case FloatType => "REAL"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case TimestampType => "TIMESTAMP"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case StringType => "VARCHAR(32672)" // Derby's VARCHAR ceiling
      case other => throw new IllegalArgumentException(
        s"no ANSI SQL mapping for Spark type $other")
    }
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
    *
    * Dialects:
    *  - `"mysql"` — one `INSERT … ON DUPLICATE KEY UPDATE` statement per
    *    row batch (the reference's wire shape).
    *  - `"ansi"` — one ANSI `MERGE` with a parameterized VALUES source.
    *    H2 / Postgres 15+ / SQL Server accept it; Derby does NOT (its MERGE
    *    source must be a base table or table function).
    *  - `"update-insert"` — two statements per flush: batched UPDATE, then
    *    INSERT for exactly the rows whose update count was 0. Runs on ANY
    *    JDBC engine (proven live against embedded Derby in the test suite).
    *    Same row-visit count as MERGE server-side; one extra round-trip per
    *    flush. Correct under a single writer per key set (the reference's
    *    scheduled-flow model); a concurrent writer racing the INSERT
    *    surfaces as a non-retryable duplicate-key error — loud, not lost.
    */
  def write(df: DataFrame, table: String, keyCols: Seq[String],
      connect: () => Connection, batchSize: Int = 1000,
      maxRetries: Int = 3, backoffMs: Long = 1000,
      dialect: String = "mysql"): Unit = {
    val cols = df.columns.toSeq
    require(keyCols.nonEmpty && keyCols.forall(cols.contains), "keys ⊆ cols")
    dialect match {
      case "mysql" | "ansi" =>
        val sql =
          if (dialect == "mysql") upsertSql(table, cols, keyCols)
          else ansiMergeSql(table, cols, keyCols,
            df.schema.fields.map(f => sqlTypeFor(f.dataType)).toSeq)
        writeSingleStatement(df, cols, sql, connect, batchSize, maxRetries, backoffMs)
      case "update-insert" =>
        writeUpdateInsert(df, table, cols, keyCols, connect, batchSize,
          maxRetries, backoffMs)
      case other => throw new IllegalArgumentException(
        s"unknown upsert dialect '$other' (mysql | ansi | update-insert)")
    }
  }

  private def writeSingleStatement(df: DataFrame, cols: Seq[String], sql: String,
      connect: () => Connection, batchSize: Int,
      maxRetries: Int, backoffMs: Long): Unit =
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
              conn.rollback() // discard partial work of a failed prior attempt
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
        } finally closeQuietly(conn)
      }
    }

  /** Roll back any open transaction before closing: a fail-fast error
    * leaves the transaction active, and strict engines (Derby) refuse
    * `close()` then — which would mask the original exception.
    */
  private def closeQuietly(conn: Connection): Unit = {
    try conn.rollback() catch { case _: SQLException => () }
    conn.close()
  }

  private def writeUpdateInsert(df: DataFrame, table: String, cols: Seq[String],
      keyCols: Seq[String], connect: () => Connection, batchSize: Int,
      maxRetries: Int, backoffMs: Long): Unit = {
    val nonKey = cols.filterNot(keyCols.contains)
    require(nonKey.nonEmpty,
      "update-insert needs at least one non-key column (an all-key table " +
        "has nothing to update — use INSERT with duplicate-key tolerance)")
    val updateSql = s"UPDATE $table SET " +
      nonKey.map(c => s"$c = ?").mkString(", ") +
      " WHERE " + keyCols.map(c => s"$c = ?").mkString(" AND ")
    val insertSql = s"INSERT INTO $table (${cols.mkString(", ")}) " +
      s"VALUES (${cols.map(_ => "?").mkString(", ")})"
    val nonKeyIdx = nonKey.map(cols.indexOf)
    val keyIdx = keyCols.map(cols.indexOf)
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      if (rows.nonEmpty) {
        val conn = connect()
        try {
          conn.setAutoCommit(false)
          val upd = conn.prepareStatement(updateSql)
          val ins = conn.prepareStatement(insertSql)
          val raw = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
          def flush(): Unit = if (raw.nonEmpty) {
            // dedupe the flush unit by key, LAST occurrence wins — two
            // same-key rows in one buffer would both see update count 0 and
            // both take the INSERT path, the second dying on a duplicate-key
            // error the mysql/ansi dialects don't raise (they apply rows in
            // order, last wins); deduping reproduces that end state
            val byKey = scala.collection.mutable.LinkedHashMap.empty[Seq[Any], Seq[Any]]
            raw.foreach { vals => byKey.put(keyIdx.map(vals), vals) }
            val buffer = byKey.values.toIndexedSeq
            // the whole update→probe-counts→insert→commit sequence is ONE
            // retry unit: replaying it after a deadlock is upsert-idempotent
            // (rows inserted before the rollback re-resolve as updates)
            withRetries(maxRetries, backoffMs) {
              conn.rollback() // discard partial work of a failed prior attempt
              upd.clearBatch(); ins.clearBatch()
              buffer.foreach { vals =>
                (nonKeyIdx ++ keyIdx).zipWithIndex.foreach { case (src, i) =>
                  upd.setObject(i + 1, vals(src)) }
                upd.addBatch()
              }
              // per-row update counts decide which rows INSERT — this is
              // why the two-statement shape needs no engine-specific SQL.
              // Some drivers batch-return Statement.SUCCESS_NO_INFO (-2)
              // instead of real counts (Oracle always; MySQL with
              // rewriteBatchedStatements) — treating that as "updated"
              // would silently drop every new row, so those rows re-run
              // their UPDATE individually (executeUpdate always returns a
              // real count; the duplicate update is value-idempotent).
              val counts = upd.executeBatch()
              buffer.indices.filter { bi =>
                val c = counts(bi)
                if (c >= 0) c == 0
                else if (c == java.sql.Statement.SUCCESS_NO_INFO) {
                  (nonKeyIdx ++ keyIdx).zipWithIndex.foreach { case (src, i) =>
                    upd.setObject(i + 1, buffer(bi)(src)) }
                  upd.executeUpdate() == 0
                } else {
                  // EXECUTE_FAILED (-3) without a BatchUpdateException is a
                  // driver anomaly — re-running it as "maybe updated" would
                  // silently drop the row; surface it (retryable classifier
                  // still applies via withRetries)
                  throw new SQLException(
                    s"batched UPDATE reported EXECUTE_FAILED for row $bi")
                }
              }.foreach { bi =>
                buffer(bi).zipWithIndex.foreach { case (v, i) =>
                  ins.setObject(i + 1, v) }
                ins.addBatch()
              }
              ins.executeBatch()
              conn.commit()
            }
            raw.clear()
          }
          rows.foreach { r =>
            raw += cols.indices.map(r.get)
            if (raw.size >= batchSize) flush()
          }
          flush()
        } finally closeQuietly(conn)
      }
    }
  }
}
