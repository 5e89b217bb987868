package graft.state

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Run-audit hook: the reference writes an audit row to BigQuery (and pings
  * Discord) from a Prefect state handler on every flow transition
  * (reference: pipelines/utils/state_handlers.py:24-106). The Spark-native
  * analog is a QueryExecutionListener — one record per action with duration
  * and failure cause, collectable into a lake table.
  */
final class AuditListener extends QueryExecutionListener {

  final case class AuditRecord(funcName: String, durationNs: Long,
      status: String, error: Option[String])

  private val records = new ConcurrentLinkedQueue[AuditRecord]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
    records.add(AuditRecord(funcName, durationNs, "success", None))

  override def onFailure(funcName: String, qe: QueryExecution, e: Exception): Unit =
    records.add(AuditRecord(funcName, 0L, "failed", Some(e.getMessage)))

  def snapshot: Seq[AuditRecord] = records.asScala.toSeq

  def clear(): Unit = records.clear()

  /** Persist the collected audit rows as a lake table slice. Removes ONLY
    * the snapshotted records afterwards: the flush write itself fires
    * onSuccess on this listener (as can concurrent queries), and a blanket
    * clear() would silently drop those later records.
    */
  def flushTo(spark: SparkSession, path: String, runId: String): Unit = {
    import spark.implicits._
    val snap = snapshot
    if (snap.nonEmpty) {
      snap.map(r => (runId, r.funcName, r.durationNs, r.status,
          r.error.getOrElse("")))
        .toDF("run_id", "func", "duration_ns", "status", "error")
        .write.mode("append").parquet(path)
      snap.foreach(records.remove)
    }
  }
}

object AuditListener {
  /** Install a fresh listener on the session and return it. */
  def install(spark: SparkSession): AuditListener = {
    val l = new AuditListener
    spark.listenerManager.register(l)
    l
  }
}
