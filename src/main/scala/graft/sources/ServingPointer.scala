package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** The blue/green cutover primitive for stored state: a tiny
  * [[VersionedLake]] table holding ONE row — the root currently being
  * served. Every stored model here (the MinHash dedup index, the
  * IVF-PQ ANN index, the SemDeDup centroids) refits by building a NEW
  * root and cutting readers over; this is the cut. [[set]] is an atomic
  * single-table commit (manifest rename / conditional PUT — the same
  * CAS every commit uses), so a reader resolves either the old root or
  * the new one, never a torn in-between; readers that already resolved
  * the old root keep reading it untouched (roots are immutable-once-
  * built, and the pointer never deletes), which is exactly the
  * blue/green contract: drain, then retire the old root out of band.
  *
  * Why a lake table and not a config entry: the pointer inherits the
  * lake's durability, its version history ([[history]] — who served
  * when, the audit a cutover incident asks for first), and its store
  * abstraction (HDFS rename or object-store conditional PUT) with zero
  * new machinery.
  *
  * Reference analog: the stored-progress idiom that keys consumers off
  * warehouse state rather than deploy-time wiring (reference:
  * pipelines/utils/progress.py:22-140).
  */
object ServingPointer {

  private val schema =
    StructType(Seq(StructField("root", StringType, nullable = false)))

  /** Atomically point `ptr` at `root` (the cut). Returns the pointer's
    * committed version. The target is not validated here — a deployment
    * cuts over only after its own gate (e.g. [[graft.flows.AnnIndex
    * .recallProbe]] on the candidate root) passes, and a pointer to a
    * half-built root would fail loudly at first resolve+read anyway.
    */
  def set(spark: SparkSession, ptr: String, root: String): Long =
    VersionedLake.commit(
      spark.createDataFrame(java.util.List.of(Row(root)), schema), ptr)

  /** The currently served root. Branded on an unset pointer — a typo'd
    * pointer path must not surface as a bare "no committed versions".
    */
  def resolve(spark: SparkSession, ptr: String): String = {
    require(VersionedLake.versions(spark, ptr).nonEmpty,
      s"no serving pointer at $ptr (set it first)")
    VersionedLake.read(spark, ptr, schemaDDL = "root STRING")
      .head.getString(0)
  }

  /** Every root this pointer has ever served, one row per cut in commit
    * order: (version, root). The cutover audit trail.
    */
  def history(spark: SparkSession, ptr: String): Seq[(Long, String)] = {
    val vs = VersionedLake.versions(spark, ptr)
    require(vs.nonEmpty, s"no serving pointer at $ptr (set it first)")
    vs.map(v => v -> VersionedLake.read(spark, ptr, Some(v),
      schemaDDL = "root STRING").head.getString(0))
  }
}
