package graft.flows

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.sources.{LakeWriter, VersionedLake}

/** Shared retention pass for the streaming dedup flows
  * ([[StreamingDedup]], [[StreamingSemDeDup]]): each micro-batch
  * publishes one [[VersionedLake]] group version (appends are metadata
  * unions), so a long-running stream accrues O(batches) manifests AND
  * O(batches) small parquet files. This pass bounds both: ONE new group
  * version rewrites every accrued table into size-targeted files (the
  * q90 sizing rule, [[LakeWriter.compactionFileCount]]), CARRIES the
  * tables that must not be rewritten (the `applied` replay marker, a
  * fitted centroid model), then [[VersionedLake.vacuumGroup]]s every
  * older version. State is row-identical across the pass — only the
  * file layout changes — so drop rules, oracles, and checkpoint resumes
  * are unaffected; readers pinned to a vacuumed version fail loudly
  * (`version $v not in …`).
  *
  * SINGLE-WRITER: call from the stream's own foreachBatch (the writers
  * do, on the `retainEvery` cadence) or while the stream is stopped; a
  * concurrent batch commit racing this rewrite would be silently
  * overwritten — the same external-serialization rule the append chain
  * already carries.
  */
private[flows] object StreamingRetention {

  /** Compact + vacuum the group at `root`. `carryTables` are re-listed
    * verbatim (no data rewrite); everything else is rewritten to
    * ~`targetBytes` files, hash-distributed on `partitioned(table)`
    * when set so a Hive-partitioned layout keeps one file per
    * (partition value) instead of exploding to files × partitions.
    * Returns the compacted version.
    */
  def compactState(spark: SparkSession, root: String, targetBytes: Long,
      carryTables: Set[String],
      partitioned: Map[String, Seq[String]] = Map.empty): Long = {
    val vs = VersionedLake.versions(spark, root)
    require(vs.nonEmpty, s"no streaming state at $root")
    val v = vs.last
    val f = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // ONE manifest read answers table listing AND sizing for the whole
    // pass — per-table accessor calls would re-list and re-parse the
    // pre-compaction manifest (the cycle's largest) once per table, on
    // every retention cadence hit
    val filesByTable = VersionedLake.groupTableFiles(spark, root, Some(v))
    def fileCount(table: String): Int = {
      val bytes = filesByTable(table)
        .map(p => f.getFileStatus(new org.apache.hadoop.fs.Path(p)).getLen)
        .sum
      LakeWriter.compactionFileCount(bytes, targetBytes)
    }
    val gc = VersionedLake.beginGroupCommit(spark, root)
    filesByTable.keys.toSeq.sorted.foreach { table =>
      if (carryTables(table)) gc.carry(table)
      else {
        val pb = partitioned.getOrElse(table, Nil)
        val df = VersionedLake.readTable(spark, root, table, Some(v))
        val compacted =
          if (pb.isEmpty) df.repartition(fileCount(table))
          // hash on the partition columns: each task holds a disjoint
          // slice of partition values, so the write emits ≤ one file
          // per value instead of fileCount × values
          else df.repartition(fileCount(table), pb.map(col): _*)
        gc.write(table, compacted, partitionBy = pb)
      }
    }
    val nv = gc.publish()
    VersionedLake.vacuumGroup(spark, root, keepFrom = nv)
    nv
  }
}
