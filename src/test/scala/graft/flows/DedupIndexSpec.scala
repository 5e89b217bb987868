package graft.flows

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupIndexSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-dedup-index").toString

  test("ensure builds once, then reads the stored tables (marker-gated)") {
    val root = freshRoot()
    val idx = DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text",
      root = root)
    assert(idx.hashed.count() > 0)
    assert(idx.banded.count() == idx.hashed.count() * 4) // one row per band
    // second ensure must read the SAME files, not rebuild: capture the
    // parquet part-file mtimes and compare after
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes() = fs.listStatus(fs.globStatus(
        new org.apache.hadoop.fs.Path(s"$root/*/hashed")).head.getPath)
      .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = mtimes()
    DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text", root = root)
    assert(mtimes() == before, "second ensure must not rewrite the index")
  }

  test("stored pairs equal the in-memory pipeline's pairs") {
    val root = freshRoot()
    val idx = DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text",
      root = root)
    val docs = graft.sources.Lake.table(spark, sfDir, "documents")
    val mem = graft.operators.Dedup
      .minHashCandidatePairsPortable(docs, "doc_id", "text")
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
    val stored = idx.pairs
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 9).as("j"))
    assert(mem.exceptAll(stored).isEmpty && stored.exceptAll(mem).isEmpty)
  }

  test("a missing _COMPLETE marker forces a rebuild (crash mid-build)") {
    val root = freshRoot()
    DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text", root = root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/*"))
      .filter(!_.getPath.getName.startsWith(".")).head.getPath
    // simulate a crash that left data but no marker, with one table damaged
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_COMPLETE"), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "pairs"), true)
    val idx = DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text",
      root = root)
    assert(idx.pairs.count() >= 0) // readable again — rebuilt from scratch
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir, "_COMPLETE")))
  }
}
