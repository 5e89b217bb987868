package graft.flows

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupIndexSpec extends SparkSpec {

  private def freshRoot(): String =
    java.nio.file.Files.createTempDirectory("graft-dedup-index").toString

  test("ensure builds once, then reads the stored tables (group-manifest gated)") {
    val root = freshRoot()
    val idx = DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text",
      root = root)
    assert(idx.hashed.count() > 0)
    assert(idx.banded.count() == idx.hashed.count() * 4) // one row per band
    // second ensure must read the SAME files, not rebuild: capture the
    // parquet part-file mtimes and compare after
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes() = {
      val dir = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/*"))
        .filter(!_.getPath.getName.startsWith(".")).head.getPath
      val it = fs.listFiles(dir, true)
      val b = Map.newBuilder[String, Long]
      while (it.hasNext) {
        val s = it.next()
        if (s.getPath.getName.endsWith(".parquet"))
          b += s.getPath.toString -> s.getModificationTime
      }
      b.result()
    }
    val before = mtimes()
    assert(before.nonEmpty)
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

  test("a crashed build (no group manifest) forces a rebuild") {
    val root = freshRoot()
    DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text", root = root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = fs.globStatus(new org.apache.hadoop.fs.Path(s"$root/*"))
      .filter(!_.getPath.getName.startsWith(".")).head.getPath
    // simulate a crash before publish: the claim exists (taken at begin)
    // but the manifest never landed — the atomic-group equivalent of the
    // old missing-marker state, with one table's data additionally
    // damaged. The leftover claim makes the rebuild take the NEXT version
    // number, exactly as a real crashed committer would.
    fs.delete(new org.apache.hadoop.fs.Path(dir, "_manifests/v1.json"), false)
    fs.delete(new org.apache.hadoop.fs.Path(dir, "pairs"), true)
    val idx = DedupIndex.ensure(spark, sfDir, "documents", "doc_id", "text",
      root = root)
    assert(idx.pairs.count() >= 0) // readable again — rebuilt from scratch
    assert(graft.sources.VersionedLake.versions(spark, dir.toString).nonEmpty)
  }
}
