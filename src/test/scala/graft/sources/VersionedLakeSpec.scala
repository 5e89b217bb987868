package graft.sources

import java.nio.file.Files
import graft.SparkSpec

class VersionedLakeSpec extends SparkSpec {
  import spark.implicits._

  test("commit/read: overwrite versions are isolated snapshots") {
    val tbl = Files.createTempDirectory("vlake").toString
    val v1 = VersionedLake.commit(Seq(1, 2, 3).toDF("x"), tbl)
    val v2 = VersionedLake.commit(Seq(10, 20).toDF("x"), tbl)
    assert((v1, v2) == ((1L, 2L)))
    assert(VersionedLake.read(spark, tbl).collect().map(_.getInt(0)).sorted
      .toSeq == Seq(10, 20))                      // latest = v2
    assert(VersionedLake.read(spark, tbl, Some(1L)).collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 3)) // time travel
  }

  test("append mode unions files without rewriting data") {
    val tbl = Files.createTempDirectory("vlake2").toString
    VersionedLake.commit(Seq(1).toDF("x"), tbl)
    VersionedLake.commit(Seq(2).toDF("x"), tbl, mode = "append")
    assert(VersionedLake.read(spark, tbl).collect().map(_.getInt(0)).sorted
      .toSeq == Seq(1, 2))
    // v1 unchanged by the append
    assert(VersionedLake.read(spark, tbl, Some(1L)).collect()
      .map(_.getInt(0)).toSeq == Seq(1))
  }

  test("vacuum drops unreferenced files and old manifests, keeps live versions") {
    val tbl = Files.createTempDirectory("vlake3").toString
    VersionedLake.commit(Seq(1).toDF("x"), tbl)
    VersionedLake.commit(Seq(2).toDF("x"), tbl)
    val deleted = VersionedLake.vacuum(spark, tbl, keepFrom = 2L)
    assert(deleted >= 1)
    assert(VersionedLake.versions(spark, tbl) == Seq(2L))
    assert(VersionedLake.read(spark, tbl).collect().map(_.getInt(0))
      .toSeq == Seq(2))
    intercept[IllegalArgumentException](
      VersionedLake.read(spark, tbl, Some(1L)))
    // refusing to delete everything
    intercept[IllegalArgumentException](
      VersionedLake.vacuum(spark, tbl, keepFrom = 99L))
  }
}
