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

  test("schema evolution: append commit adds a column, reads merge permissively") {
    val tbl = Files.createTempDirectory("vlake-evolve").toString
    VersionedLake.commit(Seq((1, "a"), (2, "b")).toDF("k", "v"), tbl)
    // v2 appends files carrying an EXTRA column — drift, not a rewrite
    VersionedLake.commit(Seq((3, "c", 30.0)).toDF("k", "v", "score"), tbl,
      mode = "append")
    val latest = VersionedLake.read(spark, tbl)
    assert(latest.columns.sorted.toSeq == Seq("k", "score", "v"))
    val rows = latest.select("k", "v", "score").collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    // rows written before the column existed come back null, not an error
    assert(rows == Seq((1, "a", None), (2, "b", None), (3, "c", Some(30.0))))
    // pinned time travel to v1 returns exactly v1's schema — the new
    // column does not leak backwards
    val v1 = VersionedLake.read(spark, tbl, Some(1L))
    assert(v1.columns.sorted.toSeq == Seq("k", "v"))
    assert(v1.count() == 2)
  }

  test("partitioned commit: partition columns recovered, scan pruned, schemaDDL pins types") {
    val tbl = Files.createTempDirectory("vlake-part").toString
    VersionedLake.commit(
      Seq((1L, "a", 0L), (2L, "b", 0L), (3L, "c", 1L), (4L, "d", 2L))
        .toDF("id", "payload", "cid"),
      tbl, partitionBy = Seq("cid"))
    // partition column comes back (basePath anchoring), typed by the DDL
    val df = VersionedLake.read(spark, tbl,
      schemaDDL = "id BIGINT, payload STRING, cid BIGINT")
    assert(df.schema("cid").dataType.typeName == "long")
    assert(df.count() == 4)
    // a cid filter prunes at the PARTITION level, not per-row
    val pruned = df.where($"cid" === 0L)
    assert(pruned.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cid".r.findFirstIn(plan).isDefined, plan)
    // append of a new partition layout version still reads as one table
    VersionedLake.commit(Seq((9L, "z", 3L)).toDF("id", "payload", "cid"),
      tbl, mode = "append", partitionBy = Seq("cid"))
    assert(VersionedLake.read(spark, tbl,
      schemaDDL = "id BIGINT, payload STRING, cid BIGINT").count() == 5)
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

  test("two interleaved committers: atomic version claims, unique version " +
    "numbers, every manifest a consistent snapshot") {
    val tbl = Files.createTempDirectory("vlakec").toString
    val perThread = 6
    val committed = java.util.Collections.synchronizedList(
      new java.util.ArrayList[(Int, Long)]())
    val failures = new java.util.concurrent.atomic.AtomicInteger(0)
    // each committer writes overwrite snapshots whose row count encodes
    // (writer, iteration) — a torn commit would surface as a count outside
    // the valid set
    def runner(id: Int) = new Thread(() => {
      for (i <- 1 to perThread) {
        try {
          val rows = 100 * id + i
          val v = VersionedLake.commit(
            spark.range(rows.toLong).toDF("x"), tbl)
          committed.add(id -> v)
        } catch { case _: Throwable => failures.incrementAndGet() }
      }
    })
    val ts = Seq(runner(1), runner(2))
    ts.foreach(_.start()); ts.foreach(_.join())
    assert(failures.get() == 0, "claim retry must absorb every race")
    // every commit got a UNIQUE version number
    val vs = committed.toArray.map(_.asInstanceOf[(Int, Long)]._2).toSeq
    assert(vs.distinct.size == 2 * perThread)
    assert(VersionedLake.versions(spark, tbl).toSet == vs.toSet)
    // every version reads back as exactly one writer's snapshot — no
    // interleaved data dirs, no torn manifest
    val validCounts = (for (id <- 1 to 2; i <- 1 to perThread)
      yield (100 * id + i).toLong).toSet
    for (v <- vs)
      assert(validCounts.contains(
        VersionedLake.read(spark, tbl, Some(v)).count()))
  }

  test("vacuum spares an IN-FLIGHT commit's data files (claim ≥ keepFrom, " +
    "manifest not yet landed); a crashed claim below keepFrom is swept") {
    val tbl = Files.createTempDirectory("vlakeif").toString
    for (n <- Seq(10L, 20L, 30L))
      VersionedLake.commit(spark.range(n).toDF("x"), tbl)
    // simulate a committer mid-commit at v4: claim taken, data being
    // written, manifest NOT yet renamed in
    val manifests = new java.io.File(s"$tbl/_manifests")
    assert(new java.io.File(manifests, "v4.claim").createNewFile())
    val inflightDir = new java.io.File(s"$tbl/_data/v4")
    assert(inflightDir.mkdirs())
    val inflightFile = new java.io.File(inflightDir, "part-0.parquet")
    java.nio.file.Files.write(inflightFile.toPath, Array[Byte](1, 2, 3))
    VersionedLake.vacuum(spark, tbl, keepFrom = 3L)
    // the unreferenced-but-claimed v4 file SURVIVES — sweeping it would
    // corrupt v4 the moment its manifest lands
    assert(inflightFile.exists())
    assert(new java.io.File(manifests, "v4.claim").exists())
    VersionedLake.commit(spark.range(5L).toDF("x"), tbl) // lands as v5
    // below keepFrom but the claim is YOUNG (within the TTL): a slow
    // in-flight commit claimed before v5 landed — still protected
    VersionedLake.vacuum(spark, tbl, keepFrom = 5L)
    assert(inflightFile.exists())
    assert(new java.io.File(manifests, "v4.claim").exists())
    // below keepFrom AND TTL expired: a crashed commit — data swept,
    // claim removed, number stays burned
    VersionedLake.vacuum(spark, tbl, keepFrom = 5L, claimTtlMs = 0L)
    assert(!inflightFile.exists())
    assert(!new java.io.File(manifests, "v4.claim").exists())
    assert(VersionedLake.read(spark, tbl).count() == 5L)
  }

  test("readers stay consistent mid-vacuum; crashed claims burn a number " +
    "without wedging the table") {
    val tbl = Files.createTempDirectory("vlakev").toString
    for (n <- Seq(10L, 20L, 30L))
      VersionedLake.commit(spark.range(n).toDF("x"), tbl)
    // a reader resolved on the latest version is untouched by a vacuum
    // that drops older versions, even if the delete runs mid-read
    val pinned = VersionedLake.read(spark, tbl, Some(3L))
    assert(VersionedLake.vacuum(spark, tbl, keepFrom = 3L) > 0)
    assert(pinned.count() == 30L) // kept version: files all alive
    intercept[IllegalArgumentException](
      VersionedLake.read(spark, tbl, Some(1L))) // dropped version is gone
    // simulate a committer that died between claim and manifest
    val claims = new java.io.File(s"$tbl/_manifests")
    assert(new java.io.File(claims, "v4.claim").createNewFile())
    // the next commit skips the burned number instead of wedging
    assert(VersionedLake.commit(spark.range(5L).toDF("x"), tbl) == 5L)
    assert(VersionedLake.read(spark, tbl).count() == 5L)
    // vacuum sweeps the orphaned claim once it falls below keepFrom AND
    // its in-flight TTL expires (ttl=0 = "treat every stale claim as dead")
    VersionedLake.vacuum(spark, tbl, keepFrom = 5L, claimTtlMs = 0L)
    assert(!new java.io.File(claims, "v4.claim").exists())
    assert(VersionedLake.read(spark, tbl).count() == 5L)
  }
}
