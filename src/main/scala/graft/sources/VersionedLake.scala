package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-based versioned lake table — the minimal lakehouse commit
  * protocol (what table formats reduce to for a single unpartitioned
  * table): every commit writes NEW data files under `_data/` and then
  * atomically renames a manifest listing exactly the files visible in that
  * version. Readers resolve a manifest (latest or pinned) and read only its
  * files, so:
  *
  *  - writers never mutate visible data (a failed commit leaves orphaned
  *    data files, never a corrupt table);
  *  - concurrent readers see a consistent snapshot;
  *  - old versions remain readable (time travel / instant rollback) until
  *    vacuumed.
  *
  * This re-expresses the reference's staged-delete-then-reload upload mode
  * (reference: pipelines/utils/tasks.py:812-933) as an O(1) metadata swap
  * instead of a destructive window where the table is half-loaded.
  *
  * Manifest format: `_manifests/v{N}.json` = `{"version":N,"files":[...]}`
  * (relative paths). Commit = write `v{N}.json.tmp`, then rename — rename
  * is the atomicity primitive on HDFS-like stores; on object stores a real
  * deployment swaps in a conditional-PUT (documented limitation).
  *
  * == Concurrency contract ==
  *
  *  - '''Committers''': each commit first CLAIMS its version number by
  *    creating `_manifests/v{N}.claim` with create-no-overwrite — atomic
  *    on HDFS and POSIX, so two committers racing to the same N produce
  *    exactly one winner; the loser recomputes N and retries (bounded by
  *    `maxAttempts`). The claim is taken BEFORE any data write, so no two
  *    commits ever share a `_data/v{N}` directory. A committer that
  *    crashes between claim and manifest burns its number (versions may
  *    be non-contiguous); later commits skip past it because the next
  *    number is computed over claims AND manifests.
  *  - '''Readers''': resolve a manifest (latest or pinned) and read only
  *    its immutable file list — a reader never observes a half-commit,
  *    because the manifest rename is the only visibility event.
  *  - '''Append mode''': an append carries the files of the latest
  *    version COMMITTED when it claimed. Serial appends (the stored-state
  *    pattern in [[graft.flows.DedupIndex]]) therefore chain completely;
  *    two appends racing each other may each chain from the same base —
  *    concurrent writers wanting strict append serialization must
  *    serialize externally (the same rule Delta's OCC enforces by
  *    aborting, surfaced here by version numbering).
  *  - '''Vacuum vs readers''': vacuum deletes files unreferenced by every
  *    manifest ≥ `keepFrom`; a reader of any KEPT version is unaffected
  *    mid-vacuum. A reader pinned BELOW `keepFrom` races with the delete
  *    by design — the caller owns picking a `keepFrom` older than any
  *    in-flight read (the same retention contract lakehouse formats ship).
  */
object VersionedLake {

  /** A lost version-claim race after `maxAttempts` tries. */
  final class ConcurrentCommitException(msg: String)
    extends java.io.IOException(msg)

  private def fs(spark: SparkSession, path: String): FileSystem =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(table: String) = new Path(table, "_manifests")

  /** Versions present, ascending (empty for a fresh path). */
  def versions(spark: SparkSession, table: String): Seq[Long] = {
    val f = fs(spark, table)
    val dir = manifestDir(table)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case n if n.matches("v\\d+\\.json") =>
        n.stripPrefix("v").stripSuffix(".json").toLong }
      .sorted
  }

  /** Version numbers any committer has CLAIMED (committed or in-flight or
    * crashed) — the sequence the next commit must advance past.
    */
  private def claimedVersions(f: FileSystem, table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!f.exists(dir)) return Seq.empty
    f.listStatus(dir).map(_.getPath.getName).toSeq
      .collect { case n if n.matches("v\\d+\\.(json|claim)") =>
        n.stripPrefix("v").takeWhile(_.isDigit).toLong }
      .distinct.sorted
  }

  /** Atomically claim `next` for this committer. False = another
    * committer got there first. On `file://` Hadoop's
    * RawLocal/ChecksumFileSystem implements create(overwrite=false) as a
    * NON-atomic exists()-then-create — two racing local committers could
    * both "win" — so local tables claim via `java.io.File.createNewFile`,
    * which is O_EXCL-atomic; HDFS-like stores get the atomic
    * create-no-overwrite RPC.
    */
  private def tryClaim(f: FileSystem, table: String, next: Long): Boolean = {
    val dir = manifestDir(table)
    f.mkdirs(dir)
    val claim = new Path(dir, s"v$next.claim")
    // base FileSystem.getScheme throws UnsupportedOperationException for
    // implementations that never override it — fall back to the URI
    val scheme =
      try f.getScheme
      catch { case _: UnsupportedOperationException => f.getUri.getScheme }
    if (scheme == "file")
      new java.io.File(f.makeQualified(claim).toUri.getPath).createNewFile()
    else
      try { f.create(claim, false).close(); true }
      catch {
        case _: java.io.IOException => false // FileAlreadyExists subsumed
      }
  }

  /** Commit `df` as the next version. `mode` is `"overwrite"` (the new
    * version is exactly `df`) or `"append"` (the new version = previous
    * files + `df`'s files — no data rewrite, pure metadata union).
    * `partitionBy` lays the version's data out Hive-style (`col=value`
    * directories) so reads prune partitions; the manifest records the
    * partition-relative file paths and [[read]] recovers the partition
    * columns per version directory. Returns the committed version number.
    *
    * Safe under concurrent committers (see the concurrency contract
    * above): the version number is claimed atomically before any data
    * write; a lost claim race retries at the next number up to
    * `maxAttempts` times, then throws [[ConcurrentCommitException]].
    */
  def commit(df: DataFrame, table: String, mode: String = "overwrite",
      partitionBy: Seq[String] = Nil, maxAttempts: Int = 10): Long = {
    require(mode == "overwrite" || mode == "append", s"unknown mode $mode")
    val spark = df.sparkSession
    val f = fs(spark, table)
    var next = 0L
    var attempt = 0
    var claimed = false
    while (!claimed) {
      next = claimedVersions(f, table).lastOption.getOrElse(0L) + 1L
      claimed = tryClaim(f, table, next)
      attempt += 1
      if (!claimed && attempt >= maxAttempts)
        throw new ConcurrentCommitException(
          s"lost the version-claim race $maxAttempts times at $table")
    }
    // the APPEND base is the latest manifest at claim time: under
    // concurrent appends each commit carries the files of the last
    // version it SAW — serial appends (the stored-state pattern) chain
    // completely
    val prev = versions(spark, table)
    // new files land under a per-version directory: never collides with
    // visible data, orphaned cleanly if the manifest rename fails
    val dataDir = new Path(table, s"_data/v$next")
    val writer = df.write.mode("errorifexists")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataDir.toString)
    // recursive listing: partitioned layouts nest files under col=value dirs
    val dataPrefix = f.makeQualified(dataDir).toUri.getPath
    val newFiles = {
      val it = f.listFiles(dataDir, true)
      val b = Seq.newBuilder[String]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile && s.getPath.getName.endsWith(".parquet")) {
          val rel = s.getPath.toUri.getPath.stripPrefix(dataPrefix)
            .stripPrefix("/")
          b += s"_data/v$next/$rel"
        }
      }
      b.result().sorted
    }
    val carried = if (mode == "append" && prev.nonEmpty)
      readManifest(spark, table, prev.last) else Seq.empty
    val files = carried ++ newFiles
    val json = files.map(p => "\"" + p + "\"").mkString(
      s"""{"version":$next,"files":[""", ",", "]}")
    val dir = manifestDir(table)
    f.mkdirs(dir)
    val tmp = new Path(dir, s"v$next.json.tmp")
    val out = f.create(tmp, false)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (!f.rename(tmp, new Path(dir, s"v$next.json")))
      throw new java.io.IOException(s"commit v$next lost the rename race")
    next
  }

  private def readManifest(spark: SparkSession, table: String,
      version: Long): Seq[String] = {
    val f = fs(spark, table)
    val p = new Path(manifestDir(table), s"v$version.json")
    val in = f.open(p)
    val json = try new String(in.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8) finally in.close()
    // the manifest is machine-written with a fixed shape; a tiny extractor
    // beats a JSON-library dependency
    val m = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(json)
      .getOrElse(throw new IllegalStateException(s"malformed manifest $p"))
    m.group(1).split(",").toSeq.filter(_.nonEmpty)
      .map(_.trim.stripPrefix("\"").stripSuffix("\""))
  }

  /** Read a version (default: latest). Missing table/version throws.
    *
    * Schema DRIFT across commits is tolerated permissively (`mergeSchema`,
    * on by default): an append-mode commit may add columns, and a merged
    * read returns the union schema with nulls for files written before the
    * column existed — `unionByName(allowMissingColumns)` semantics at the
    * scan, matching the reference's drift tolerance
    * (bq_to_subpav/utils.py:182-201). At 100 TB drift across thousands of
    * daily commits is guaranteed, so the permissive read is the default;
    * the cost is one footer read per distinct file at planning time. A
    * pinned time-travel read of an old version still returns exactly that
    * version's schema (its manifest lists only its own files).
    */
  def read(spark: SparkSession, table: String,
      version: Option[Long] = None, mergeSchema: Boolean = true,
      schemaDDL: String = null): DataFrame = {
    val vs = versions(spark, table)
    require(vs.nonEmpty, s"no committed versions at $table")
    val v = version.getOrElse(vs.last)
    require(vs.contains(v), s"version $v not in $vs at $table")
    val files = readManifest(spark, table, v)
    require(files.nonEmpty, s"version $v of $table lists no files")
    // group by version dir and anchor each group's read at its own
    // basePath: partitioned commits nest files under col=value dirs, and
    // basePath is what lets the scan recover the partition COLUMNS (and
    // prune on them — PartitionFilters) from a manifest's explicit file
    // list. An explicit `schemaDDL` pins column types — partition-column
    // type INFERENCE would e.g. read a bigint dir value back as INT, a
    // mismatch that breaks typed consumers downstream.
    val byVersionDir = files.groupBy(_.split("/").take(2).mkString("/"))
    val parts = byVersionDir.toSeq.sortBy(_._1).map { case (vdir, fs0) =>
      val r0 = spark.read.option("basePath", new Path(table, vdir).toString)
      val r1 = if (schemaDDL != null) r0.schema(schemaDDL)
        else r0.option("mergeSchema", mergeSchema.toString)
      r1.parquet(fs0.map(rel => new Path(table, rel).toString): _*)
    }
    parts.reduceLeft(_.unionByName(_, allowMissingColumns = true))
  }

  /** Delete data files referenced by NO manifest ≥ `keepFrom` and all
    * older manifests — the vacuum step that bounds storage. Returns the
    * number of deleted data files.
    */
  /** `claimTtlMs`: a manifest-less claim younger than this is an in-flight
    * commit whatever its version number — a SLOW commit claimed before a
    * newer version landed can legitimately sit below `keepFrom` while its
    * data write still runs, and sweeping it would corrupt the version the
    * moment its manifest lands. Only claims BOTH below keepFrom AND older
    * than the TTL are crashed commits. The same retention heuristic
    * lakehouse vacuums ship: pick a TTL longer than your longest commit.
    */
  def vacuum(spark: SparkSession, table: String, keepFrom: Long,
      claimTtlMs: Long = 24L * 3600 * 1000): Int = {
    val f = fs(spark, table)
    val vs = versions(spark, table)
    val keep = vs.filter(_ >= keepFrom)
    require(keep.nonEmpty, s"vacuum would delete every version of $table")
    val live = keep.flatMap(readManifest(spark, table, _)).toSet
    // a commit IN FLIGHT (claim taken, manifest not yet renamed) has data
    // files no manifest references yet — its whole _data/v{N} dir is
    // off-limits. In flight = manifest-less AND (≥ keepFrom OR claim
    // younger than the TTL).
    val now = System.currentTimeMillis()
    def claimAgeMs(v: Long): Long =
      try now - f.getFileStatus(
        new Path(manifestDir(table), s"v$v.claim")).getModificationTime
      catch { case _: java.io.IOException => Long.MaxValue }
    val inFlight = claimedVersions(f, table)
      .filter(v => !vs.contains(v) &&
        (v >= keepFrom || claimAgeMs(v) <= claimTtlMs)).toSet
    val dataRoot = new Path(table, "_data")
    // path-string relativization (URI.relativize silently fails across
    // scheme-qualified vs raw paths and would mark every file dead)
    val tablePrefix = f.makeQualified(new Path(table)).toUri.getPath
    var deleted = 0
    if (f.exists(dataRoot)) {
      val it = f.listFiles(dataRoot, true)
      val victims = Seq.newBuilder[Path]
      while (it.hasNext) {
        val s = it.next()
        if (s.isFile) {
          val rel = s.getPath.toUri.getPath
            .stripPrefix(tablePrefix).stripPrefix("/")
          // rel = _data/v{N}/...: leave in-flight versions' files alone
          val ver = rel.split("/").lift(1).collect {
            case v if v.matches("v\\d+") => v.drop(1).toLong
          }
          if (!live.contains(rel) && !ver.exists(inFlight.contains))
            victims += s.getPath
        }
      }
      victims.result().foreach { p => if (f.delete(p, false)) deleted += 1 }
    }
    vs.filterNot(keep.contains).foreach { v =>
      f.delete(new Path(manifestDir(table), s"v$v.json"), false)
      f.delete(new Path(manifestDir(table), s"v$v.claim"), false)
    }
    // claims below keepFrom whose manifest never appeared AND whose TTL
    // expired (crashed committers): their data dirs were just swept above,
    // drop the claims; in-flight claims keep both claim and data
    claimedVersions(f, table)
      .filter(v => v < keepFrom && !vs.contains(v) && !inFlight.contains(v))
      .foreach(v => f.delete(new Path(manifestDir(table), s"v$v.claim"), false))
    deleted
  }
}
