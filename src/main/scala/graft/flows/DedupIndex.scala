package graft.flows

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Dedup

/** Stored MinHash signature index — the PRODUCTION shape of near-dup
  * dedup at corpus scale: the `(id, hs)` hashed-shingle table and the
  * `(id, band, bucket)` LSH table are written to the lake ONCE per corpus
  * (at ingest time), and every downstream consumer — pair listing,
  * duplicate clustering, cluster retention, incremental batch dedup —
  * READS the stored tables instead of re-running the normalize → tokenize
  * → shingle → md5 pipeline, by far the most expensive stage. The hashed
  * table is written first and the banded table is derived FROM the stored
  * hashed table ([[Dedup.bandedFromHashed]]), so the corpus text is
  * shingled exactly once ever.
  *
  * Layout: `<root>/<key>/hashed` + `<root>/<key>/banded` parquet dirs with
  * a `_COMPLETE` marker written LAST — a crash mid-build leaves no marker
  * and the next call rebuilds from scratch (writes go to a fresh staging
  * dir that is atomically renamed into place, so a half-written index is
  * never visible under the final key). The key hashes the corpus location
  * and every parameter that shapes the index, plus a format version.
  */
object DedupIndex {

  /** Bump when the on-disk layout or pipeline constants change — stale
    * indexes from an older build then miss and rebuild instead of being
    * read with wrong semantics. v5: tables store through [[VersionedLake]]
    * (manifest commits) instead of bare parquet dirs.
    */
  private val FormatVersion = 5

  private def defaultRoot: String =
    s"${System.getProperty("java.io.tmpdir")}/graft_minhash_index"

  /** Content stamp of the corpus location (total bytes, max modification
    * time, file count — one bounded recursive listing, the same metadata a
    * lake commit carries): folded into the index key so a corpus REWRITTEN
    * IN PLACE misses the old key and rebuilds, instead of silently serving
    * pairs computed from the previous data.
    */
  private def corpusStamp(spark: SparkSession, corpusPath: String): String = {
    val p = new Path(corpusPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) "absent"
    else {
      val it = fs.listFiles(p, true)
      var len = 0L; var mt = 0L; var n = 0L
      while (it.hasNext) {
        val st = it.next()
        len += st.getLen; mt = math.max(mt, st.getModificationTime); n += 1
      }
      s"$len|$mt|$n"
    }
  }

  private def key(spark: SparkSession, corpusPath: String, idCol: String,
      textCol: String, shingleN: Int, numHashes: Int, bands: Int,
      subsetTag: String): String = {
    val spec = s"v$FormatVersion|$corpusPath|${corpusStamp(spark, corpusPath)}|" +
      s"$idCol|$textCol|$shingleN|$numHashes|$bands|$subsetTag"
    java.security.MessageDigest.getInstance("MD5")
      .digest(spec.getBytes("UTF-8")).map("%02x".format(_)).mkString
  }

  /** Build the index for `docs` under `dir`, replacing any prior index at
    * the same key. Each table commits through [[graft.sources.VersionedLake]]
    * — per-table atomicity, versioning and vacuum come from the manifest
    * protocol instead of hand-rolled staging/rename — and the `_COMPLETE`
    * marker (written LAST, deleted FIRST) gates the three tables as a
    * GROUP: a crash mid-build leaves no marker, and the next call
    * recommits all three, so the latest version of each table always
    * belongs to one complete build. Returns the final index directory.
    */
  def build(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, corpusPath: String, root: String = defaultRoot,
      shingleN: Int = 3, numHashes: Int = 16, bands: Int = 4,
      subsetTag: String = ""): String = {
    import graft.sources.VersionedLake
    val k = key(spark, corpusPath, idCol, textCol, shingleN, numHashes, bands,
      subsetTag)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val finalDir = new Path(s"$root/$k")
    fs.delete(new Path(finalDir, "_COMPLETE"), false)
    // hashed first, from the corpus text; banded SECOND, from the stored
    // hashed parquet — one shingle pass total, and the banded job reads
    // slim (id, hs) rows instead of re-tokenizing documents
    val (hashed, _) = Dedup.minHashIndexPortable(docs, idCol, textCol,
      shingleN, numHashes, bands, cache = false)
    val vHashed = VersionedLake.commit(hashed, s"$finalDir/hashed")
    val storedHashed = VersionedLake.read(spark, s"$finalDir/hashed")
    val vBanded = VersionedLake.commit(
      Dedup.bandedFromHashed(storedHashed, numHashes, bands),
      s"$finalDir/banded")
    // THIRD: the scored candidate-pair table, derived from the two stored
    // tables. Jaccard is threshold-free, so one stored pair table serves
    // every downstream policy (cluster at 0.5, audit at 0.8, ...) with a
    // single slim scan — the candidate join never re-runs per query.
    val storedBanded = VersionedLake.read(spark, s"$finalDir/banded")
    val vPairs = VersionedLake.commit(
      Dedup.minHashPairsFromIndex(storedHashed, storedBanded),
      s"$finalDir/pairs")
    // a rebuild at an existing key (crash recovery, q93's explicit-build
    // timing) supersedes prior versions — vacuum bounds the store to the
    // build just committed
    VersionedLake.vacuum(spark, s"$finalDir/hashed", vHashed)
    VersionedLake.vacuum(spark, s"$finalDir/banded", vBanded)
    VersionedLake.vacuum(spark, s"$finalDir/pairs", vPairs)
    fs.create(new Path(finalDir, "_COMPLETE"), true).close()
    finalDir.toString
  }

  /** Readers over one stored index: the per-doc hashed shingle sets, the
    * LSH band rows, and the corpus-level scored candidate pairs.
    */
  final case class Index(hashed: DataFrame, banded: DataFrame, pairs: DataFrame)

  /** Read-or-build: return readers over the stored index for the corpus at
    * `<sfDir>/<table>.parquet`, building it first if absent or incomplete.
    * Subsequent calls (and subsequent SESSIONS — the index outlives the JVM
    * like any lake table) skip straight to the parquet reads.
    *
    * `subset` restricts the indexed corpus to a deterministic slice (e.g.
    * the historical 80% in an incremental-dedup flow); `subsetTag` names
    * the slice and is folded into the index key so different slices of the
    * same table store as distinct indexes. The two must be supplied
    * together — the function can't hash a closure, so an untagged subset
    * would silently collide with the full-table index (enforced).
    */
  def ensure(spark: SparkSession, sfDir: String, table: String,
      idCol: String, textCol: String, root: String = defaultRoot,
      shingleN: Int = 3, numHashes: Int = 16,
      bands: Int = 4, subsetTag: String = "",
      subset: DataFrame => DataFrame = null): Index = synchronized {
    require((subset == null) == subsetTag.isEmpty,
      "DedupIndex.ensure: subset and subsetTag must be supplied together " +
        "(the tag is the only thing distinguishing the slice's index key)")
    val corpusPath = s"$sfDir/$table.parquet"
    val k = key(spark, corpusPath, idCol, textCol, shingleN, numHashes, bands,
      subsetTag)
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val marker = new Path(s"$root/$k/_COMPLETE")
    if (!fs.exists(marker)) {
      val full = graft.sources.Lake.table(spark, sfDir, table)
      val docs = if (subset == null) full else subset(full)
      build(spark, docs, idCol, textCol, corpusPath, root, shingleN,
        numHashes, bands, subsetTag)
    }
    import graft.sources.VersionedLake
    Index(VersionedLake.read(spark, s"$root/$k/hashed"),
      VersionedLake.read(spark, s"$root/$k/banded"),
      VersionedLake.read(spark, s"$root/$k/pairs"))
  }
}
