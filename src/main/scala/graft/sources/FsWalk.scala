package graft.sources

import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}

/** Recursive file listing via a plain `listStatus` walk.
  *
  * `FileSystem.listFiles(path, recursive = true)` returns
  * `LocatedFileStatus`es — it materializes BLOCK LOCATIONS per file,
  * which on the local filesystem chain ((Proxy/Checksum)LocalFileSystem)
  * costs a per-file detour measured at ~45 ms/file: 3.5 s to list a
  * 76-file tree vs 0.02 s for this walk (r17, same tree, same JVM).
  * Every driver-side metadata sweep in the engine (post-write manifest
  * listing, vacuum, retention sizing, corpus stamps) was paying it —
  * per COMMIT, so micro-batch flows paid it several times per batch.
  * None of these listings need block locations.
  *
  * On HDFS the located form saves one RPC per file for consumers that
  * want locality; these listings don't, and a per-directory
  * `listStatus` walk is the same RPC count for the shallow (≤ 3-level)
  * trees the lake layouts produce. Object-store note: a flat-prefix
  * LIST (what `listFiles(recursive)` does on S3A) can beat a per-dir
  * walk on very deep trees; the lake's trees are bounded at
  * `table/_data/vN/[col=value/]file`, where per-dir listing is within a
  * constant of flat listing — and 100× cheaper than the local-FS
  * located path this replaces.
  */
object FsWalk {

  /** All files under `p` (depth-first; empty if `p` doesn't exist). */
  def files(f: FileSystem, p: Path): Seq[FileStatus] = {
    val out = Seq.newBuilder[FileStatus]
    def walk(dir: Path): Unit =
      f.listStatus(dir).foreach { s =>
        if (s.isDirectory) walk(s.getPath) else out += s
      }
    if (f.exists(p)) {
      val root = f.getFileStatus(p)
      if (root.isDirectory) walk(p) else out += root
    }
    out.result()
  }
}
