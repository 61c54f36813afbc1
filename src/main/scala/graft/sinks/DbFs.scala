package graft.sinks

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem face for DB-directory metadata operations (existence,
  * child listing, mkdirs, recursive delete) through the Hadoop
  * `FileSystem` API, so a `--db` can live on any Hadoop-supported store
  * (HDFS, S3A, GCS, local) — the deployment shape DEPLOY.md describes.
  * `java.io.File` on a db path silently answers "absent" for any
  * non-local scheme, which would route existing-store loads down the
  * fresh-db path; every verb-side db check goes through here instead.
  * INPUT files (the VCF being loaded, TSV/TOML configs, backup exports)
  * stay driver-local `java.io` by design, matching the reference CLI's
  * local-file arguments.
  *
  * All helpers resolve the FileSystem from the active session's Hadoop
  * conf per call — cheap (Hadoop caches one FS instance per scheme) and
  * correct across sessions with different conf.
  */
object DbFs {

  /** The session's Hadoop conf when one exists; a vanilla conf
    * otherwise — driver-side utilities (PHI registry IO, file hashing,
    * lock-path probes) must work without a session too. Vanilla serves
    * every built-in scheme; session-registered schemes need the session. */
  def hadoopConf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private def conf = hadoopConf

  private def fsFor(p: Path) = p.getFileSystem(conf)

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fsFor(p).exists(p)
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fsFor(p).mkdirs(p); ()
  }

  def deleteRecursive(path: String): Unit = {
    val p = new Path(path)
    // no exists pre-check: delete on an absent path answers false on
    // every Hadoop FS — one RPC instead of two on object stores
    fsFor(p).delete(p, true); ()
  }

  /** Immediate children, empty when the directory is absent. One RPC:
    * the absent case is the catch arm, not an exists pre-check (which
    * would double the metadata round-trips on the object stores this
    * face exists to support, and open a TOCTOU throw between calls). */
  def children(dir: String): Seq[FileStatus] = {
    val p = new Path(dir)
    try fsFor(p).listStatus(p).toSeq
    catch { case _: java.io.FileNotFoundException => Nil }
  }

  /** Names of immediate child DIRECTORIES (hive partition dirs). */
  def subdirNames(dir: String): Seq[String] =
    children(dir).filter(_.isDirectory).map(_.getPath.getName)

  /** Count of immediate child `.parquet` files (fragmentation probes). */
  def parquetFileCount(dir: String): Int =
    children(dir).count(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))

  /** Any immediate child plain `.parquet` file? (legacy FLAT layout
    * detection at a table root that is hive-partitioned when healthy.) */
  def hasFlatParquet(dir: String): Boolean = parquetFileCount(dir) > 0

  /** Any data-bearing child at all — a partition subdir or a flat
    * parquet file? (Marker-only directories answer false.) */
  def hasData(dir: String): Boolean =
    children(dir).exists(s =>
      s.isDirectory || s.getPath.getName.endsWith(".parquet"))

  /** Does any `.parquet` file exist anywhere under `dir`? */
  def hasParquetRecursive(dir: String): Boolean = {
    val p = new Path(dir)
    try {
      val it = fsFor(p).listFiles(p, true)
      while (it.hasNext)
        if (it.next().getPath.getName.endsWith(".parquet")) return true
      false
    } catch { case _: java.io.FileNotFoundException => false }
  }

  /** Basename of a path in any scheme. */
  def baseName(path: String): String = new Path(path).getName

  /** Read a small text file (sidecars, TOML registries); None if absent. */
  def readString(path: String): Option[String] = {
    val p = new Path(path)
    val in =
      try fsFor(p).open(p)
      catch { case _: java.io.FileNotFoundException => return None }
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      Some(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
    } finally in.close()
  }

  /** Write a small text file atomically: temp sibling + rename, so a
    * crash mid-write can never leave a truncated file under the final
    * name (the same committer-style discipline the parquet appends use). */
  def writeStringAtomic(path: String, content: String): Unit = {
    val p = new Path(path)
    val fs = fsFor(p)
    // UNIQUE temp name per write: a deterministic (per-thread) name
    // would let the next write clobber a previous failure's surviving
    // temp copy — the one copy the error message promised was preserved
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp-${Thread.currentThread().getId}-${System.nanoTime()}")
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    // rename first (atomic when dst is absent, and POSIX rename also
    // overwrites). On a store that refuses to clobber (HDFS), prefer
    // FileContext's rename with Options.Rename.OVERWRITE — atomic, so
    // there is never a window with NO file at the final name (a crash in
    // a delete-then-rename window would leave e.g. a missing PHI
    // registry that later scans silently treat as "builtins only").
    // Only when the scheme has no AbstractFileSystem binding (test
    // schemes, exotic stores) fall back to delete+retry; if the retry
    // ALSO fails, the temp file is the only surviving copy — keep it and
    // say where it is; deleting it here would destroy both the old
    // content (already removed) and the new.
    if (!fs.rename(tmp, p)) {
      val overwrote =
        try {
          val fc = org.apache.hadoop.fs.FileContext.getFileContext(
            p.toUri, fs.getConf)
          fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
          true
        } catch {
          case _: org.apache.hadoop.fs.UnsupportedFileSystemException => false
        }
      if (!overwrote) {
        if (fs.exists(p)) fs.delete(p, false)
        if (!fs.rename(tmp, p))
          sys.error(s"writeStringAtomic: cannot land $path — " +
            s"new content preserved at $tmp")
      }
    }
  }

  // ---- versioned-table layout (init-db --versioned-tables) ----
  // A table's data lives under `<table>.v-<token>/`, named by a small
  // `<table>.current` pointer file; swapping the table = rewriting the
  // pointer via writeStringAtomic — ONE small-file rename on every
  // store. Motivation: S3A's directory rename is a client-side
  // copy+delete, non-atomic and O(bytes), so the default rename-based
  // staged swap both costs a full table copy and exposes a torn window
  // on S3 proper. The pointer flip is O(1) and atomic everywhere.
  // Non-versioned dbs (the default, plain-parquet layout) have no
  // pointer files: resolution is one cheap negative lookup and the
  // plain path serves as its own physical dir.

  /** db-root marker that switches new swaps to the versioned layout. */
  def versionMarker(db: String): String = s"$db/.versioned_tables"

  /** Append-only audit tables, read/appended via plain paths by design —
    * never pointer-committed, even on a versioned db (see
    * Writers.replaceInPlaceAllStagedGrouped). */
  val AppendOnlyTables: Set[String] = Set("ledger", "audit_log")

  def pointerPath(table: String): String = s"$table.current"

  /** Logical table path → current physical directory: the pointer's
    * target when a `<table>.current` sidecar exists, the plain path
    * otherwise. Readers and appenders go through here; SWAP destinations
    * stay logical (Writers resolves versioning itself at commit). */
  def resolvePath(table: String): String =
    readString(pointerPath(table)) match {
      case Some(tok) if tok.trim.nonEmpty =>
        val v = s"$table.v-${tok.trim}"
        // dangling pointer (crash residue, or a table deleted out from
        // under its sidecar): fall back to the plain path so the store
        // self-heals instead of serving a missing directory
        if (exists(v)) v else table
      case _ => table
    }

  def resolveTable(db: String, name: String): String =
    resolvePath(s"$db/$name")

  /** True for a db-child name that is versioning plumbing (a version
    * directory or pointer sidecar), not a logical table — listings that
    * enumerate tables by name must skip these. */
  def isVersionArtifact(name: String): Boolean =
    name.contains(".v-") || name.endsWith(".current") ||
      name.endsWith(".prev")

  /** True for paths the local-filesystem driver-side faces can serve
    * directly (no scheme, or file:). */
  def isLocal(path: String): Boolean = {
    val u = new Path(path).toUri
    u.getScheme == null || u.getScheme == "file"
  }
}
