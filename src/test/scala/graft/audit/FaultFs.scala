package graft.audit

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/** Local filesystem with an injectable rename fault — the object-store
  * failure mode (a rename that returns false mid-file-surgery) made
  * deterministic, so the two-phase rollback arms in `Writers` can be
  * pinned by tests instead of trusted. Register under the `faultfs`
  * scheme via `fs.faultfs.impl`; the predicate is static state because
  * Hadoop caches one FileSystem instance per scheme and local-mode
  * executors share the JVM.
  */
class FaultFs extends RawLocalFileSystem {
  override def getUri: URI = FaultFs.SchemeUri

  override def rename(src: Path, dst: Path): Boolean = {
    // record every rename so specs can assert what a commit path DOES
    // (e.g. the versioned pointer swap must never rename a table
    // directory — on S3 proper that is a non-atomic O(bytes) copy)
    if (FaultFs.recordRenames) FaultFs.renames.add((src.toString,
      dst.toString, try getFileStatus(src).isDirectory
                    catch { case _: java.io.IOException => false }))
    if (FaultFs.failWhen(src, dst)) false else super.rename(src, dst)
  }

  // RawLocalFileSystem's DeprecatedRawLocalFileStatus loads permissions
  // LAZILY via `new java.io.File(path.toUri)`, which rejects any scheme
  // other than file: — copy statuses with permissions pre-filled so the
  // lazy load never runs against faultfs-qualified paths
  private def eager(s: FileStatus): FileStatus =
    new FileStatus(s.getLen, s.isDirectory, s.getReplication, s.getBlockSize,
      s.getModificationTime, s.getAccessTime, FsPermission.getDefault,
      "", "", s.getPath)

  override def getFileStatus(f: Path): FileStatus = eager(super.getFileStatus(f))

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).map(eager)
}

object FaultFs {
  val SchemeUri: URI = URI.create("faultfs:///")

  @volatile var failWhen: (Path, Path) => Boolean = (_, _) => false

  /** When set, every rename is recorded as (src, dst, srcIsDirectory). */
  @volatile var recordRenames: Boolean = false
  val renames = new java.util.concurrent.ConcurrentLinkedQueue[
    (String, String, Boolean)]()

  def reset(): Unit = {
    failWhen = (_, _) => false
    recordRenames = false
    renames.clear()
  }
}
