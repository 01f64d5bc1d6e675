package graft.tools

import java.net.URI

import org.apache.hadoop.fs.{FileUtil, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Local-disk FileSystem with OBJECT-STORE semantics, for specs that must
  * prove the index maintenance plane's durability story does not secretly
  * rest on POSIX rename:
  *
  *  - `rename` is COPY + DELETE (non-atomic, like S3A): a reader can
  *    observe the missing-destination window, and two renames can
  *    interleave — exactly the semantics the writer lease and the
  *    generation-pointer marker flips are documented against.
  *  - `create(..., overwrite = false)` is ATOMIC (an O_EXCL-style
  *    `Files.createFile`), like HDFS and strongly-consistent S3
  *    conditional writes — the one primitive `IndexFiles.withWriterLease`
  *    is allowed to rely on.
  *
  * Registered under the `graftmock:` scheme via
  * `conf.set("fs.graftmock.impl", classOf[MockObjectStoreFs].getName)`;
  * paths are ordinary local paths with the scheme swapped
  * (`graftmock:/tmp/...`).
  */
class MockObjectStoreFs extends RawLocalFileSystem {

  override def getUri: URI = URI.create("graftmock:///")

  // atomic existence gate: exactly one concurrent caller wins; losers get
  // the FileAlreadyExistsException (an IOException) the lease acquire path
  // expects. (RawLocalFileSystem's own overwrite=false is check-then-create
  // — the WriterLeaseSpec race measured 3 winners out of 8 through it.)
  private def exclusiveGate(f: Path, overwrite: Boolean): Unit =
    if (!overwrite) {
      val file = pathToFile(f)
      // FileSystem.create contracts include parent creation (parquet task
      // writers rely on it); only the final-component create is exclusive
      val parent = file.getParentFile
      if (parent != null && !parent.exists()) parent.mkdirs()
      java.nio.file.Files.createFile(file.toPath)
    }

  // both create entry points RawLocalFileSystem exposes — the plain
  // FileSystem.create(Path, boolean) chain lands on the Progressable
  // overload below, NOT the permission one
  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    exclusiveGate(f, overwrite)
    super.create(f, true, bufferSize, replication, blockSize, progress)
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    exclusiveGate(f, overwrite)
    super.create(f, permission, true, bufferSize, replication, blockSize,
      progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    if (!exists(src)) return false
    // S3A refuses a rename onto an existing FILE destination (returns
    // false) — modeling that drives callers like IndexFiles.writeString
    // through their delete + rename fallback, the branch those stores
    // actually take when rewriting a marker (previously the mock's
    // overwrite=true copy silently exercised only the POSIX-replace path)
    if (exists(dst) && getFileStatus(dst).isFile) return false
    // copy then delete — models an object store's non-atomic "rename":
    // a crash between the two calls leaves BOTH or NEITHER path present
    val copied = FileUtil.copy(this, src, this, dst,
      false /* deleteSource */, true /* overwrite */, getConf)
    copied && delete(src, true)
  }
}
