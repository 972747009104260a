package graft.lake

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.net.URI

/** A deliberately treacherous "object store" for commit-protocol tests:
  * local storage under a `fakeos://` scheme whose `create(overwrite =
  * false)` has BOTH failure modes the best-effort exclusive create has on
  * real stores —
  *   - check-then-act: the exists check and the create are not atomic
  *     (a deterministic sleep sits between them so racing writers all
  *     pass the check and all "win");
  *   - visible-before-bytes: the path exists, empty, as soon as create
  *     returns, while content streams in afterwards (inherent to the
  *     local backing store — same as S3 multipart or a plain HDFS
  *     create).
  * Its `rename`, however, is ATOMIC and NON-CLOBBERING (hard-link +
  * unlink — the HDFS rename contract), which is exactly the primitive
  * [[Publish.TmpRename]] needs: PublishSpec proves the broken create
  * loses data and the rename protocol never does.
  *
  * Registered via `fs.fakeos.impl`; must stay a top-level class with a
  * no-arg constructor (Hadoop instantiates it reflectively). */
class FakeObjectStoreFS extends RawLocalFileSystem {

  override def getScheme: String = "fakeos"
  override def getUri: URI = URI.create("fakeos:///")

  // RawLocalFileSystem's lazy permission loading does `new File(uri)` on
  // the status path, which rejects any scheme but "file" — return plain,
  // eagerly populated statuses instead (an object store has no POSIX
  // permission bits to lazy-load anyway).
  override def getFileStatus(f: Path): org.apache.hadoop.fs.FileStatus = {
    val file = pathToFile(f)
    if (!file.exists())
      throw new java.io.FileNotFoundException(s"File $f does not exist")
    new org.apache.hadoop.fs.FileStatus(file.length(), file.isDirectory, 1,
      getDefaultBlockSize(f), file.lastModified(), makeQualified(f))
  }

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    val file = pathToFile(f)
    if (!file.exists())
      throw new java.io.FileNotFoundException(s"File $f does not exist")
    if (file.isFile) Array(getFileStatus(f))
    else file.listFiles().map(c => getFileStatus(new Path(f, c.getName)))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    if (!overwrite) {
      if (exists(f)) throw new java.io.IOException(s"already exists: $f")
      // widen the check-then-act window so the race is deterministic
      Thread.sleep(20)
    }
    super.create(f, permission, true, bufferSize, replication, blockSize, progress)
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val s = pathToFile(src).toPath
    val d = pathToFile(dst).toPath
    try {
      if (java.nio.file.Files.isDirectory(s)) {
        // directory renames (Spark's output committer): move without
        // REPLACE_EXISTING — throws if dst exists, i.e. non-clobbering
        java.nio.file.Files.move(s, d)
      } else {
        java.nio.file.Files.createLink(d, s) // atomic; EEXIST if dst present
        java.nio.file.Files.delete(s)
      }
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
      case _: java.io.IOException => false
    }
  }
}
