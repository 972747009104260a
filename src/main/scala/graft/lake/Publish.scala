package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

import java.util.UUID
import java.util.concurrent.ConcurrentHashMap

/** Exclusive-publish strategies for metadata files: atomically make a
  * COMPLETE file visible at `path`, returning false (not a partial file)
  * when a concurrent publisher already won the slot.
  *
  * This is the commit-protocol seam the reference delegates to its catalog
  * service (ref: docker-compose.yml:35-48 — the REST catalog serializes
  * commits in one process; we serialize through the filesystem instead, so
  * the filesystem primitive must provide the atomicity).
  *
  * `fs.create(path, overwrite = false)` is NOT that primitive, twice over:
  * the file becomes visible (and wins the version slot) BEFORE its bytes
  * are written, so a concurrent reader can parse an empty or truncated
  * v{N}.json — and the exists-check inside create is check-then-act, so two
  * writers can both "win" and interleave bytes. [[PublishSpec]] demonstrates
  * both failure modes on a deliberately non-atomic filesystem and proves the
  * strategies below close them.
  */
trait PublishStrategy {
  /** Publish `bytes` at `path` iff nothing is there; true = this caller won.
    * Losers MUST leave the winner's content untouched. */
  def publish(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean
}

object Publish {

  /** Local filesystems: write a temp file, hard-link it into place.
    * link(2) is atomic, exposes the complete content in one step, and
    * fails with EEXIST for the loser. */
  object HardLink extends PublishStrategy {
    def publish(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean = {
      val dir = java.nio.file.Paths.get(path.getParent.toUri.getPath)
      java.nio.file.Files.createDirectories(dir)
      val tmp = dir.resolve(s".${path.getName}.${UUID.randomUUID().toString.take(8)}.tmp")
      java.nio.file.Files.write(tmp, bytes)
      try {
        java.nio.file.Files.createLink(java.nio.file.Paths.get(path.toUri.getPath), tmp)
        true
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => false
      } finally { java.nio.file.Files.deleteIfExists(tmp); () }
    }
  }

  /** Stores with atomic no-replace rename (HDFS and HDFS-likes): write the
    * full content to a hidden temp name, then rename into the target slot.
    * The rename exposes complete bytes in one step; a loser's rename
    * returns false (HDFS rename does not clobber an existing destination)
    * and its temp file is removed. */
  object TmpRename extends PublishStrategy {
    def publish(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean = {
      if (fs.exists(path)) return false // cheap fast-path; rename still decides
      val tmp = new Path(path.getParent,
        s".${path.getName}.${UUID.randomUUID().toString.take(8)}.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      try {
        val won = try fs.rename(tmp, path) catch { case _: java.io.IOException => false }
        // some FS implementations return true on clobbering renames; a
        // post-check keeps them honest only when they also expose the temp
        won && !fs.exists(tmp)
      } finally { if (fs.exists(tmp)) fs.delete(tmp, false); () }
    }
  }

  /** Object stores with a conditional-put primitive (S3 `If-None-Match: *`,
    * GCS `ifGenerationMatch=0`, ABFS ETag preconditions): adapt the store's
    * native put-if-absent. The closure must return false — without
    * publishing anything — when the precondition fails. */
  final class ConditionalPut(putIfAbsent: (FileSystem, Path, Array[Byte]) => Boolean)
      extends PublishStrategy {
    def publish(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean =
      putIfAbsent(fs, path, bytes)
  }

  /** Per-scheme strategy registry. `file` → [[HardLink]]; anything else
    * defaults to [[TmpRename]] (correct wherever rename is atomic and
    * non-clobbering — HDFS contract). Deployments on stores WITHOUT atomic
    * rename must register a [[ConditionalPut]] for their scheme; that is a
    * deliberate registration, not a silent best-effort fallback. */
  private val registry = new ConcurrentHashMap[String, PublishStrategy]()

  def register(scheme: String, strategy: PublishStrategy): Unit =
    registry.put(scheme, strategy)

  def forScheme(scheme: String): PublishStrategy =
    Option(registry.get(scheme)).getOrElse(
      if ("file" == scheme) HardLink else TmpRename)

  def exclusive(fs: FileSystem, path: Path, bytes: Array[Byte]): Boolean =
    forScheme(fs.getScheme).publish(fs, path, bytes)
}
