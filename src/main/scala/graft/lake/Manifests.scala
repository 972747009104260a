package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

/** Content-addressed manifest chunks: the scale layer under [[TableMeta]].
  *
  * The naive design — every retained snapshot embedding its FULL data-file
  * list (with per-column stats) inside one JSON document rewritten by every
  * commit — is O(retained-snapshots × files) per commit: at 100 TB
  * (~10^6 files) a single-row append rewrites gigabytes of JSON on the
  * driver. This is exactly why Iceberg has manifest files plus a manifest
  * list per snapshot, with unchanged manifests REUSED across snapshots
  * (ref: `Getting Started.ipynb:373` — the `files` metadata table walks
  * that structure).
  *
  * Design here, same capability re-expressed for a JSON root:
  *  - A snapshot's file list is the ordered concatenation of immutable
  *    chunk files `metadata/manifest-<sha256/16>.json`, named by content
  *    hash: identical content ⇒ identical name ⇒ the file is written once
  *    and shared by every snapshot that references it.
  *  - [[assign]] runs at commit time, BEFORE the version-file race: each
  *    new snapshot's file list is diffed against its parent's chunks with
  *    a greedy run-match — a parent chunk whose files all survive (in
  *    order) is reused by NAME (zero bytes written); a chunk that lost
  *    files is rewritten with the survivors; files not covered by any
  *    parent run (the appended/rewritten ones) form new chunks of at most
  *    `graft.manifest.target-files` entries. An append therefore writes
  *    exactly one new chunk of the appended files; a delete rewrites only
  *    the chunks it touched. Metadata bytes per commit are O(churn),
  *    independent of table file count and history (measured in
  *    SCALEPROBE.md).
  *  - The version JSON serializes snapshots with `files = []` and the
  *    chunk-name list; [[resolve]] re-inflates at load, reading each
  *    distinct chunk once through a process-wide immutable cache (chunks
  *    are content-addressed, so the cache needs no invalidation even
  *    across concurrent writers in other processes).
  *  - Losing a commit race can orphan freshly written chunks; they are
  *    content-addressed, so the retry usually re-references the same
  *    names, and stragglers are swept by `remove_orphan_files` alongside
  *    orphaned data files.
  */
object Manifests {

  /** Default max files per freshly written chunk; table property
    * `graft.manifest.target-files` overrides. Small enough to keep delete
    * rewrite amplification bounded, large enough that a 10^6-file table
    * resolves through ~10^3 chunk reads. */
  val DefaultTargetFiles = 1000

  def targetFiles(m: TableMeta): Int =
    m.properties.get("graft.manifest.target-files").flatMap(_.toIntOption)
      .filter(_ > 0).getOrElse(DefaultTargetFiles)

  // Process-wide caches keyed by absolute path. Chunks and lists are
  // immutable (content-addressed), so entries never invalidate — even
  // across concurrent writer processes; bounded only to keep long test
  // runs from accumulating unboundedly.
  private val cache = new ConcurrentHashMap[String, Seq[DataFile]]()
  private val listCache = new ConcurrentHashMap[String, Seq[String]]()
  private val deleteCache = new ConcurrentHashMap[String, DeleteManifestChunk]()
  private val MaxCacheEntries = 16384

  private def sha16(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes(StandardCharsets.UTF_8))
    d.take(8).map(b => f"$b%02x").mkString
  }

  private[lake] def chunkPath(metaDir: Path, name: String) = new Path(metaDir, name)

  private def readChunk(store: MetaStore, name: String): Seq[DataFile] = {
    val key = store.id + "/" + name
    val hit = cache.get(key)
    if (hit != null) return hit
    val files = Meta.chunkFromJson(store.read(name))
    if (cache.size < MaxCacheEntries) cache.put(key, files)
    files
  }

  /** Write a chunk if absent (content-addressed ⇒ an existing file already
    * holds these bytes). Uses the exclusive-publish protocol so a reader
    * never observes a partially written chunk; losing the race is fine. */
  private def writeChunk(store: MetaStore, name: String, json: String,
                         files: Seq[DataFile]): Unit = {
    if (!store.exists(name)) {
      store.putIfAbsent(name, json.getBytes(StandardCharsets.UTF_8))
      ()
    }
    val key = store.id + "/" + name
    if (cache.size < MaxCacheEntries) cache.put(key, files)
  }

  /** Content-addressed manifest-LIST file: the ordered chunk names of one
    * snapshot. The root document points here (one name per snapshot), so
    * root size is O(snapshots), not O(snapshots × chunks). */
  private def writeList(store: MetaStore, names: Seq[String]): String = {
    val json = Meta.listToJson(names)
    val listName = s"manifest-list-${sha16(json)}.json"
    if (!store.exists(listName)) {
      store.putIfAbsent(listName, json.getBytes(StandardCharsets.UTF_8))
      ()
    }
    if (listCache.size < MaxCacheEntries) listCache.put(store.id + "/" + listName, names)
    listName
  }

  private def readList(store: MetaStore, listName: String): Seq[String] = {
    val key = store.id + "/" + listName
    val hit = listCache.get(key)
    if (hit != null) return hit
    val names = Meta.listFromJson(store.read(listName))
    if (listCache.size < MaxCacheEntries) listCache.put(key, names)
    names
  }

  /** Content-addressed chunk holding one snapshot's DELETE-file list
    * (merge-on-read positional deletes). Appends don't change the delete
    * set, so consecutive snapshots share the chunk by name and the root
    * document carries one name per snapshot — the same reuse argument as
    * data-manifest chunks, sized by churn-since-compaction rather than by
    * table file count. */
  private def writeDeleteManifest(store: MetaStore,
                                  dels: Seq[DeleteFile],
                                  eqDels: Seq[EqualityDeleteFile]): String = {
    val json = Meta.deleteChunkToJson(dels, eqDels)
    val name = s"manifest-del-${sha16(json)}.json"
    if (!store.exists(name)) {
      store.putIfAbsent(name, json.getBytes(StandardCharsets.UTF_8))
      ()
    }
    if (deleteCache.size < MaxCacheEntries)
      deleteCache.put(store.id + "/" + name, DeleteManifestChunk(dels, eqDels))
    name
  }

  private def readDeleteManifest(store: MetaStore,
                                 name: String): DeleteManifestChunk = {
    val key = store.id + "/" + name
    val hit = deleteCache.get(key)
    if (hit != null) return hit
    val json = store.read(name)
    val chunk = Meta.deleteChunkFromJson(json)
    val norm = DeleteManifestChunk(
      Option(chunk.deleteFiles).getOrElse(Seq.empty),
      Option(chunk.eqDeleteFiles).getOrElse(Seq.empty))
    if (deleteCache.size < MaxCacheEntries) deleteCache.put(key, norm)
    norm
  }

  /** Chunk `files` against `parentChunks` (name → contents, in parent
    * order): greedy maximal-run reuse preserving file order exactly.
    * Returns the chunk-name list plus the chunks that must be written
    * (name → (json, files)). */
  private[lake] def chunksFor(files: IndexedSeq[DataFile],
                              parentChunks: Seq[(String, Seq[DataFile])],
                              target: Int): (Seq[String], Seq[(String, (String, Seq[DataFile]))]) = {
    val byFirst: Map[String, (String, Seq[DataFile])] =
      parentChunks.filter(_._2.nonEmpty).map(c => c._2.head.path -> c).toMap
    val out = Seq.newBuilder[String]
    val fresh = Seq.newBuilder[(String, (String, Seq[DataFile]))]
    val pending = scala.collection.mutable.ArrayBuffer[DataFile]()
    def flush(): Unit = {
      pending.grouped(target).foreach { g =>
        val slice = g.toSeq
        val json = Meta.chunkToJson(slice)
        val name = s"manifest-${sha16(json)}.json"
        out += name
        fresh += name -> (json, slice)
      }
      pending.clear()
    }
    var i = 0
    while (i < files.length) {
      byFirst.get(files(i).path) match {
        case Some((name, cf)) if i + cf.length <= files.length &&
            cf.indices.forall(j => files(i + j) == cf(j)) =>
          flush(); out += name; i += cf.length
        case _ =>
          pending += files(i); i += 1
      }
    }
    flush()
    (out.result(), fresh.result().distinctBy(_._1))
  }

  /** Fill `manifests` on every snapshot that lacks one, writing the needed
    * chunk files, and return (inMemory, persisted): the former keeps
    * resolved `files` for immediate use, the latter has `files` stripped
    * for the version JSON. Must run before the version-file publish so a
    * committed version never references a missing chunk. */
  private[lake] def assign(next: TableMeta, store: MetaStore): (TableMeta, TableMeta) = {
    val target = targetFiles(next)
    val byId = scala.collection.mutable.HashMap[Long, Snapshot]()
    val assigned = next.snapshots.map { s0 =>
      val s1 = if (s0.files == null) s0.copy(files = Seq.empty) else s0
      // delete-manifest assignment is independent of data-chunk assignment:
      // content-addressing makes an unchanged delete set a zero-byte reuse
      val s =
        if ((s1.deleteFiles.nonEmpty || s1.eqDeleteFiles.nonEmpty) &&
            s1.deleteManifest.isEmpty)
          s1.copy(deleteManifest = Some(
            writeDeleteManifest(store, s1.deleteFiles, s1.eqDeleteFiles)))
        else s1
      val done =
        if (s.files.isEmpty || s.manifestList.isDefined) s
        else {
          // pre-set manifests (rewrite_manifests) keep their chunking;
          // otherwise diff against the parent's chunks for run reuse
          val names =
            if (s.manifests.nonEmpty) s.manifests
            else {
              val parent = s.parentId.flatMap(byId.get)
              val parentChunks: Seq[(String, Seq[DataFile])] =
                parent.map(_.manifests.map(n => n -> readChunk(store, n)))
                  .getOrElse(Seq.empty)
              val (ns, fresh) = chunksFor(s.files.toIndexedSeq, parentChunks, target)
              fresh.foreach { case (name, (json, slice)) =>
                writeChunk(store, name, json, slice)
              }
              ns
            }
          s.copy(manifests = names,
            manifestList = Some(writeList(store, names)))
        }
      byId(done.snapshotId) = done
      done
    }
    val inMemory = next.copy(snapshots = assigned)
    val persisted = inMemory.copy(snapshots = assigned.map(
      _.copy(files = Seq.empty, manifests = Seq.empty,
        deleteFiles = Seq.empty, eqDeleteFiles = Seq.empty)))
    (inMemory, persisted)
  }

  /** Re-inflate `manifests` + `files` from the manifest list and chunks on
    * a freshly parsed meta. */
  private[lake] def resolve(raw: TableMeta, store: MetaStore): TableMeta =
    raw.copy(snapshots = raw.snapshots.map { s0 =>
      val files = Option(s0.files).getOrElse(Seq.empty)
      val names0 = Option(s0.manifests).getOrElse(Seq.empty)
      val dels0 = Option(s0.deleteFiles).getOrElse(Seq.empty)
      val eqDels0 = Option(s0.eqDeleteFiles).getOrElse(Seq.empty)
      val s1 = if (s0.files == null || s0.manifests == null ||
          s0.deleteFiles == null || s0.eqDeleteFiles == null)
        s0.copy(files = files, manifests = names0,
          deleteFiles = dels0, eqDeleteFiles = eqDels0) else s0
      val s =
        if (s1.deleteFiles.isEmpty && s1.eqDeleteFiles.isEmpty &&
            s1.deleteManifest.isDefined) {
          val chunk = readDeleteManifest(store, s1.deleteManifest.get)
          s1.copy(deleteFiles = chunk.deleteFiles,
            eqDeleteFiles = chunk.eqDeleteFiles)
        } else s1
      if (s.files.nonEmpty) s
      else {
        val names =
          if (s.manifests.nonEmpty) s.manifests
          else s.manifestList.map(readList(store, _)).getOrElse(Seq.empty)
        if (names.isEmpty) s
        else s.copy(manifests = names,
          files = names.flatMap(n => readChunk(store, n)))
      }
    })

  /** Ideal fresh chunking (no parent reuse) — the `rewrite_manifests`
    * target. Returns the names plus chunks to write. */
  private[lake] def compactChunks(files: IndexedSeq[DataFile], target: Int)
      : (Seq[String], Seq[(String, (String, Seq[DataFile]))]) =
    chunksFor(files, Seq.empty, target)

  private[lake] def writeChunks(store: MetaStore,
                                fresh: Seq[(String, (String, Seq[DataFile]))]): Unit =
    fresh.foreach { case (name, (json, slice)) => writeChunk(store, name, json, slice) }

  /** Probe hook: drop the process-wide caches so a load measures true
    * cold-resolve cost (one filesystem read per distinct chunk). */
  private[lake] def clearCaches(): Unit = {
    cache.clear(); listCache.clear(); deleteCache.clear()
  }
}
