package graft.lake

import org.apache.hadoop.fs.{FileSystem, Path}

import java.nio.charset.StandardCharsets

/** The metadata-I/O seam of the table format: everything under
  * `<table>/metadata/` — version root documents, the version hint, and
  * content-addressed manifest chunks — reads and writes through this
  * trait, while DATA files keep going straight to shared storage. This is
  * exactly the boundary the reference draws with its REST catalog
  * (docker-compose.yml:35-48): engines talk to a catalog service for
  * metadata authority and to the object store for bytes.
  *
  * Two implementations:
  *   - [[FsMetaStore]] — the default: metadata lives beside the data under
  *     the table location, atomicity from the per-scheme [[Publish]]
  *     strategy (hard link / atomic rename / conditional put).
  *   - [[HttpMetaStore]] — the wire-protocol client: metadata lives in a
  *     [[graft.lake.catalog.CatalogServer]]'s private root, reached over
  *     plain HTTP; the CONDITIONAL PUT that linearizes commits happens in
  *     the server process. A client resolves and commits tables while
  *     holding no filesystem path to any metadata file.
  *
  * Contract notes: `putIfAbsent` must expose a COMPLETE file or nothing
  * (readers may never observe partial bytes) and return false — leaving
  * the winner untouched — when the name is already taken; names are flat
  * (no directories) and match `[A-Za-z0-9._-]+`.
  */
trait MetaStore {
  /** Stable cache identity: two stores with the same id serve the same
    * bytes (the resolved-meta and chunk caches key on `id + name`). */
  def id: String
  def read(name: String): String
  def exists(name: String): Boolean
  /** Atomic put-if-absent of a complete file; true = this caller won. */
  def putIfAbsent(name: String, bytes: Array[Byte]): Boolean
  /** Unconditional overwrite — the advisory version hint only. */
  def putOverwrite(name: String, bytes: Array[Byte]): Unit
  def delete(name: String): Unit
  /** (name, modified-ms) of every metadata file — metadata_log_entries
    * and the orphan-chunk sweep. */
  def list(): Seq[(String, Long)]
  def modifiedMs(name: String): Long
  /** A store of the SAME kind and authority for a sibling table at
    * `siblingLocation` — tables reference siblings by LOCATION (the MV
    * routing index, a view's recorded base location), and resolving one
    * must stay inside whatever metadata authority resolved THIS table:
    * filesystem siblings stay filesystem, wire-catalog siblings resolve
    * through the same server. `myLocation` is the location of the table
    * this store serves — the anchor that maps locations back to catalog
    * identifiers for authorities that key tables by ident, not path. */
  def sibling(myLocation: String, siblingLocation: String): MetaStore
  /** The latest committed root document in ONE authority round trip —
    * `(version, root json)` — or None when the authority has no cheaper
    * answer than probing (filesystem stores) or the table doesn't exist.
    * This is the REST-catalog `loadTable` shape: without it a wire client
    * pays hint-read + forward-probe (2+ round trips) per `meta` access. */
  def resolveLatest(): Option[(Int, String)] = None
}

/** Filesystem-backed metadata under `<location>/metadata` — the default
  * store, byte-identical to the pre-seam layout. */
final class FsMetaStore(fs: FileSystem, location: String) extends MetaStore {
  private val metaDir = new Path(location, "metadata")
  private def p(name: String) = new Path(metaDir, name)

  override def id: String = location

  override def read(name: String): String = {
    val in = fs.open(p(name))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  override def exists(name: String): Boolean = fs.exists(p(name))

  override def putIfAbsent(name: String, bytes: Array[Byte]): Boolean =
    Publish.exclusive(fs, p(name), bytes)

  override def putOverwrite(name: String, bytes: Array[Byte]): Unit = {
    try {
      val out = fs.create(p(name), true)
      try out.write(bytes) finally out.close()
    } catch { case _: java.io.IOException => () } // hint is advisory
  }

  override def delete(name: String): Unit = { fs.delete(p(name), false); () }

  override def list(): Seq[(String, Long)] = {
    // listStatus, NOT listFiles: listFiles materializes LocatedFileStatus
    // (per-file block locations + checksum stats — measured ~4 ms/file on
    // a local filesystem, 1.5 s for a 360-object store), while a plain
    // status listing is one readdir. Names and mtimes are all we serve.
    if (!fs.exists(metaDir)) return Seq.empty
    fs.listStatus(metaDir).toSeq.filter(_.isFile)
      .map(st => (st.getPath.getName, st.getModificationTime))
  }

  override def modifiedMs(name: String): Long =
    fs.getFileStatus(p(name)).getModificationTime

  override def sibling(myLocation: String, siblingLocation: String): MetaStore =
    new FsMetaStore(fs, siblingLocation)
}

/** Wire-protocol metadata client: every operation is one HTTP round trip
  * to a [[graft.lake.catalog.CatalogServer]]; the commit-deciding
  * conditional put runs server-side (POST → 200 won / 409 lost), so two
  * engines that share nothing but the server URI serialize exactly like
  * two writers sharing a filesystem do through [[Publish]]. */
final class HttpMetaStore(val baseUri: String, val ident: String) extends MetaStore {
  private val base = baseUri.stripSuffix("/")
  private def client = HttpMetaStore.sharedClient

  private def uri(tail: String) =
    java.net.URI.create(s"$base/t/$ident/$tail")

  // bounded per-request timeout: a dead catalog endpoint must surface as
  // an error the commit retry loop / caller can act on, never a hang
  private def send(b: java.net.http.HttpRequest.Builder): java.net.http.HttpResponse[Array[Byte]] =
    client.send(b.timeout(java.time.Duration.ofSeconds(30)).build(),
      java.net.http.HttpResponse.BodyHandlers.ofByteArray())

  override def id: String = s"$base!$ident"

  override def read(name: String): String = {
    val r = send(java.net.http.HttpRequest.newBuilder(uri(s"f/$name")).GET())
    if (r.statusCode() == 404)
      throw new java.io.FileNotFoundException(s"$ident/$name on $base")
    require(r.statusCode() == 200, s"GET $ident/$name -> ${r.statusCode()}")
    new String(r.body(), StandardCharsets.UTF_8)
  }

  override def exists(name: String): Boolean =
    send(java.net.http.HttpRequest.newBuilder(uri(s"f/$name"))
      .method("HEAD", java.net.http.HttpRequest.BodyPublishers.noBody()))
      .statusCode() == 200

  override def putIfAbsent(name: String, bytes: Array[Byte]): Boolean = {
    val r = send(java.net.http.HttpRequest.newBuilder(uri(s"f/$name"))
      .POST(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bytes)))
    r.statusCode() match {
      case 200 => true
      case 409 => false
      case c => throw new IllegalStateException(s"POST $ident/$name -> $c")
    }
  }

  override def putOverwrite(name: String, bytes: Array[Byte]): Unit = {
    val r = send(java.net.http.HttpRequest.newBuilder(uri(s"f/$name"))
      .PUT(java.net.http.HttpRequest.BodyPublishers.ofByteArray(bytes)))
    require(r.statusCode() == 200, s"PUT $ident/$name -> ${r.statusCode()}")
  }

  override def delete(name: String): Unit = {
    send(java.net.http.HttpRequest.newBuilder(uri(s"f/$name")).DELETE())
    ()
  }

  override def list(): Seq[(String, Long)] = {
    val r = send(java.net.http.HttpRequest.newBuilder(uri("list")).GET())
    if (r.statusCode() == 404) return Seq.empty
    require(r.statusCode() == 200, s"GET $ident/list -> ${r.statusCode()}")
    new String(r.body(), StandardCharsets.UTF_8).split("\n").toSeq
      .filter(_.nonEmpty).map { line =>
        val Array(n, ts) = line.split("\t", 2); (n, ts.toLong)
      }
  }

  override def modifiedMs(name: String): Long = {
    // one /stat round trip per lookup — NOT a full listing (r12: the
    // metadata_log_entries table calls this once per version file)
    val r = send(java.net.http.HttpRequest.newBuilder(uri(s"stat/$name")).GET())
    if (r.statusCode() == 404)
      throw new java.io.FileNotFoundException(s"$ident/$name on $base")
    require(r.statusCode() == 200, s"GET $ident/stat/$name -> ${r.statusCode()}")
    new String(r.body(), StandardCharsets.UTF_8).trim.toLong
  }

  override def resolveLatest(): Option[(Int, String)] = {
    val r = send(java.net.http.HttpRequest.newBuilder(uri("resolve")).GET())
    if (r.statusCode() == 404) return None
    require(r.statusCode() == 200, s"GET $ident/resolve -> ${r.statusCode()}")
    val body = new String(r.body(), StandardCharsets.UTF_8)
    val nl = body.indexOf('\n')
    Some((body.substring(0, nl).toInt, body.substring(nl + 1)))
  }

  /** Sibling idents come from the LOCATION layout the owning catalog
    * writes (`<warehouse>/<db>/<table>`): my own ident's path form anchors
    * the warehouse root, and the sibling's location relative to that root
    * IS its ident. A location outside the warehouse has no identity at
    * this authority — refuse rather than guess. */
  override def sibling(myLocation: String, siblingLocation: String): MetaStore = {
    val myPath = "/" + ident.replace('.', '/')
    require(myLocation.endsWith(myPath),
      s"cannot anchor warehouse: $myLocation does not end with $myPath")
    val warehouse = myLocation.dropRight(myPath.length)
    require(siblingLocation.startsWith(warehouse + "/"),
      s"sibling $siblingLocation is outside warehouse $warehouse — " +
        s"no identity at catalog service $base")
    new HttpMetaStore(base,
      siblingLocation.drop(warehouse.length + 1).replace('/', '.'))
  }

  /** Drop every metadata file of the table on the server (client-mode
    * DROP TABLE: data-file removal stays the engine's job on shared
    * storage; metadata authority is the server's). */
  def dropTable(): Unit = {
    val r = send(java.net.http.HttpRequest.newBuilder(uri("all")).DELETE())
    require(r.statusCode() == 200, s"DELETE $ident -> ${r.statusCode()}")
  }
}

object HttpMetaStore {
  /** One JVM-wide client (thread-safe, keep-alive connection pool): a
    * table handle is cheap to create and an engine creates MANY — sibling
    * resolution, catalog loads, per-query metadata reads. A per-handle
    * client would open a fresh TCP pool each time; at fleet scale the
    * catalog endpoint sees connection churn instead of reuse. */
  private[lake] lazy val sharedClient: java.net.http.HttpClient =
    java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(10)).build()
}
