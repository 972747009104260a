package graft.lake.catalog

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.util.Using

/** Catalog-as-a-service: a dependency-free (JDK-only) HTTP server that is
  * the METADATA AUTHORITY for a set of lake tables — the role the
  * reference delegates to its REST catalog container
  * (docker-compose.yml:35-48, spark-defaults.conf:22-29). Engines resolve
  * versions, read root documents / manifest chunks, and COMMIT through
  * this process; data files never pass through it (they live on shared
  * storage, exactly the REST-catalog + object-store split).
  *
  * Metadata lives under a PRIVATE `metadataRoot` the clients never learn
  * — `metadataRoot/<db>/<table>/<name>` — which is what makes the
  * wire-protocol tests honest: a client that can read a table has
  * provably fetched every metadata byte over HTTP.
  *
  * Protocol (all bodies are the raw file bytes):
  * {{{
  *   GET    /t/{db.table}/f/{name}   -> 200 bytes | 404
  *   HEAD   /t/{db.table}/f/{name}   -> 200 | 404
  *   POST   /t/{db.table}/f/{name}   -> 200 (won) | 409 (name taken)   [conditional put]
  *   PUT    /t/{db.table}/f/{name}   -> 200                            [hint overwrite]
  *   DELETE /t/{db.table}/f/{name}   -> 200
  *   GET    /t/{db.table}/list       -> 200 "name\tmtimeMs\n"*
  *   GET    /t/{db.table}/stat/{name}-> 200 "mtimeMs" | 404
  *   GET    /t/{db.table}/resolve    -> 200 "version\n<root json>" | 404
  *   DELETE /t/{db.table}/all        -> 200                            [drop table metadata]
  *   GET    /tables                  -> 200 "db.table\n"*
  * }}}
  *
  * The conditional put is the commit protocol's linearization point: the
  * server publishes via temp-file + hard link (atomic, complete-or-
  * nothing, EEXIST for the loser — the same primitive [[graft.lake
  * .Publish.HardLink]] uses), so concurrent committers from ANY number of
  * client processes serialize here, and a racing reader can never observe
  * a torn root document. Per-request work is one small-file filesystem
  * op — the server stays metadata-sized while the engines do all data
  * work; at fleet scale this is the same stateless-front/durable-store
  * shape real REST catalogs deploy. */
final class CatalogServer(metadataRoot: String, port: Int = 0) {

  private val root = Paths.get(metadataRoot)
  CatalogServer.ensureNoDelay()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  // daemon workers + explicit shutdown in stop(): an embedding process
  // (probe mains, tests) must be able to exit after stop()
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r, "catalog-server"); t.setDaemon(true); t })
  server.setExecutor(pool)

  /** Total requests served — lets probes/tests assert round-trip counts. */
  val requestCount = new java.util.concurrent.atomic.AtomicLong(0)

  private val SafeName = "[A-Za-z0-9._-]+".r
  private def safe(s: String): Boolean =
    SafeName.matches(s) && !s.contains("..")

  private def tableDir(ident: String): Option[Path] = {
    val parts = ident.split("\\.")
    if (parts.length < 2 || !parts.forall(safe)) None
    else Some(parts.foldLeft(root)(_.resolve(_)))
  }

  private def respond(x: HttpExchange, code: Int,
                      body: Array[Byte] = Array.empty): Unit = {
    x.sendResponseHeaders(code, if (body.isEmpty) -1 else body.length.toLong)
    if (body.nonEmpty) { val os = x.getResponseBody; os.write(body); os.close() }
    x.close()
  }

  /** Atomic complete-or-nothing put-if-absent: temp write + hard link. */
  private def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
    Files.createDirectories(target.getParent)
    val tmp = target.getParent.resolve(
      s".${target.getFileName}.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    Files.write(tmp, bytes)
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }

  server.createContext("/tables", (x: HttpExchange) => {
    requestCount.incrementAndGet()
    try {
      if (x.getRequestMethod != "GET") respond(x, 405)
      else {
        val out = new StringBuilder
        if (Files.isDirectory(root)) {
          Using.resource(Files.list(root)) { dbs =>
            dbs.forEach { db =>
              if (Files.isDirectory(db)) Using.resource(Files.list(db)) { ts =>
                ts.forEach { t =>
                  if (Files.exists(t.resolve("v1.json")))
                    out.append(s"${db.getFileName}.${t.getFileName}\n")
                }
              }
            }
          }
        }
        respond(x, 200, out.toString.getBytes(StandardCharsets.UTF_8))
      }
    } catch { case _: Exception => respond(x, 500) }
  })

  server.createContext("/t/", (x: HttpExchange) => {
    requestCount.incrementAndGet()
    try {
      val segs = x.getRequestURI.getPath.stripPrefix("/t/").split("/")
      (segs.toSeq, x.getRequestMethod) match {
        case (Seq(ident, "f", name), method) if safe(name) =>
          tableDir(ident) match {
            case None => respond(x, 400)
            case Some(dir) =>
              val f = dir.resolve(name)
              method match {
                case "GET" =>
                  if (Files.exists(f)) respond(x, 200, Files.readAllBytes(f))
                  else respond(x, 404)
                case "HEAD" =>
                  respond(x, if (Files.exists(f)) 200 else 404)
                case "POST" =>
                  val body = x.getRequestBody.readAllBytes()
                  respond(x, if (putIfAbsent(f, body)) 200 else 409)
                case "PUT" =>
                  val body = x.getRequestBody.readAllBytes()
                  Files.createDirectories(f.getParent)
                  Files.write(f, body)
                  respond(x, 200)
                case "DELETE" =>
                  Files.deleteIfExists(f)
                  respond(x, 200)
                case _ => respond(x, 405)
              }
          }
        case (Seq(ident, "resolve"), "GET") =>
          // latest committed root in ONE round trip (the REST-catalog
          // loadTable shape, r12): version files are immutable and never
          // deleted, so max(vN) IS the current version
          tableDir(ident) match {
            case None => respond(x, 400)
            case Some(dir) if !Files.isDirectory(dir) => respond(x, 404)
            case Some(dir) =>
              val V = "v(\\d+)\\.json".r
              var best = 0
              Using.resource(Files.list(dir))(_.forEach { f =>
                f.getFileName.toString match {
                  case V(n) => best = math.max(best, n.toInt)
                  case _ => ()
                }
              })
              if (best == 0) respond(x, 404)
              else {
                val bytes = Files.readAllBytes(dir.resolve(s"v$best.json"))
                val head = s"$best\n".getBytes(StandardCharsets.UTF_8)
                respond(x, 200, head ++ bytes)
              }
          }
        case (Seq(ident, "stat", name), "GET") if safe(name) =>
          // single-file mtime: keeps the client's modifiedMs O(1) instead
          // of a full listing per lookup (r12)
          tableDir(ident) match {
            case None => respond(x, 400)
            case Some(dir) =>
              val f = dir.resolve(name)
              if (Files.isRegularFile(f))
                respond(x, 200, Files.getLastModifiedTime(f).toMillis.toString
                  .getBytes(StandardCharsets.UTF_8))
              else respond(x, 404)
          }
        case (Seq(ident, "list"), "GET") =>
          tableDir(ident) match {
            case None => respond(x, 400)
            case Some(dir) if !Files.isDirectory(dir) => respond(x, 404)
            case Some(dir) =>
              val out = new StringBuilder
              Using.resource(Files.list(dir)) { fs =>
                fs.forEach { f =>
                  if (Files.isRegularFile(f) && !f.getFileName.toString.startsWith("."))
                    out.append(s"${f.getFileName}\t${Files.getLastModifiedTime(f).toMillis}\n")
                }
              }
              respond(x, 200, out.toString.getBytes(StandardCharsets.UTF_8))
          }
        case (Seq(ident, "all"), "DELETE") =>
          tableDir(ident) match {
            case None => respond(x, 400)
            case Some(dir) =>
              if (Files.isDirectory(dir)) {
                Using.resource(Files.list(dir))(
                  _.forEach(f => { Files.deleteIfExists(f); () }))
                Files.deleteIfExists(dir)
              }
              respond(x, 200)
          }
        case _ => respond(x, 404)
      }
    } catch { case _: Exception => respond(x, 500) }
  })

  def start(): CatalogServer = { server.start(); this }
  def boundPort: Int = server.getAddress.getPort
  def uri: String = s"http://127.0.0.1:$boundPort"
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

object CatalogServer {
  /** TCP_NODELAY on accepted sockets: the JDK server writes response
    * headers and body separately, and with Nagle on, a keep-alive client
    * stalls one delayed-ACK (~40 ms) per request — measured 44 ms/req vs
    * 1.3 ms with the flag. The JDK reads the property ONCE, in
    * `sun.net.httpserver.ServerConfig`'s static init, which runs when the
    * first HttpServer in the JVM is created — so the property is set at
    * CLASS-LOAD time of this companion (before any CatalogServer
    * instance can construct its HttpServer), and [[ensureNoDelay]] then
    * tries to read the effective flag back reflectively: if some OTHER
    * HttpServer initialized ServerConfig earlier with the flag unset, the
    * 40 ms stall is back and we log a loud warning instead of silently
    * regressing. (The reflective read itself forces ServerConfig init
    * AFTER our setProperty, so when it is readable it also guarantees the
    * flag took effect; `jdk.httpserver` doesn't open the package by
    * default, in which case the check is skipped — best effort.) */
  System.setProperty("sun.net.httpserver.nodelay", "true")

  private lazy val noDelayEffective: Option[Boolean] =
    try {
      val m = Class.forName("sun.net.httpserver.ServerConfig")
        .getDeclaredMethod("noDelay")
      m.setAccessible(true)
      Some(m.invoke(null).asInstanceOf[Boolean])
    } catch { case _: Throwable => None }

  private[catalog] def ensureNoDelay(): Unit = noDelayEffective match {
    case Some(false) => System.err.println(
      "[graft] WARNING: sun.net.httpserver.nodelay was read before this " +
        "library could set it (another HttpServer initialized first) — " +
        "catalog requests will pay a ~40 ms Nagle/delayed-ACK stall each; " +
        "set -Dsun.net.httpserver.nodelay=true on the JVM command line")
    case _ => ()
  }
}

/** Standalone entry point: `runMain graft.lake.catalog.CatalogServerMain
  * <metadataRoot> <port> [readyFile]` — the second-process half of the
  * cross-process wire-catalog tests, and a usable dev server. */
object CatalogServerMain {
  def main(args: Array[String]): Unit = {
    val root = args(0)
    val port = if (args.length > 1) args(1).toInt else 0
    val srv = new CatalogServer(root, port).start()
    println(s"[catalog-server] serving $root at ${srv.uri}")
    if (args.length > 2)
      Files.write(Paths.get(args(2)), srv.uri.getBytes(StandardCharsets.UTF_8))
    Thread.currentThread().join()
  }
}
