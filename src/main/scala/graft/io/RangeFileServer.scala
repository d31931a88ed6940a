package graft.io

import java.io.OutputStream
import java.net.InetSocketAddress
import java.nio.file.{Files, Path}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** Loopback static-file HTTP server with RFC-7233 single-range support
  * (`Range: bytes=a-b` / `bytes=a-`), used by HttpSourceSpec and the
  * `src_http_csv` harness key to exercise [[HttpCsvSource]] in the
  * zero-egress container. JDK-built-in (`com.sun.net.httpserver`), no
  * dependencies. Serves only files under `root` (no path escape).
  *
  * `noRanges = true` simulates a server that ignores Range headers
  * (always 200 + full body) to test the source's fallback paths.
  */
final class RangeFileServer(root: Path, noRanges: Boolean = false) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
  server.createContext("/", new Handler)
  // ALL server threads must be daemon: a harness/Verify JVM whose main
  // has returned otherwise never exits (DestroyJavaVM waits on the
  // non-daemon pool, and the shutdown hook that would stop the server
  // only fires once every non-daemon thread is gone — a deadlock).
  server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8,
    (r: Runnable) => { val t = new Thread(r); t.setDaemon(true); t }))
  // the JDK server's internal HTTP-Dispatcher thread inherits daemon
  // status from the thread calling start() — start from a daemon thread
  locally {
    val starter = new Thread(() => server.start())
    starter.setDaemon(true)
    starter.start()
    starter.join()
  }

  val port: Int = server.getAddress.getPort
  def url(file: String): String = s"http://127.0.0.1:$port/$file"
  def stop(): Unit = server.stop(0)

  private final class Handler extends HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      val rel = ex.getRequestURI.getPath.stripPrefix("/")
      val f = root.resolve(rel).normalize()
      if (!f.startsWith(root) || !Files.isRegularFile(f)) {
        ex.sendResponseHeaders(404, -1); return
      }
      val total = Files.size(f)
      val range = Option(ex.getRequestHeaders.getFirst("Range"))
        .filter(_ => !noRanges)
        .flatMap(parseRange(_, total))
      range match {
        case Some((a, b)) =>
          val len = b - a + 1
          ex.getResponseHeaders.set("Content-Range", s"bytes $a-$b/$total")
          ex.getResponseHeaders.set("Accept-Ranges", "bytes")
          ex.sendResponseHeaders(206, len)
          copyRange(f, a, len, ex.getResponseBody)
        case None =>
          ex.sendResponseHeaders(200, total)
          copyRange(f, 0, total, ex.getResponseBody)
      }
    } finally ex.close()

    private def parseRange(h: String, total: Long): Option[(Long, Long)] =
      if (!h.startsWith("bytes=")) None
      else h.stripPrefix("bytes=").split("-", 2) match {
        case Array(a, "") => a.toLongOption.map(s => (s, total - 1)).filter(_._1 < total)
        case Array(a, b) => for {
          s <- a.toLongOption; e <- b.toLongOption
          if s <= e && s < total
        } yield (s, math.min(e, total - 1))
        case _ => None
      }

    private def copyRange(f: Path, start: Long, len: Long, out: OutputStream): Unit = {
      val in = Files.newInputStream(f)
      try {
        var left = start
        while (left > 0) {
          val n = in.skip(left)
          if (n <= 0) {
            // skip() may return 0 without EOF (round-15 review: the
            // bare loop spun a server thread forever when a rewrite
            // raced Files.size); only read() == -1 proves EOF — and a
            // file shorter than the declared range must ABORT the
            // exchange, not answer short of Content-Length and leave
            // the client waiting
            if (in.read() < 0)
              throw new java.io.EOFException(s"$f shorter than range start")
            else left -= 1
          } else left -= n
        }
        val buf = new Array[Byte](1 << 16)
        var remain = len
        while (remain > 0) {
          val n = in.read(buf, 0, math.min(remain, buf.length.toLong).toInt)
          if (n < 0)
            throw new java.io.EOFException(
              s"$f truncated mid-range: $remain bytes short of Content-Length")
          else { out.write(buf, 0, n); remain -= n }
        }
      } finally { in.close(); out.close() }
    }
  }
}
