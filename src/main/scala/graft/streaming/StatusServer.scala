package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}

/** Minimal HTTP status surface — the engine analogue of the reference
  * StreamingApp's Flask `/status` blueprint (reference
  * contrib/apps/omegaml.py:8-136), served by the JDK's built-in
  * `com.sun.net.httpserver` so it adds NO dependency. The payload is the
  * same [[EmitterStatus]] snapshot [[Minibatch.status]] returns
  * programmatically; this just puts it on a port for the ops dashboards
  * the reference serves from Flask.
  *
  * Endpoints:
  *   - `GET /status` → JSON array: one status object per registered stream
  *   - `GET /status/<stream>` → JSON object for that stream (404 when the
  *     name was never registered)
  *
  * Driver-side by design: status is driver state (StreamingQuery handles
  * live on the driver); the handler serializes a handful of counters, no
  * data rows — it can never become a data-plane bottleneck. Bind with
  * `port = 0` for an ephemeral test port; `boundPort` reports it.
  */
final class StatusServer(mb: Minibatch, port: Int = 0) extends AutoCloseable {
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
  server.createContext("/status", (exchange: HttpExchange) => handle(exchange))
  // default executor: the calling (dispatcher) thread — status payloads are
  // tiny and rare, a pool would be ceremony
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def json(st: EmitterStatus): String = {
    def opt[A](v: Option[A], render: A => String): String = v.map(render).getOrElse("null")
    s"""{"stream":${jstr(st.stream)},"running":${st.running},""" +
      s""""query_id":${opt(st.queryId, (s: String) => jstr(s))},""" +
      s""""last_batch_id":${opt(st.lastBatchId, (l: Long) => l.toString)},""" +
      s""""num_input_rows":${opt(st.numInputRows, (l: Long) => l.toString)},""" +
      s""""message":${jstr(st.message)},"stream_status":${jstr(st.streamStatus)}}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def handle(ex: HttpExchange): Unit =
    try {
      val path = ex.getRequestURI.getPath.stripPrefix("/status").stripPrefix("/")
      if (ex.getRequestMethod != "GET")
        respond(ex, 405, """{"error":"method not allowed"}""")
      else if (path.isEmpty)
        respond(ex, 200,
          mb.registry.list().sorted.map(n => json(mb.status(n))).mkString("[", ",", "]"))
      else if (mb.registry.exists(path))
        respond(ex, 200, json(mb.status(path)))
      else
        respond(ex, 404, s"""{"error":"unknown stream","stream":${jstr(path)}}""")
    } catch {
      case scala.util.control.NonFatal(e) =>
        respond(ex, 500, s"""{"error":${jstr(String.valueOf(e.getMessage))}}""")
    } finally ex.close()

  /** Stop accepting and release the port (immediate; no lingering drain). */
  override def close(): Unit = server.stop(0)
}
