package graft.health

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

/** Liveness HTTP surface — the reference's `GET /q/health/live` on port
  * 9080 (`application.properties:2`, SmallRye health JSON shape): three
  * checks (admin connectivity — `AdminConnectivityCheck.java:27-54`;
  * producer/consumer progress — `CounterProgressCheck.java:37-130`),
  * overall UP iff every check is UP, HTTP 200/503 accordingly.
  *
  * Pure-JDK `HttpServer` — no framework dependency. The check thunks are
  * evaluated per request on the DRIVER: in a Spark deployment the data
  * behind them (counter aggregates, progressMonitor output) arrives via
  * foreachBatch snapshots held in driver memory, so a health probe never
  * triggers a cluster job.
  */
object Liveness {

  final case class CheckResult(name: String, up: Boolean,
                               data: Map[String, String] = Map.empty)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** SmallRye-health-shaped JSON: `{"status":..,"checks":[...]}`. */
  def statusJson(checks: Seq[CheckResult]): String = {
    val up = checks.forall(_.up)
    val body = checks.map { c =>
      val data = if (c.data.isEmpty) ""
        else c.data.map { case (k, v) => s""""${esc(k)}":"${esc(v)}"""" }
          .mkString(""","data":{""", ",", "}")
      s"""{"name":"${esc(c.name)}","status":"${if (c.up) "UP" else "DOWN"}"$data}"""
    }.mkString("[", ",", "]")
    s"""{"status":"${if (up) "UP" else "DOWN"}","checks":$body}"""
  }

  /** Serve `GET /health/live` from the given checks; port 0 = ephemeral.
    * Returns the running server (caller stops it); `boundPort` for tests.
    */
  final class Server(port: Int, checks: () => Seq[CheckResult]) {
    private val server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/health/live", (exchange: HttpExchange) => {
      val results = try checks() catch {
        case e: Exception => Seq(CheckResult("liveness-evaluation", up = false,
          Map("error" -> String.valueOf(e.getMessage))))
      }
      val bytes = statusJson(results).getBytes(StandardCharsets.UTF_8)
      val code = if (results.forall(_.up)) 200 else 503
      exchange.getResponseHeaders.set("Content-Type", "application/json")
      exchange.sendResponseHeaders(code, bytes.length)
      val os = exchange.getResponseBody
      try os.write(bytes) finally os.close()
    })
    server.setExecutor(null) // serve on the dispatch thread; probes are tiny
    server.start()
    def boundPort: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }
}
