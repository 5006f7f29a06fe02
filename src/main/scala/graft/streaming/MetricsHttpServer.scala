package graft.streaming

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** A4 parity: Prometheus text-exposition endpoint (the reference serves
  * `GET /metrics` via promhttp on PORT, default 2632 — main.go:410-413,
  * jobs/logs-to-kinesis/spec:44-46). JDK-built-in `com.sun.net.httpserver`
  * keeps the engine dependency-free; the handler renders
  * [[FirehoseMetricsListener.snapshot]] in exposition format 0.0.4:
  *
  * {{{
  *   # TYPE firehose_to_kinesis_sent_count gauge
  *   firehose_to_kinesis_sent_count{system="web/0"} 42
  * }}}
  *
  * Driver-side only (the listener aggregates progress events on the
  * driver), one tiny thread — no interaction with executor resources.
  * Port 0 binds an ephemeral port (tests); production uses the
  * reference's 2632.
  */
final class MetricsHttpServer(
    snapshot: () => Map[String, Double], port: Int = 2632)
    extends AutoCloseable {

  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  server.createContext("/metrics", new HttpHandler {
    override def handle(x: HttpExchange): Unit = {
      // Always answer: an exception from snapshot()/render() must become
      // a 500, not a hung exchange blocking the dispatcher thread.
      val (status, body) =
        try (200, render(snapshot()).getBytes(StandardCharsets.UTF_8))
        catch {
          case e: Exception =>
            (500, s"snapshot failed: ${e.getMessage}\n"
              .getBytes(StandardCharsets.UTF_8))
        }
      try {
        x.getResponseHeaders.add("Content-Type",
          "text/plain; version=0.0.4; charset=utf-8")
        x.sendResponseHeaders(status, body.length.toLong)
        val os = x.getResponseBody
        try os.write(body) finally os.close()
      } finally x.close()
    }
  })
  server.setExecutor(null) // serve on the dispatcher thread; scrape QPS is tiny
  server.start()

  /** The actually-bound port (differs from `port` when 0 was requested). */
  def boundPort: Int = server.getAddress.getPort

  /** Exposition text: one `# TYPE` line per metric family (the family is
    * the series name before the label braces), then each series.
    * Families sorted for deterministic scrapes.
    */
  private def render(metrics: Map[String, Double]): String = {
    val byFamily = metrics.groupBy { case (k, _) =>
      val i = k.indexOf('{'); if (i < 0) k else k.substring(0, i)
    }
    val sb = new StringBuilder
    byFamily.toSeq.sortBy(_._1).foreach { case (family, series) =>
      sb.append(s"# TYPE $family gauge\n")
      series.toSeq.sortBy(_._1).foreach { case (k, v) =>
        val value =
          if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15) v.toLong.toString
          else v.toString
        sb.append(k).append(' ').append(value).append('\n')
      }
    }
    sb.toString
  }

  override def close(): Unit = server.stop(0)
}
