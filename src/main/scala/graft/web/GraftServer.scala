package graft.web

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Web/REST parity layer (reference: sqlplus-web's springboot app —
 * hypergraph visualization, candidate-tree pick, experiment runner —
 * re-expressed over the JDK's built-in HTTP server, zero added
 * dependencies). The three reference capabilities map to:
 *
 *  - hypergraph visualization → `POST /api/hypergraph` (Graphviz DOT of
 *    the bipartite relation/variable graph) and the embedded index page
 *    that renders the same structure as text;
 *  - candidate-tree pick → `POST /api/candidates` (every valid rerooting
 *    with size estimates) + `POST /api/query?root=rN` (execute with the
 *    picked root — [[graft.sql.CqcSql.solveWithRoot]]);
 *  - experiment runner → `GET /api/queries` (the registered driver
 *    entries) + `POST /api/experiment?name=..&sf=..` (run one, timed).
 *
 * Plus the door itself: `POST /api/query` (rows), `POST /api/plan`
 * (dry-run dump), `POST /api/emit` (the generated standalone program —
 * reference compile/SqlPlusCompiler.scala's artifact). Request bodies
 * are RAW SQL TEXT (no JSON parsing dependency); responses are JSON.
 *
 * Single-JVM by design: the server wraps ONE SparkSession the same way
 * the reference web app wraps one engine context. Row payloads are
 * capped (`?limit=`, default 1000) — a browser is not a sink for a
 * 100 TB result; unbounded extracts belong to the parquet writers.
 */
final class GraftServer(spark: SparkSession, port: Int = 0) {

  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)

  /** Bound port (useful when constructed with port 0 = ephemeral). */
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

  private def jval(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n: Byte => n.toString
    case n: Short => n.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case n: Float => if (n.isNaN || n.isInfinite) jstr(n.toString) else n.toString
    case n: Double => if (n.isNaN || n.isInfinite) jstr(n.toString) else n.toString
    case n: java.math.BigDecimal => n.toPlainString
    case s: Seq[_] => s.map(jval).mkString("[", ",", "]")
    case a: Array[_] => a.map(jval).mkString("[", ",", "]")
    case r: org.apache.spark.sql.Row => r.toSeq.map(jval).mkString("[", ",", "]")
    case other => jstr(other.toString)
  }

  private def rowsJson(df: DataFrame, limit: Int): String = {
    val cols = df.columns
    val rows = df.limit(limit).collect()
    s"""{"columns":${cols.toSeq.map(jstr).mkString("[", ",", "]")},""" +
      s""""rows":${rows.toSeq.map(jval).mkString("[", ",", "]")},""" +
      s""""rowCount":${rows.length},"capped":${rows.length == limit}}"""
  }

  private def respond(ex: HttpExchange, code: Int, body: String, ctype: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", s"$ctype; charset=utf-8")
    ex.sendResponseBody(code, bytes)
  }

  private implicit class ExOps(ex: HttpExchange) {
    def sendResponseBody(code: Int, bytes: Array[Byte]): Unit = {
      ex.sendResponseHeaders(code, bytes.length.toLong)
      val os = ex.getResponseBody
      try os.write(bytes) finally os.close()
    }
  }

  private def param(ex: HttpExchange, name: String): Option[String] = {
    val q = Option(ex.getRequestURI.getRawQuery).getOrElse("")
    q.split('&').iterator.map(_.split("=", 2)).collectFirst {
      case Array(k, v) if k == name =>
        java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }
  }

  private def body(ex: HttpExchange): String =
    new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8).trim

  private def handle(path: String)(f: HttpExchange => (Int, String, String)): Unit =
    server.createContext(path, (ex: HttpExchange) =>
      try {
        val (code, payload, ctype) = f(ex)
        respond(ex, code, payload, ctype)
      } catch {
        case e: Throwable =>
          respond(ex, 400, s"""{"error":${jstr(Option(e.getMessage).getOrElse(e.toString))}}""",
            "application/json")
      })

  handle("/health") { _ => (200, """{"status":"ok"}""", "application/json") }

  handle("/api/query") { ex =>
    val sql = body(ex)
    require(sql.nonEmpty, "empty SQL body")
    val limit = param(ex, "limit").map(_.toInt).getOrElse(1000).min(100000)
    val df = param(ex, "root") match {
      case Some(r) => graft.sql.CqcSql.solveWithRoot(spark, sql, r)
      case None => graft.sql.CqcSql.solve(spark, sql)
    }
    (200, rowsJson(df, limit), "application/json")
  }

  handle("/api/plan") { ex =>
    val sql = body(ex)
    require(sql.nonEmpty, "empty SQL body")
    (200, s"""{"plan":${jstr(graft.sql.CqcSql.explain(spark, sql))}}""", "application/json")
  }

  handle("/api/candidates") { ex =>
    val sql = body(ex)
    require(sql.nonEmpty, "empty SQL body")
    val cands = graft.sql.CqcSql.candidates(spark, sql).map { case (root, desc) =>
      s"""{"root":${jstr(root)},"tree":${jstr(desc)}}"""
    }
    (200, s"""{"candidates":${cands.mkString("[", ",", "]")}}""", "application/json")
  }

  handle("/api/hypergraph") { ex =>
    val sql = body(ex)
    require(sql.nonEmpty, "empty SQL body")
    (200, graft.sql.CqcSql.hypergraphDot(spark, sql), "text/vnd.graphviz")
  }

  handle("/api/emit") { ex =>
    val sql = body(ex)
    require(sql.nonEmpty, "empty SQL body")
    val obj = param(ex, "object").getOrElse("GraftQuery")
    val pkg = param(ex, "package").getOrElse("graft.generated")
    (200, graft.sql.Emit.program(spark, sql, obj, pkg), "text/x-scala")
  }

  handle("/api/queries") { _ =>
    val names = graft.SparkEntry.queries.keys.toSeq.sorted.map(jstr)
    (200, s"""{"queries":${names.mkString("[", ",", "]")}}""", "application/json")
  }

  handle("/api/experiment") { ex =>
    val name = param(ex, "name").getOrElse(throw new IllegalArgumentException("name= required"))
    val sf = param(ex, "sf").getOrElse("/root/testdata/sf0.001")
    val fn = graft.SparkEntry.queries.getOrElse(name,
      throw new IllegalArgumentException(s"unknown query $name"))
    graft.CacheRegistry.unpersistAll()
    spark.catalog.clearCache()
    val t0 = System.nanoTime()
    val n = fn(spark, sf).count()
    val sec = (System.nanoTime() - t0) / 1e9
    (200, s"""{"name":${jstr(name)},"sf":${jstr(sf)},"rows":$n,"sec":$sec}""",
      "application/json")
  }

  handle("/") { _ => (200, GraftServer.indexHtml, "text/html") }

  def start(): GraftServer = { server.setExecutor(null); server.start(); this }
  def stop(): Unit = server.stop(0)
}

object GraftServer {

  /** `runMain graft.web.GraftServer [port]` — serve until killed. */
  def main(args: Array[String]): Unit = {
    val port = args.headOption.map(_.toInt).getOrElse(8090)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val s = new GraftServer(spark, port).start()
    println(s"graft server listening on http://127.0.0.1:${s.boundPort}/")
    Thread.currentThread.join()
  }

  /** Minimal embedded console: textarea → plan / candidates / rows.
    * The reference ships a full SPA; the parity here is the WORKFLOW
    * (inspect hypergraph, compare candidate trees, pick one, run). */
  private[web] val indexHtml: String =
    """<!doctype html>
      |<html><head><meta charset="utf-8"><title>graft console</title>
      |<style>
      | body{font-family:monospace;margin:2em;max-width:70em}
      | textarea{width:100%;height:8em} pre{background:#f4f4f4;padding:1em;overflow:auto}
      | button{margin-right:.5em} input{width:6em}
      |</style></head><body>
      |<h2>graft console</h2>
      |<textarea id="sql">SELECT COUNT(*) AS n FROM lineitem</textarea><br>
      |root <input id="root" placeholder="(auto)">
      |<button onclick="call('plan')">plan</button>
      |<button onclick="call('candidates')">candidates</button>
      |<button onclick="call('hypergraph')">hypergraph</button>
      |<button onclick="call('emit')">emit</button>
      |<button onclick="call('query')">run</button>
      |<pre id="out">-</pre>
      |<script>
      |async function call(ep){
      |  const sql=document.getElementById('sql').value;
      |  const root=document.getElementById('root').value;
      |  const qs=(ep==='query'&&root)?('?root='+encodeURIComponent(root)):'';
      |  const r=await fetch('/api/'+ep+qs,{method:'POST',body:sql});
      |  document.getElementById('out').textContent=await r.text();
      |}
      |</script></body></html>
      |""".stripMargin
}
