package graft.sources

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.TweetPipeline

/** S4/E1 — HTTP ingestion of single JSON tweets (reference
  * README.md:52-54, 76-78, 108-110: Akka HTTP `POST /tweets` on :8080;
  * the intended impl `App/ApiController/scala.scala:1-5` is an empty
  * stub). No Akka jar exists in this env, so the endpoint is the JDK's
  * built-in httpserver — the HTTP surface is a demo-grade front door;
  * the real contract is what happens after the boundary:
  *
  *   HTTP thread → MemoryStream.addData (thread boundary #1)
  *     → micro-batch thread runs TweetPipeline.enrich — the SAME plan
  *       as the batch path (boundary #2: driver → executors).
  *
  * At scale the front door would be Kafka (`format("kafka")` drop-in,
  * SURVEY.md S5); everything from `enriched` down is unchanged — that
  * is the point of putting the source behind a DataFrame.
  */
final class HttpIngest(spark: SparkSession, port: Int = 0) {
  import spark.implicits._

  private val stream = MemoryStream[String](spark)

  /** The enriched streaming frame — start a writeStream on it. */
  val enriched: DataFrame = TweetPipeline.parseJson(stream.toDF().toDF("json"), "json")

  private val server: HttpServer = {
    val s = HttpServer.create(new InetSocketAddress(port), 0)
    s.createContext("/tweets", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        val resp = try {
          if (x.getRequestMethod == "POST") {
            val body = new String(x.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
            stream.addData(body)
            (200, """{"status":"accepted"}""")
          } else (405, """{"error":"POST only"}""")
        } catch { case e: Exception => (500, s"""{"error":"${jsonEscape(e.getMessage)}"}""") }
        val bytes = resp._2.getBytes(StandardCharsets.UTF_8)
        x.getResponseHeaders.set("Content-Type", "application/json")
        x.sendResponseHeaders(resp._1, bytes.length)
        x.getResponseBody.write(bytes)
        x.close()
      }
    })
    s.start()
    s
  }

  /** Escape a string for embedding in a JSON double-quoted literal —
    * exception messages may contain quotes/backslashes/control chars. */
  private def jsonEscape(s: String): String =
    Option(s).getOrElse("null").flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Bound port (useful when constructed with port=0 for tests). */
  def boundPort: Int = server.getAddress.getPort

  /** Push a payload directly (the path the HTTP handler takes). */
  def ingest(json: String): Unit = stream.addData(json)

  def stop(): Unit = server.stop(0)
}
