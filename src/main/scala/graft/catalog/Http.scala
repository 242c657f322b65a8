package graft.catalog

/** Minimal HTTP + JSON plumbing for the catalog clients.
  *
  * The clients build full requests (method, URL, headers, JSON body) and
  * hand them to [[HttpTransport]] — so the request-construction logic
  * (the part of the reference's ~1400 LoC of catalog backends that is
  * pure) is exercised offline against a recording transport, while the
  * network call itself stays swappable (zero-egress builds plug a stub).
  */
final case class HttpRequest(
    method: String,
    url: String,
    headers: Map[String, String],
    body: Option[String])

final case class HttpResponse(status: Int, body: String)

trait HttpTransport {
  /** Throws on connect/timeout failure; returns any HTTP status. */
  def send(req: HttpRequest): HttpResponse
}

/** Real transport over HttpURLConnection (PATCH falls back to the
  * X-HTTP-Method-Override convention, which OpenMetadata accepts).
  */
final class JavaHttpTransport(timeoutMs: Int = 10000) extends HttpTransport {
  def send(req: HttpRequest): HttpResponse = {
    import java.net.{HttpURLConnection, URI}
    val conn = new URI(req.url).toURL.openConnection().asInstanceOf[HttpURLConnection]
    conn.setConnectTimeout(timeoutMs)
    conn.setReadTimeout(timeoutMs)
    val m = req.method.toUpperCase
    if (m == "PATCH") {
      conn.setRequestMethod("POST")
      conn.setRequestProperty("X-HTTP-Method-Override", "PATCH")
    } else conn.setRequestMethod(m)
    req.headers.foreach { case (k, v) => conn.setRequestProperty(k, v) }
    req.body.foreach { b =>
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(b.getBytes("UTF-8")) finally os.close()
    }
    val status = conn.getResponseCode
    val stream = Option(if (status >= 400) conn.getErrorStream else conn.getInputStream)
    val body = stream.map { s =>
      try new String(s.readAllBytes(), "UTF-8") finally s.close()
    }.getOrElse("")
    conn.disconnect()
    HttpResponse(status, body)
  }
}

/** JSON rendering with stable field order (objects are ordered field
  * sequences, so recorded-request fixtures are byte-stable).
  */
object Json {
  final case class JObj(fields: Seq[(String, Any)])
  def obj(fields: (String, Any)*): JObj = JObj(fields)

  def render(v: Any): String = v match {
    case null | None     => "null"
    case Some(x)         => render(x)
    case JObj(fs)        => fs.map { case (k, x) => s"${str(k)}:${render(x)}" }
                              .mkString("{", ",", "}")
    case m: Map[_, _]    => m.map { case (k, x) => s"${str(k.toString)}:${render(x)}" }
                              .mkString("{", ",", "}")
    case s: Seq[_]       => s.map(render).mkString("[", ",", "]")
    case s: String       => str(s)
    case b: Boolean      => b.toString
    case n: Number       => n.toString
  }

  private def str(s: String): String =
    "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c    => c.toString
    } + "\""

  /** JSON is a YAML subset — parse responses with the existing loader. */
  def parse(s: String): Map[String, Any] =
    if (s == null || s.trim.isEmpty) Map.empty
    else graft.config.Yaml.loadString(s)
}
