package graft.catalog

import graft.core.ContractField
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Request-construction parity with catalog/openmetadata.py, asserted
  * against a scripted recording transport: exact URLs, auth headers,
  * payload shapes, and the warn-and-degrade status handling.
  */
class OpenMetadataCatalogSpec extends AnyFunSuite with Matchers {

  /** Routes url-prefix → canned response; records every request. */
  private class Recorder(routes: (String, HttpResponse)*) extends HttpTransport {
    val sent = scala.collection.mutable.ArrayBuffer[HttpRequest]()
    def send(req: HttpRequest): HttpResponse = {
      sent += req
      routes.collectFirst {
        case (p, r) if req.url.contains(p) && !p.startsWith(req.method + " ") => r
        case (p, r) if s"${req.method} ${req.url}".contains(p) => r
      }.getOrElse(HttpResponse(404, "{}"))
    }
  }

  private val api = "http://omd:8585/api"
  private def client(t: HttpTransport) =
    new OpenMetadataCatalog(api, "tok123", t, log = _ => ())

  test("missing auth token is fatal (openmetadata.py:38-42)") {
    val e = the[IllegalArgumentException] thrownBy
      new OpenMetadataCatalog(api, "", new Recorder())
    e.getMessage should include("auth_token is required")
  }

  test("service get-or-create: GET by name, then POST create with {name, serviceType, connection:{}} (py:49-94)") {
    // hit: GET returns the existing service
    val hit = new Recorder(
      ("GET http://omd:8585/api/v1/services/databaseService/name/dativo-ingest",
        HttpResponse(200, """{"fullyQualifiedName": "svc.dativo-ingest"}""")))
    client(hit).getOrCreateService("databaseService", "dativo-ingest") shouldBe "svc.dativo-ingest"
    hit.sent.map(_.method) shouldBe Seq("GET")
    hit.sent.head.headers shouldBe Map(
      "Content-Type" -> "application/json", "Authorization" -> "Bearer tok123")

    // miss: GET 404 then POST create
    val miss = new Recorder(
      ("POST http://omd:8585/api/v1/services/databaseService",
        HttpResponse(201, """{"fullyQualifiedName": "dativo-ingest"}""")))
    client(miss).getOrCreateService("databaseService", "dativo-ingest") shouldBe "dativo-ingest"
    miss.sent.map(_.method) shouldBe Seq("GET", "POST")
    miss.sent(1).url shouldBe s"$api/v1/services/databaseService"
    miss.sent(1).body.get shouldBe
      """{"name":"dativo-ingest","serviceType":"databaseService","connection":{}}"""
  }

  test("ensure table: GET by fqn, on miss POST with database ref + mapped columns (py:95-173)") {
    val t = new Recorder(
      ("/v1/services/", HttpResponse(200, """{"fullyQualifiedName": "dativo-ingest"}""")),
      ("POST http://omd:8585/api/v1/tables",
        HttpResponse(201, """{"id": "uuid-1"}""")))
    val schema = Seq(
      ContractField("id", "integer", required = true),
      ContractField("ts", "datetime"),
      ContractField("blob", "mystery"))
    val (fqn, id) = client(t).ensureTable("people", "hr", schema)
    fqn shouldBe "dativo-ingest.hr.people"
    id shouldBe Some("uuid-1")
    val post = t.sent.last
    post.url shouldBe s"$api/v1/tables"
    post.body.get shouldBe
      """{"name":"people","database":{"name":"hr","service":{"name":"dativo-ingest"}},""" +
      """"tableType":"Regular","columns":[""" +
      """{"name":"id","dataType":"INT","constraint":"NOT_NULL"},""" +
      """{"name":"ts","dataType":"TIMESTAMP","constraint":"NULL"},""" +
      """{"name":"blob","dataType":"STRING","constraint":"NULL"}]}"""
    // existing table short-circuits the POST
    val t2 = new Recorder(
      ("/v1/services/", HttpResponse(200, """{"fullyQualifiedName": "dativo-ingest"}""")),
      ("/v1/tables/name/", HttpResponse(200, """{"id": "uuid-2"}""")))
    client(t2).ensureTable("people", "hr")._2 shouldBe Some("uuid-2")
    t2.sent.count(_.method == "POST") shouldBe 0
  }

  test("push metadata: GET, merge tags/owners/description/extension, PATCH /v1/tables/{id} (py:197-290)") {
    val t = new Recorder(
      ("/v1/services/", HttpResponse(200, """{"fullyQualifiedName": "dativo-ingest"}""")),
      ("/v1/tables/name/", HttpResponse(200,
        """{"id": "uuid-3", "name": "people", "tags": [{"tagFQN": "old.tag", "source": "Classification"}]}""")),
      ("/v1/users/name/ana", HttpResponse(200, """{"id": "user-9"}""")),
      ("/v1/users/name/bob", HttpResponse(404, "{}")),
      ("PATCH", HttpResponse(200, "{}")))
    val status = client(t).pushMetadata("people", "hr",
      tags = Seq("PII.Sensitive"), owners = Seq("ana", "bob"),
      description = Some("people table"),
      customProperties = Map("dativo.job" -> "j1"))
    status shouldBe "success"
    val patch = t.sent.last
    patch.method shouldBe "PATCH"
    patch.url shouldBe s"$api/v1/tables/uuid-3"
    val body = patch.body.get
    // existing tag labels preserved, new appended with Classification source
    body should include(
      """"tags":[{"tagFQN":"old.tag","source":"Classification"},{"tagFQN":"PII.Sensitive","source":"Classification"}]""")
    // resolved user id wins; unresolved falls back to name ref
    body should include(""""owners":[{"id":"user-9","type":"user"},{"name":"bob","type":"user"}]""")
    body should include(""""description":"people table"""")
    body should include(""""extension":{"dativo.job":"j1"}""")
    // table not found ⇒ error, nothing patched (py:224-230)
    val notFound = new Recorder(
      ("/v1/services/", HttpResponse(200, """{"fullyQualifiedName": "dativo-ingest"}""")))
    client(notFound).pushMetadata("people", "hr", tags = Seq("x")) shouldBe "error"
  }

  test("push lineage: PUT /v1/lineage/table/name/{fqn} with edge list; empty sources skipped (py:292-352)") {
    val t = new Recorder(
      ("/v1/services/", HttpResponse(200, """{"fullyQualifiedName": "dativo-ingest"}""")),
      ("PUT", HttpResponse(200, "{}")))
    client(t).pushTableLineage(Seq("pg.public.users", "s3.raw.events"),
      "people", "hr") shouldBe "success"
    val put = t.sent.last
    put.method shouldBe "PUT"
    put.url shouldBe s"$api/v1/lineage/table/name/dativo-ingest.hr.people"
    put.body.get shouldBe
      """{"description":"Lineage from ingest","edges":[""" +
      """{"fromEntity":"pg.public.users","toEntity":"dativo-ingest.hr.people","description":"ingest operation"},""" +
      """{"fromEntity":"s3.raw.events","toEntity":"dativo-ingest.hr.people","description":"ingest operation"}]}"""
    client(new Recorder()).pushTableLineage(Seq.empty, "people") shouldBe "skipped"
  }

  test("factory: openmetadata needs a token (env or connection); nessie builds lineage properties (nessie.py:111-121)") {
    CatalogFactory.forType("openmetadata", env = Map.empty) shouldBe None
    CatalogFactory.forType("openmetadata",
      connection = Map("auth_token" -> "t", "api_url" -> api),
      env = Map.empty, transport = new Recorder()) shouldBe a[Some[_]]
    CatalogFactory.forType("openmetadata", env = Map(
      "OPENMETADATA_AUTH_TOKEN" -> "t"), transport = new Recorder()) shouldBe a[Some[_]]
    val nessie = new NessieCatalog()
    nessie.lineageInfo(Seq("a", "b"), "t1") shouldBe Map(
      "lineage.sources" -> "a,b",
      "lineage.operation" -> "ingest",
      "lineage.target" -> "t1")
    CatalogFactory.forType("nessie") shouldBe a[Some[_]]
    CatalogFactory.forType("aws_glue") shouldBe None
  }
}
