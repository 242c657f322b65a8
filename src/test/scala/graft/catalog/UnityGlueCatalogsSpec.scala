package graft.catalog

import graft.core.ContractField
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Request parity for the Databricks Unity (databricks_unity.py) and
  * AWS Glue (aws_glue.py) backends, via recording transport / API.
  */
class UnityGlueCatalogsSpec extends AnyFunSuite with Matchers {

  // ------------------------------------------------------------- Unity

  private class Recorder(status: String => Int = _ => 200) extends HttpTransport {
    val sent = scala.collection.mutable.ArrayBuffer[HttpRequest]()
    def send(req: HttpRequest): HttpResponse = {
      sent += req
      HttpResponse(status(req.url), "{}")
    }
  }

  private val ws = "https://dbx.example.com"
  private def unity(t: HttpTransport) = new DatabricksUnityCatalog(
    ws, "tok", t, warehouseId = Some("wh1"), log = _ => ())

  test("unity: missing workspace/token is fatal (databricks_unity.py:38-42)") {
    the[IllegalArgumentException] thrownBy
      new DatabricksUnityCatalog("", "tok", new Recorder()) should have message
      "requirement failed: Databricks workspace_url and access_token are required. " +
        "Set them in catalog.connection or environment variables."
  }

  test("unity ensure table: GET, then CREATE TABLE IF NOT EXISTS via SQL API with mapped columns (py:49-122)") {
    val t = new Recorder(url => if (url.contains("/unity-catalog/tables/")) 404 else 200)
    val full = unity(t).ensureTable("people", "hr",
      Seq(ContractField("id", "integer", required = true),
        ContractField("name", "string")),
      location = "s3://bucket/o'hare")
    full shouldBe "main.hr.people"
    t.sent.head.method shouldBe "GET"
    t.sent.head.url shouldBe s"$ws/api/2.1/unity-catalog/tables/main.hr.people"
    t.sent.head.headers("Authorization") shouldBe "Bearer tok"
    val post = t.sent(1)
    post.url shouldBe s"$ws/api/2.0/sql/statements"
    val body = post.body.get
    body should include("CREATE TABLE IF NOT EXISTS main.hr.people")
    body should include("id BIGINT NOT NULL, name STRING")
    body should include("USING DELTA")
    body should include("LOCATION 's3://bucket/o''hare'") // quote escaped
    body should include(""""warehouse_id":"wh1"""")
    // existing table: no SQL statement
    val t2 = new Recorder()
    unity(t2).ensureTable("people", "hr")
    t2.sent.size shouldBe 1
  }

  test("unity push metadata: owner PATCH + single SET TBLPROPERTIES with escaped pairs (py:161-243)") {
    val t = new Recorder()
    unity(t).pushMetadata("people", "hr",
      tags = Seq("pii", "fin'ops"), owners = Seq("ana", "bob"),
      description = Some("it's people")) shouldBe "success"
    val patch = t.sent.head
    patch.method shouldBe "PATCH"
    patch.url shouldBe s"$ws/api/2.1/unity-catalog/tables/main.hr.people"
    patch.body.get shouldBe """{"owner":"ana"}""" // first owner only
    val alter = t.sent(1).body.get
    alter should include(
      "ALTER TABLE main.hr.people SET TBLPROPERTIES " +
        "('comment' = 'it''s people', 'tags' = 'pii,fin''ops')")
    // nothing to update ⇒ partial, no statement sent
    val t2 = new Recorder()
    unity(t2).pushMetadata("people", "hr") shouldBe "partial"
    t2.sent shouldBe empty
  }

  test("unity lineage: TBLPROPERTIES with escaped sources/operation (py:245-300)") {
    val t = new Recorder()
    unity(t).pushTableLineage(Seq("pg.users", "s3.events"), "people", "hr") shouldBe "success"
    val body = t.sent.head.body.get
    body should include("'lineage_sources' = 'pg.users,s3.events'")
    body should include("'lineage_operation' = 'ingest'")
    // factory: needs both url and token
    CatalogFactory.forType("databricks_unity", env = Map.empty) shouldBe None
    CatalogFactory.forType("databricks_unity",
      connection = Map("workspace_url" -> ws, "access_token" -> "t"),
      env = Map.empty, transport = new Recorder()) shouldBe a[Some[_]]
  }

  // -------------------------------------------------------------- Glue

  private class GlueRecorder(
      tables: Map[(String, String), Map[String, Any]] = Map.empty,
      databases: Set[String] = Set.empty) extends GlueApi {
    val calls = scala.collection.mutable.ArrayBuffer[(String, Any)]()
    def getDatabase(name: String) = {
      calls += ("getDatabase" -> name)
      if (databases(name)) Some(Map("Name" -> name)) else None
    }
    def createDatabase(d: Map[String, Any]) = calls += ("createDatabase" -> d)
    def getTable(db: String, n: String) = {
      calls += ("getTable" -> (db, n))
      tables.get((db, n))
    }
    def createTable(db: String, t: Map[String, Any]) = calls += ("createTable" -> t)
    def updateTable(db: String, t: Map[String, Any]) = calls += ("updateTable" -> t)
  }

  test("glue ensure table: creates missing database, builds parquet-serde TableInput with hive types + asset parameters (aws_glue.py:57-151)") {
    val api = new GlueRecorder()
    val glue = new AwsGlueCatalog(api, assetDomain = Some("hr"),
      assetDataProduct = Some("core"), assetOwner = Some("ana"), log = _ => ())
    glue.ensureTable("people", "hr_db",
      Seq(ContractField("id", "integer", description = Some("pk")),
        ContractField("ok", "boolean")),
      location = "s3://b/people")
    api.calls.map(_._1) shouldBe Seq("getDatabase", "createDatabase", "getTable", "createTable")
    val input = api.calls.last._2.asInstanceOf[Map[String, Any]]
    input("Name") shouldBe "people"
    input("TableType") shouldBe "EXTERNAL_TABLE"
    input("Parameters") shouldBe Map(
      "domain" -> "hr", "data_product" -> "core", "owner" -> "ana")
    val sd = input("StorageDescriptor").asInstanceOf[Map[String, Any]]
    sd("Location") shouldBe "s3://b/people"
    sd("SerdeInfo") shouldBe Map("SerializationLibrary" ->
      "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe")
    sd("Columns") shouldBe Seq(
      Map("Name" -> "id", "Type" -> "bigint", "Comment" -> "pk"),
      Map("Name" -> "ok", "Type" -> "boolean", "Comment" -> ""))
  }

  test("glue push metadata/lineage: read-only fields filtered out of TableInput, parameters merged (aws_glue.py:174-316)") {
    val existing = Map[String, Any](
      "Name" -> "people", "DatabaseName" -> "hr_db", "CreateTime" -> "x",
      "CreatedBy" -> "y", "CatalogId" -> "z", "TableType" -> "EXTERNAL_TABLE",
      "Parameters" -> Map("keep" -> "me"))
    val api = new GlueRecorder(
      tables = Map(("hr_db", "people") -> existing), databases = Set("hr_db"))
    val glue = new AwsGlueCatalog(api, log = _ => ())
    glue.pushMetadata("people", "hr_db", tags = Seq("pii", "fin"),
      owners = Seq("ana"), description = Some("d"),
      customProperties = Map("job" -> "j1")) shouldBe "success"
    val updated = api.calls.last._2.asInstanceOf[Map[String, Any]]
    // read-only response fields are NOT in TableInput
    updated.keySet.intersect(Set("DatabaseName", "CreateTime", "CreatedBy", "CatalogId")) shouldBe empty
    updated("Description") shouldBe "d"
    updated("Parameters") shouldBe Map("keep" -> "me", "tags" -> "pii,fin",
      "owners" -> "ana", "job" -> "j1")
    glue.pushTableLineage(Seq("pg.users"), "people", "hr_db") shouldBe "success"
    val lin = api.calls.last._2.asInstanceOf[Map[String, Any]]
    lin("Parameters").asInstanceOf[Map[String, Any]]("lineage_sources") shouldBe "pg.users"
    // missing table ⇒ error, like the reference's caught ClientError
    glue.pushMetadata("nope", "hr_db", tags = Seq("t")) shouldBe "error"
    // missing SDK binding fails fast with a clear error (aws_glue.py:35-38)
    an[UnsupportedOperationException] should be thrownBy
      new AwsGlueCatalog(UnavailableGlueApi).ensureTable("t")
  }
}
