package graft.secrets

import graft.catalog.{HttpRequest, HttpResponse, HttpTransport}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Request-construction parity with the reference's remote secret
  * managers (secrets/managers/{vault,aws,gcp}.py), asserted against a
  * scripted recording transport: exact URLs, auth headers, JSON bodies,
  * version handling, and payload parsing (SecretString/SecretBinary,
  * base64, bundle formats).
  */
class RemoteSecretsSpec extends AnyFunSuite with Matchers {

  /** Routes "METHOD url-substring" (or bare substring) → canned
    * response; records every request.
    */
  private class Recorder(routes: (String, HttpResponse)*) extends HttpTransport {
    val sent = scala.collection.mutable.ArrayBuffer[HttpRequest]()
    def send(req: HttpRequest): HttpResponse = {
      sent += req
      routes.collectFirst {
        case (p, r) if s"${req.method} ${req.url}".contains(p) => r
      }.getOrElse(HttpResponse(404, "{}"))
    }
  }

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  // ------------------------------------------------------------- Vault

  private val lookupOk =
    ("GET http://v:8200/v1/auth/token/lookup-self", HttpResponse(200, "{}"))

  test("vault kv2: token auth header + /data/ URL + data.data payload (vault.py:186-189)") {
    val t = new Recorder(lookupOk,
      ("GET http://v:8200/v1/secret/data/acme", HttpResponse(200,
        """{"data": {"data": {"api_key": "k1", "db": "pg"}}}""")))
    val m = new VaultSecretManager(address = Some("http://v:8200"),
      token = Some("tok1"), transport = t, env = Map.empty)
    m.loadSecrets("acme") shouldBe Map("api_key" -> "k1", "db" -> "pg")
    // request parity: lookup-self then the kv2 read, both with the token
    t.sent.map(r => s"${r.method} ${r.url}") shouldBe Seq(
      "GET http://v:8200/v1/auth/token/lookup-self",
      "GET http://v:8200/v1/secret/data/acme")
    t.sent.foreach { r =>
      r.headers("X-Vault-Token") shouldBe "tok1"
      r.headers.get("X-Vault-Namespace") shouldBe None
    }
  }

  test("vault kv1: no /data/ segment, payload from data (vault.py:181-185)") {
    val t = new Recorder(lookupOk,
      ("GET http://v:8200/v1/legacy/acme", HttpResponse(200,
        """{"data": {"user": "u"}}""")))
    val m = new VaultSecretManager(address = Some("http://v:8200"),
      token = Some("tok1"), mountPoint = "legacy", kvVersion = 1,
      transport = t, env = Map.empty)
    m.loadSecrets("acme") shouldBe Map("user" -> "u")
    t.sent.last.url shouldBe "http://v:8200/v1/legacy/acme"
  }

  test("vault approle: POST login with role_id/secret_id, then reads use client_token (vault.py:155-158)") {
    val t = new Recorder(
      ("POST http://v:8200/v1/auth/approle/login", HttpResponse(200,
        """{"auth": {"client_token": "minted"}}""")),
      lookupOk,
      ("GET http://v:8200/v1/secret/data/acme", HttpResponse(200,
        """{"data": {"data": {"k": "v"}}}""")))
    val m = new VaultSecretManager(address = Some("http://v:8200"),
      authMethod = "approle", roleId = Some("rid"), secretId = Some("sid"),
      transport = t, env = Map.empty)
    m.loadSecrets("acme") shouldBe Map("k" -> "v")
    val login = t.sent.head
    login.method shouldBe "POST"
    login.body.get shouldBe """{"role_id":"rid","secret_id":"sid"}"""
    login.headers.get("X-Vault-Token") shouldBe None // not yet authed
    t.sent.drop(1).foreach(_.headers("X-Vault-Token") shouldBe "minted")
  }

  test("vault: per-path mount/kv overrides + {tenant} templates + merge order (vault.py:71-124)") {
    val t = new Recorder(lookupOk,
      ("GET http://v:8200/v1/secret/data/teams/acme/app", HttpResponse(200,
        """{"data": {"data": {"a": "1", "shared": "from-kv2"}}}""")),
      ("GET http://v:8200/v1/old/acme", HttpResponse(200,
        """{"data": {"b": "2", "shared": "from-kv1"}}""")))
    val m = new VaultSecretManager(address = Some("http://v:8200"),
      token = Some("tok1"),
      paths = Seq(
        "teams/{tenant}/app",
        Map[String, Any]("path" -> "{tenant}", "mount_point" -> "old",
          "kv_version" -> 1)),
      transport = t, env = Map.empty)
    // later paths win on key collision (dict.update order, vault.py:76-77)
    m.loadSecrets("acme") shouldBe
      Map("a" -> "1", "b" -> "2", "shared" -> "from-kv1")
  }

  test("vault: namespace header, env-var fallbacks, env expansion of values") {
    val env = Map("VAULT_ADDR" -> "http://envv:8200/", "VAULT_TOKEN" -> "etok",
      "VAULT_NAMESPACE" -> "team-a", "DB_HOST" -> "pg.internal")
    val t = new Recorder(
      ("GET http://envv:8200/v1/auth/token/lookup-self", HttpResponse(200, "{}")),
      ("GET http://envv:8200/v1/secret/data/acme", HttpResponse(200,
        """{"data": {"data": {"host": "$DB_HOST"}}}""")))
    val m = new VaultSecretManager(transport = t, env = env)
    m.loadSecrets("acme") shouldBe Map("host" -> "pg.internal")
    t.sent.foreach(_.headers("X-Vault-Namespace") shouldBe "team-a")
  }

  test("vault error surface: missing address / token / bad auth method / failed lookup") {
    (the[IllegalArgumentException] thrownBy new VaultSecretManager(
      transport = new Recorder(), env = Map.empty))
      .getMessage should include("Vault address")
    (the[IllegalArgumentException] thrownBy new VaultSecretManager(
      address = Some("http://v:8200"), transport = new Recorder(),
      env = Map.empty).loadSecrets("t"))
      .getMessage should include("token is required")
    (the[IllegalArgumentException] thrownBy new VaultSecretManager(
      address = Some("http://v:8200"), authMethod = "ldap",
      transport = new Recorder(), env = Map.empty).loadSecrets("t"))
      .getMessage should include("Unsupported Vault auth_method")
    // lookup-self non-200 → "Vault authentication failed." (vault.py:162-163)
    (the[IllegalArgumentException] thrownBy new VaultSecretManager(
      address = Some("http://v:8200"), token = Some("bad"),
      transport = new Recorder(), env = Map.empty).loadSecrets("t"))
      .getMessage should include("authentication failed")
  }

  // ------------------------------------------------------------- AWS

  test("aws: GetSecretValue POST — endpoint, x-amz-json-1.1 target header, SecretId body (boto3 wire form of aws.py:125-131)") {
    val t = new Recorder(
      ("POST https://secretsmanager.eu-west-1.amazonaws.com/",
        HttpResponse(200, """{"SecretString": "plain-token"}""")))
    val m = new AwsSecretsManager(regionName = Some("eu-west-1"),
      secrets = Seq("api_key"), transport = t, env = Map.empty)
    m.loadSecrets("acme") shouldBe Map("api_key" -> "plain-token")
    val r = t.sent.head
    r.url shouldBe "https://secretsmanager.eu-west-1.amazonaws.com/"
    r.headers("X-Amz-Target") shouldBe "secretsmanager.GetSecretValue"
    r.headers("Content-Type") shouldBe "application/x-amz-json-1.1"
    // default template {tenant}/{name} (aws.py:17)
    r.body.get shouldBe """{"SecretId":"acme/api_key"}"""
  }

  test("aws: version_id/version_stage included only when set (aws.py:125-130)") {
    val t = new Recorder(("secretsmanager",
      HttpResponse(200, """{"SecretString": "x"}""")))
    val m = new AwsSecretsManager(regionName = Some("us-east-1"),
      secrets = Seq(
        Map[String, Any]("name" -> "a", "version_id" -> "v-123"),
        Map[String, Any]("name" -> "b", "version_stage" -> "AWSPREVIOUS"),
        Map[String, Any]("name" -> "c", "id" -> "explicit/{tenant}/id")),
      transport = t, env = Map.empty)
    m.loadSecrets("t1")
    t.sent.map(_.body.get) should contain theSameElementsAs Seq(
      """{"SecretId":"t1/a","VersionId":"v-123"}""",
      """{"SecretId":"t1/b","VersionStage":"AWSPREVIOUS"}""",
      """{"SecretId":"explicit/t1/id"}""") // explicit id wins (base.py:60-61)
  }

  test("aws: SecretBinary base64-decodes to UTF-8; JSON payloads auto-parse (aws.py:132-141)") {
    val t = new Recorder(("secretsmanager", HttpResponse(200,
      s"""{"SecretBinary": "${b64("""{"user": "u", "pass": "p"}""")}"}""")))
    val m = new AwsSecretsManager(regionName = Some("us-east-1"),
      secrets = Seq("creds"), transport = t, env = Map.empty)
    m.loadSecrets("t") shouldBe
      Map("creds" -> Map("user" -> "u", "pass" -> "p"))
  }

  test("aws bundle mode: one secret, parsed dict required, env-expanded (aws.py:73-83)") {
    val t = new Recorder(("secretsmanager", HttpResponse(200,
      """{"SecretString": "{\"host\": \"$DB_HOST\"}"}""")))
    val m = new AwsSecretsManager(regionName = Some("us-east-1"),
      bundleSecretIdTemplate = Some("{tenant}/bundle"),
      transport = t, env = Map("DB_HOST" -> "h1"))
    m.loadSecrets("acme") shouldBe Map("host" -> "h1")
    t.sent.head.body.get shouldBe """{"SecretId":"acme/bundle"}"""
    // non-dict bundle → error (aws.py:81-82)
    val bad = new AwsSecretsManager(regionName = Some("us-east-1"),
      bundleSecretIdTemplate = Some("{tenant}/bundle"),
      transport = new Recorder(("secretsmanager",
        HttpResponse(200, """{"SecretString": "just-a-string"}"""))),
      env = Map.empty)
    an[IllegalArgumentException] should be thrownBy bad.loadSecrets("acme")
  }

  test("aws: neither definitions nor bundle template → error (aws.py:73-76)") {
    val m = new AwsSecretsManager(regionName = Some("us-east-1"),
      transport = new Recorder(), env = Map.empty)
    (the[IllegalArgumentException] thrownBy m.loadSecrets("t"))
      .getMessage should include("bundle_secret_id_template")
  }

  // ------------------------------------------------------------- GCP

  test("gcp: GET {resource}:access with bearer token; payload.data base64 (gcp.py:106-124)") {
    val t = new Recorder(
      ("GET https://secretmanager.googleapis.com/v1/projects/p1/secrets/acme-api_key/versions/latest:access",
        HttpResponse(200, s"""{"payload": {"data": "${b64("sk-123")}"}}""")))
    val m = new GcpSecretManager(projectId = Some("p1"),
      secrets = Seq("api_key"), accessToken = Some("gtok"),
      transport = t, env = Map.empty)
    m.loadSecrets("acme") shouldBe Map("api_key" -> "sk-123")
    t.sent.head.headers("Authorization") shouldBe "Bearer gtok"
  }

  test("gcp: projects/-prefixed ids pass through; per-definition version overrides (gcp.py:126-140, 65-69)") {
    val t = new Recorder(("secretmanager",
      HttpResponse(200, s"""{"payload": {"data": "${b64("v")}"}}""")))
    val m = new GcpSecretManager(projectId = Some("p1"), version = "7",
      secrets = Seq(
        Map[String, Any]("name" -> "a",
          "id" -> "projects/other/secrets/shared"),
        Map[String, Any]("name" -> "b", "version_id" -> "3"),
        "c"),
      accessToken = Some("gtok"), transport = t, env = Map.empty)
    m.loadSecrets("t1")
    t.sent.map(_.url) should contain theSameElementsAs Seq(
      "https://secretmanager.googleapis.com/v1/projects/other/secrets/shared/versions/7:access",
      "https://secretmanager.googleapis.com/v1/projects/p1/secrets/t1-b/versions/3:access",
      "https://secretmanager.googleapis.com/v1/projects/p1/secrets/t1-c/versions/7:access")
  }

  test("gcp bundle mode + missing project error (gcp.py:34-36, 75-78)") {
    val t = new Recorder(("secretmanager", HttpResponse(200,
      s"""{"payload": {"data": "${b64("""{"k": "v"}""")}"}}""")))
    val m = new GcpSecretManager(projectId = Some("p1"),
      bundleSecretIdTemplate = Some("{tenant}-bundle"),
      accessToken = Some("gtok"), transport = t, env = Map.empty)
    m.loadSecrets("acme") shouldBe Map("k" -> "v")
    t.sent.head.url should include("/secrets/acme-bundle/versions/latest:access")
    (the[IllegalArgumentException] thrownBy new GcpSecretManager(
      transport = new Recorder(), env = Map.empty))
      .getMessage should include("project_id")
  }

  test("template typos fail fast, matching str.format (base.py:50-61)") {
    // reference renders with Python str.format, which RAISES on an
    // unknown placeholder; a silent .replace would surface as a 404
    // against the remote manager instead of a config error
    val d = RemoteSecretManagers.SecretDefinition("db")
    (the[IllegalArgumentException] thrownBy
      d.resolveIdentifier("acme", "{tenat}/{name}"))
      .getMessage should include("{tenat}")
    d.resolveIdentifier("acme", "{tenant}/{name}") shouldBe "acme/db"
    // str.format parses only the TEMPLATE: braces inside a substituted
    // VALUE are legal and render verbatim (the old rendered-string scan
    // rejected them)
    d.resolveIdentifier("ac{me}", "{tenant}/{name}") shouldBe "ac{me}/db"
    // unbalanced braces in the template itself still fail
    (the[IllegalArgumentException] thrownBy
      d.resolveIdentifier("acme", "{tenant/{name}"))
      .getMessage should include("brace")
    // vault path templates: {name} is NOT a supported placeholder there
    val t = new Recorder(
      ("GET http://v:8200/v1/auth/token/lookup-self", HttpResponse(200, "{}")))
    val m = new VaultSecretManager(address = Some("http://v:8200"),
      token = Some("t0"), pathTemplate = "teams/{tenant}/{name}",
      transport = t, env = Map.empty)
    (the[IllegalArgumentException] thrownBy m.loadSecrets("acme"))
      .getMessage should include("Unresolved placeholder")
    // aws/gcp bundle templates share the guard
    val aws = new AwsSecretsManager(regionName = Some("r1"),
      bundleSecretIdTemplate = Some("{tenant}-{bundle}"),
      transport = new Recorder(), env = Map.empty)
    (the[IllegalArgumentException] thrownBy aws.loadSecrets("acme"))
      .getMessage should include("Unresolved placeholder")
  }

  // ------------------------------------------------------------- registry

  test("registry builds configured remote managers end-to-end") {
    val t = new Recorder(
      ("GET http://v:8200/v1/auth/token/lookup-self", HttpResponse(200, "{}")),
      ("GET http://v:8200/v1/kv/data/teams/acme", HttpResponse(200,
        """{"data": {"data": {"s": "1"}}}""")))
    val m = SecretManagers.create(Some("hashicorp_vault"),
      config = Map[String, Any]("address" -> "http://v:8200",
        "token" -> "t0", "mount_point" -> "kv",
        "path_template" -> "teams/{tenant}"),
      env = Map.empty, transport = t)
    m.loadSecrets("acme") shouldBe Map("s" -> "1")
  }
}
