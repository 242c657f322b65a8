package graft

import graft.secrets._
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Secrets layer parity (reference secrets/: managers/env.py,
  * managers/filesystem.py, parsers.py, validation.py, base.py) + the
  * graft-side `${secret:...}` wiring and log redaction (logging.py).
  */
class SecretsSpec extends AnyFunSuite with Matchers {

  // --- parsers (parsers.py) ---

  test("parseEnvBlob: comments, quotes, env expansion") {
    val blob =
      """# credentials
        |PGUSER=admin
        |PGPASSWORD="hunter2-aa"
        |PGHOST='db.internal'
        |EXPANDED=${GRAFT_TEST_HOME}/x
        |not_a_pair
        |""".stripMargin
    val m = SecretParsers.parseEnvBlob(blob, Map("GRAFT_TEST_HOME" -> "/home/t"))
    m("PGUSER") shouldBe "admin"
    m("PGPASSWORD") shouldBe "hunter2-aa"
    m("PGHOST") shouldBe "db.internal"
    m("EXPANDED") shouldBe "/home/t/x"
    m should have size 4
  }

  test("expandVars leaves unknown vars verbatim (os.path.expandvars semantics)") {
    SecretParsers.expandVars("${NOPE_VAR}/x and $ALSO_NOPE", Map.empty) shouldBe
      "${NOPE_VAR}/x and $ALSO_NOPE"
  }

  test("parsePayload auto-detects JSON and env formats") {
    SecretParsers.parsePayload("""{"api_key": "k-123"}""") shouldBe
      Map("api_key" -> "k-123")
    SecretParsers.parsePayload("A=1\nB=2") shouldBe Map("A" -> "1", "B" -> "2")
    SecretParsers.parsePayload("plain-token") shouldBe "plain-token"
  }

  test("parsePayload hint=json accepts JSON scalars (parsers.py:69-74)") {
    SecretParsers.parsePayload("42", Some("json")) shouldBe 42
    SecretParsers.parsePayload("true", Some("json")) shouldBe true
    SecretParsers.parsePayload("\"tok-$T\"", Some("json"),
      Map("T" -> "9")) shouldBe "tok-9"
    the[IllegalArgumentException] thrownBy
      SecretParsers.parsePayload("", Some("json")) should have message
      "secret payload is not valid JSON: empty document"
  }

  // --- env manager (managers/env.py) ---

  private val envVars = Map(
    "GRAFT_SECRET__ACME__POSTGRES__ENV" -> "PGUSER=u1\nPGPASSWORD=p-secret-1",
    "GRAFT_SECRET__ACME__API__TOKEN" -> "tok-acme-9",
    "GRAFT_SECRET__GLOBAL__SHARED__KEY__JSON" -> """{"kid": "global-1"}""",
    "GRAFT_SECRET__OTHER__API__TOKEN" -> "tok-other",
    "UNRELATED" -> "x")

  test("EnvironmentSecretManager: tenant + global scoping, format hints") {
    val m = new EnvironmentSecretManager(env = envVars)
    val secrets = m.loadSecrets("acme")
    secrets("postgres") shouldBe Map("PGUSER" -> "u1", "PGPASSWORD" -> "p-secret-1")
    secrets("api_token") shouldBe "tok-acme-9"
    secrets("shared_key") shouldBe Map("kid" -> "global-1")
    secrets.keySet should not contain "api" // OTHER tenant's secret excluded
    secrets should have size 3
  }

  test("EnvironmentSecretManager: global scope can be disabled") {
    val m = new EnvironmentSecretManager(env = envVars, allowGlobalScope = false)
    m.loadSecrets("acme").keySet shouldBe Set("postgres", "api_token")
  }

  // --- filesystem manager (managers/filesystem.py) ---

  test("FilesystemSecretManager: json/env/raw files under tenant dir") {
    val dir = Files.createTempDirectory("graft-secrets-")
    val t = Files.createDirectories(dir.resolve("acme"))
    Files.writeString(t.resolve("gsheets.json"), """{"client_email": "svc@x"}""")
    Files.writeString(t.resolve("postgres.env"), "PGUSER=u2\nPGPASSWORD=pw-2")
    Files.writeString(t.resolve("api_key.txt"), "raw-key-77\n")
    Files.writeString(t.resolve(".hidden"), "nope")
    val secrets = new FilesystemSecretManager(dir).loadSecrets("acme")
    secrets("gsheets") shouldBe Map("client_email" -> "svc@x")
    secrets("postgres") shouldBe Map("PGUSER" -> "u2", "PGPASSWORD" -> "pw-2")
    secrets("api_key") shouldBe "raw-key-77"
    secrets should have size 3
  }

  test("FilesystemSecretManager: empty .json file is skipped with a warning") {
    val dir = Files.createTempDirectory("graft-secrets-")
    val t = Files.createDirectories(dir.resolve("acme"))
    Files.writeString(t.resolve("broken.json"), "   \n")
    Files.writeString(t.resolve("ok.txt"), "v1")
    val secrets = new FilesystemSecretManager(dir).loadSecrets("acme")
    secrets shouldBe Map("ok" -> "v1") // broken.json skipped, not null-valued
  }

  test("FilesystemSecretManager: missing tenant dir fails") {
    val dir = Files.createTempDirectory("graft-secrets-")
    an[IllegalArgumentException] should be thrownBy
      new FilesystemSecretManager(dir).loadSecrets("ghost")
  }

  // --- registry (secrets/__init__.py) ---

  test("create: aliases resolve; remote managers validate their config") {
    SecretManagers.create(Some("fs")).typeName shouldBe "filesystem"
    SecretManagers.create(Some("environment")).typeName shouldBe "env"
    // vault requires an address (vault.py:44-45) — surfaced at construction
    val e = the[IllegalArgumentException] thrownBy
      SecretManagers.create(Some("vault"), env = Map.empty)
    e.getMessage should include("Vault address")
    SecretManagers.create(Some("vault"),
      config = Map("address" -> "http://v:8200", "token" -> "t"),
      env = Map.empty).typeName shouldBe "vault"
    an[IllegalArgumentException] should be thrownBy SecretManagers.create(Some("nope"))
  }

  test("resolveSecretPath substitutes tenant and env vars (base.py:10-23)") {
    SecretManagers.resolveSecretPath("/secrets/{tenant}/postgres.env", "acme") shouldBe
      Paths.get("/secrets/acme/postgres.env")
    // ${VAR} env references pass through to expansion...
    SecretManagers.resolveSecretPath("/secrets/${SDIR}/{tenant}.env", "acme",
      env = Map("SDIR" -> "prod")) shouldBe Paths.get("/secrets/prod/acme.env")
    // ...but a placeholder typo fails loudly, like base.py's str.format
    (the[IllegalArgumentException] thrownBy
      SecretManagers.resolveSecretPath("/secrets/{tenat}/x.env", "acme"))
      .getMessage should include("{tenat}")
    // unbalanced braces fail too (a dropped close would otherwise
    // resolve to a silent literal path)
    an[IllegalArgumentException] should be thrownBy
      SecretManagers.resolveSecretPath("/secrets/{tenant/x.env", "acme")
  }

  // --- validation (secrets/validation.py) ---

  test("validateSecretsForConnector: file_template + connector-specific keys") {
    val creds = Map[String, Any](
      "type" -> "basic", "file_template" -> "/secrets/{tenant}/postgres.env")
    // present under prefix-match
    SecretManagers.validateSecretsForConnector(
      Map("postgres" -> Map("PGUSER" -> "u")), "postgres", creds) shouldBe true
    // absent → error names the missing secret
    val e = the[IllegalArgumentException] thrownBy
      SecretManagers.validateSecretsForConnector(Map.empty, "postgres", creds)
    e.getMessage should include("postgres")
    // credentials type none → always fine
    SecretManagers.validateSecretsForConnector(
      Map.empty, "postgres", Map("type" -> "none")) shouldBe true
    // stripe accepts api_key alias
    SecretManagers.validateSecretsForConnector(
      Map("api_key" -> "sk"), "stripe", Map("type" -> "api_key")) shouldBe true
  }

  // --- ${secret:...} wiring ---

  test("expandSecretRefs resolves flat and structured references") {
    val secrets = Map[String, Any](
      "postgres" -> Map("PGUSER" -> "u3", "PGPASSWORD" -> "pw-3"),
      "api_key" -> "k-9")
    val tree = Map[String, Any](
      "connection" -> Map(
        "jdbc_url" -> "jdbc:postgresql://h/db?user=${secret:postgres.PGUSER}&password=${secret:postgres.PGPASSWORD}",
        "token" -> "${secret:api_key}"))
    val out = SecretManagers.expandSecretRefs(tree, secrets)
      .asInstanceOf[Map[String, Any]]("connection").asInstanceOf[Map[String, Any]]
    out("jdbc_url") shouldBe "jdbc:postgresql://h/db?user=u3&password=pw-3"
    out("token") shouldBe "k-9"
    an[IllegalArgumentException] should be thrownBy
      SecretManagers.expandSecretRefs("${secret:missing}", secrets)
    an[IllegalArgumentException] should be thrownBy
      SecretManagers.expandSecretRefs("${secret:postgres.NOPE}", secrets)
  }

  // --- redaction (logging.py:16-66) ---

  test("Redactor scrubs key-pattern matches and known secret values") {
    val secrets = Map[String, Any]("postgres" -> Map("PGPASSWORD" -> "pw-secret-42"),
      "token" -> "tok-abcdef-123")
    val r = Redactor.forSecrets(secrets)
    val line = """connecting with password=pw-secret-42 api_key: "AKIA999" t=tok-abcdef-123"""
    val red = r.redact(line)
    red should not include "pw-secret-42"
    red should not include "AKIA999"
    red should not include "tok-abcdef-123"
    red should include("[REDACTED]")
  }
}
