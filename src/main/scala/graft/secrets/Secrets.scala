package graft.secrets

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Pluggable tenant-scoped secret management (reference
  * src/dativo_ingest/secrets/: base.py, managers/{env,filesystem,vault,
  * aws,gcp}.py, parsers.py, validation.py).
  *
  * The env + filesystem backends are pure local I/O. vault/aws/gcp
  * ([[RemoteSecretManagers]]) reconstruct the exact HTTP requests the
  * reference's SDK clients send, against the same injectable
  * [[graft.catalog.HttpTransport]] as the catalog backends — testable
  * offline, live over [[graft.catalog.JavaHttpTransport]] in a deploy.
  */
trait SecretManager {
  def typeName: String
  def config: Map[String, Any]

  /** Load all secrets visible to the tenant. Values are String for flat
    * secrets, Map[String, String] for parsed .env/JSON payloads.
    */
  def loadSecrets(tenantId: String): Map[String, Any]
}

/** Payload parsers (reference secrets/parsers.py). */
object SecretParsers {

  /** KEY=VALUE blob → map (parsers.py:9-27); quotes stripped, env vars in
    * values expanded, comments/blank lines skipped.
    */
  def parseEnvBlob(blob: String, env: Map[String, String] = sys.env): Map[String, String] =
    blob.linesIterator.flatMap { raw =>
      val line = raw.trim
      if (line.isEmpty || line.startsWith("#") || !line.contains("=")) None
      else {
        val Array(k, v) = line.split("=", 2)
        Some(k.trim -> expandVars(v.trim.stripPrefix("\"").stripSuffix("\"")
          .stripPrefix("'").stripSuffix("'"), env))
      }
    }.toMap

  /** `$VAR` and `${VAR}` expansion, Python os.path.expandvars semantics:
    * unknown vars are left verbatim (unlike Yaml.expandEnv's `:-` form).
    */
  def expandVars(s: String, env: Map[String, String] = sys.env): String = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)\\}|\\$([A-Za-z_][A-Za-z0-9_]*)".r
    re.replaceAllIn(s, m => {
      val name = Option(m.group(1)).getOrElse(m.group(2))
      scala.util.matching.Regex.quoteReplacement(env.getOrElse(name, m.group(0)))
    })
  }

  /** Recursive env expansion over a parsed JSON/YAML tree (parsers.py:30-45). */
  def expandDeep(v: Any, env: Map[String, String] = sys.env): Any = v match {
    case m: Map[String, Any] @unchecked => m.map { case (k, x) => k -> expandDeep(x, env) }
    case l: Seq[Any] @unchecked         => l.map(expandDeep(_, env))
    case s: String                      => expandVars(s, env)
    case other                          => other
  }

  /** Format-hint / auto-detecting payload parse (parsers.py:48-81):
    * json → parsed map; env → KEY=VALUE map; text/raw → expanded string.
    */
  def parsePayload(payload: String, formatHint: Option[String] = None,
      env: Map[String, String] = sys.env): Any = {
    val text = payload.trim
    val hint = formatHint.map(_.toLowerCase).getOrElse("auto")
    // Raw parse (no eager sys.env expansion) so lists/scalars survive and
    // the caller-supplied env map is the only expansion source
    // (parsers.py parse_secret_payload → json.loads + expandvars).
    // With hint=json a valid scalar (42, true, "token") is accepted, as
    // json.loads would return it (parsers.py:69-74); parse failures
    // re-raise with the original detail.
    if (hint == "json")
      (try graft.config.Yaml.loadAny(text) catch {
        case e: Exception =>
          throw new IllegalArgumentException(
            s"secret payload is not valid JSON: ${e.getMessage}", e)
      }) match {
        case null => throw new IllegalArgumentException(
          "secret payload is not valid JSON: empty document")
        case structured @ (_: Map[_, _] | _: Seq[_]) => expandDeep(structured, env)
        case s: String                               => expandVars(s, env)
        case scalar                                  => scalar
      }
    else if (hint == "auto" && (text.startsWith("{") || text.startsWith("["))) {
      val parsed =
        try graft.config.Yaml.loadAny(text) match {
          case structured @ (_: Map[_, _] | _: Seq[_]) =>
            Some(expandDeep(structured, env))
          case _ => None // scalar ⇒ not the structured payload the prefix implies
        } catch { case _: Exception => None }
      parsed.getOrElse(expandVars(text, env))
    }
    else if (hint == "env" || (hint == "auto" && text.contains("\n") && text.contains("=")))
      parseEnvBlob(text, env)
    else expandVars(text, env)
  }
}

/** Env-var backend (reference secrets/managers/env.py): variables named
  * `{prefix}{delim}{scope}{delim}{name...}[{delim}{format}]` where scope
  * is the tenant (or GLOBAL/ALL when allowed). Example:
  * `GRAFT_SECRET__ACME__POSTGRES__ENV=PGUSER=u\nPGPASSWORD=p`.
  */
final class EnvironmentSecretManager(
    prefix: String = "GRAFT_SECRET",
    delimiter: String = "__",
    allowGlobalScope: Boolean = true,
    env: Map[String, String] = sys.env,
    val config: Map[String, Any] = Map.empty
) extends SecretManager {
  val typeName = "env"
  private val formatHints = Set("json", "env", "text", "raw")

  def loadSecrets(tenantId: String): Map[String, Any] = {
    val tenantUpper = tenantId.toUpperCase
    val pfx = prefix.toUpperCase + delimiter
    val allowed =
      if (allowGlobalScope) Set(tenantUpper, "GLOBAL", "ALL") else Set(tenantUpper)
    env.iterator.flatMap { case (key, value) =>
      if (!key.toUpperCase.startsWith(pfx)) None
      else key.split(java.util.regex.Pattern.quote(delimiter)).toList match {
        case _ :: scope :: nameParts if nameParts.nonEmpty &&
            allowed.contains(scope.toUpperCase) =>
          val (hint, parts) =
            if (formatHints.contains(nameParts.last.toLowerCase))
              (Some(nameParts.last.toLowerCase), nameParts.init)
            else (None, nameParts)
          val name = parts.filter(_.nonEmpty).mkString("_").toLowerCase
          if (name.isEmpty) None
          else Some(name -> SecretParsers.parsePayload(value, hint, env))
        case _ => None
      }
    }.toMap
  }
}

/** Filesystem backend (reference secrets/managers/filesystem.py): loads
  * every file under `{secretsDir}/{tenant}/`; `.json` parsed + env-expanded,
  * `.env` parsed as KEY=VALUE, anything else a raw expanded string keyed by
  * the file stem. Unreadable files are skipped with a warning.
  */
final class FilesystemSecretManager(
    secretsDir: Path = Paths.get("/secrets"),
    env: Map[String, String] = sys.env,
    val config: Map[String, Any] = Map.empty
) extends SecretManager {
  val typeName = "filesystem"

  def loadSecrets(tenantId: String): Map[String, Any] = {
    val dir = secretsDir.resolve(tenantId)
    if (!Files.isDirectory(dir))
      throw new IllegalArgumentException(s"Secrets directory not found: $dir")
    val listing = scala.util.Using.resource(Files.list(dir))(
      _.iterator.asScala
        .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("."))
        .toVector)
    listing.flatMap { p =>
      val fileName = p.getFileName.toString
      val (stem, suffix) = fileName.lastIndexOf('.') match {
        case -1 => (fileName, "")
        case i  => (fileName.substring(0, i), fileName.substring(i))
      }
      try {
        val text = new String(Files.readAllBytes(p), "UTF-8")
        val value: Any = suffix match {
          // loadAny (not loadString): a JSON array payload stays a list
          // rather than collapsing to Map.empty, and expansion uses only
          // this manager's env map. A null parse (empty/whitespace file)
          // is a load failure — json.load would raise and the file be
          // skipped with a warning (managers/filesystem.py).
          case ".json" =>
            graft.config.Yaml.loadAny(text) match {
              case null => throw new IllegalArgumentException(
                "empty JSON secret file")
              case parsed => SecretParsers.expandDeep(parsed, env)
            }
          case ".env"  => SecretParsers.parseEnvBlob(text, env)
          case _       => SecretParsers.expandVars(text.trim, env)
        }
        Some(stem -> value)
      } catch {
        case e: Exception =>
          System.err.println(s"[graft] failed to load secret file $p: ${e.getMessage}")
          None
      }
    }.toMap
  }
}

object SecretManagers {

  private def str(config: Map[String, Any], key: String): Option[String] =
    config.get(key).map(_.toString)
  private def seq(config: Map[String, Any], key: String): Seq[Any] =
    config.get(key) match {
      case Some(s: Seq[Any] @unchecked) => s
      case Some(other)                  => Seq(other)
      case None                         => Seq.empty
    }

  /** Registry with the reference's aliases (secrets/__init__.py:41-54).
    * The remote managers (vault/aws/gcp) build their requests at parity
    * with the reference's SDK clients and send them through `transport`
    * — injectable for offline tests, a live HTTP client by default.
    */
  def create(managerType: Option[String],
      secretsDir: Path = Paths.get("/secrets"),
      config: Map[String, Any] = Map.empty,
      env: Map[String, String] = sys.env,
      transport: graft.catalog.HttpTransport =
        new graft.catalog.JavaHttpTransport()): SecretManager =
    managerType.map(_.toLowerCase).getOrElse("env") match {
      case "env" | "environment" =>
        new EnvironmentSecretManager(
          prefix = str(config, "prefix").getOrElse("GRAFT_SECRET"),
          delimiter = str(config, "delimiter").getOrElse("__"),
          allowGlobalScope = config.get("allow_global_scope")
            .forall(v => String.valueOf(v).equalsIgnoreCase("true")),
          env = env, config = config)
      case "filesystem" | "fs" | "file" =>
        new FilesystemSecretManager(
          secretsDir = str(config, "secrets_dir").map(Paths.get(_))
            .getOrElse(secretsDir),
          env = env, config = config)
      case "vault" | "hashicorp" | "hashicorp_vault" =>
        new VaultSecretManager(
          address = str(config, "address"),
          mountPoint = str(config, "mount_point").getOrElse("secret"),
          pathTemplate = str(config, "path_template").getOrElse("{tenant}"),
          kvVersion = str(config, "kv_version").map(_.toInt).getOrElse(2),
          namespace = str(config, "namespace"),
          authMethod = str(config, "auth_method").getOrElse("token"),
          token = str(config, "token"),
          roleId = str(config, "role_id"),
          secretId = str(config, "secret_id"),
          paths = seq(config, "paths"),
          transport = transport, env = env, config = config)
      case "aws" | "aws_secrets_manager" =>
        new AwsSecretsManager(
          regionName = str(config, "region_name"),
          secretIdTemplate = str(config, "secret_id_template")
            .getOrElse("{tenant}/{name}"),
          secrets = seq(config, "secrets"),
          bundleSecretIdTemplate = str(config, "bundle_secret_id_template"),
          bundleFormat = str(config, "bundle_format").getOrElse("json"),
          transport = transport, env = env, config = config)
      case "gcp" | "gcp_secret_manager" =>
        new GcpSecretManager(
          projectId = str(config, "project_id"),
          secretIdTemplate = str(config, "secret_id_template")
            .getOrElse("{tenant}-{name}"),
          secrets = seq(config, "secrets"),
          bundleSecretIdTemplate = str(config, "bundle_secret_id_template"),
          bundleFormat = str(config, "bundle_format").getOrElse("json"),
          version = str(config, "version").getOrElse("latest"),
          accessToken = str(config, "access_token"),
          transport = transport, env = env, config = config)
      case other =>
        throw new IllegalArgumentException(
          s"Unsupported secret manager '$other'. Supported: aws, env, " +
            "environment, file, filesystem, fs, gcp, hashicorp, vault")
    }

  /** Main entry point (secrets/__init__.py:91-117). */
  def loadSecrets(tenantId: String,
      secretsDir: Path = Paths.get("/secrets"),
      managerType: Option[String] = None,
      config: Map[String, Any] = Map.empty,
      env: Map[String, String] = sys.env): Map[String, Any] =
    create(managerType, secretsDir, config, env).loadSecrets(tenantId)

  /** `/secrets/{tenant}/x.env` template → resolved path (base.py:10-23).
    * Parity with base.py's `str.format(tenant=...)`, which raises on any
    * placeholder it wasn't given: a leftover brace group that is NOT a
    * `${VAR}` env reference (a typo like `{tenat}`, or `{name}` copied
    * from a remote-manager template) fails loudly here instead of
    * surfacing later as a missing-file error on the literal path.
    */
  def resolveSecretPath(fileTemplate: String, tenantId: String,
      env: Map[String, String] = sys.env): Path = {
    // Validate the TEMPLATE, not the rendered path: str.format only
    // parses the format string, so a tenant VALUE containing braces is
    // legal and must pass through verbatim. Strip the ${VAR} env
    // references this port deliberately supports, then {tenant}; ANY
    // remaining brace — a typo group like {tenat} or an unbalanced
    // {tenant missing its close — fails loudly.
    val templateResidue = fileTemplate
      .replaceAll("\\$\\{[A-Za-z_][A-Za-z0-9_]*\\}", "")
      .replace("{tenant}", "")
    if (templateResidue.contains('{') || templateResidue.contains('}'))
      throw new IllegalArgumentException(
        s"Unresolved placeholder in secret file_template '$fileTemplate'; " +
          "supported: {tenant} and ${VAR} env references.")
    Paths.get(SecretParsers.expandVars(
      fileTemplate.replace("{tenant}", tenantId), env))
  }

  /** Required-secret presence check per connector (secrets/validation.py):
    * derives requirements from credentials.file_template + connector-
    * specific keys; prefix match on loaded secret names.
    */
  def validateSecretsForConnector(secrets: Map[String, Any],
      connectorType: String, credentials: Map[String, Any],
      env: Map[String, String] = sys.env): Boolean = {
    val credType = credentials.get("type").map(_.toString).getOrElse("none")
    if (credType == "none") return true
    val fromTemplate = credentials.get("file_template").map(_.toString)
      .flatMap { t =>
        "/([^/]+)\\.(json|env|txt|key)$".r.findFirstMatchIn(t).map(_.group(1))
      }
    val specific = connectorType match {
      case "stripe" if !secrets.contains("stripe_api_key") && !secrets.contains("api_key") =>
        Seq("stripe_api_key")
      case "hubspot" if !secrets.contains("hubspot_api_key") && !secrets.contains("api_key") =>
        Seq("hubspot_api_key")
      case t @ ("postgres" | "mysql") if !secrets.contains(t) => Seq(s"$t.env")
      case "iceberg" if !secrets.contains("iceberg") && !secrets.contains("nessie") &&
          !env.contains("NESSIE_URI") => Seq("iceberg.env or NESSIE_URI env var")
      case _ => Seq.empty
    }
    val required = fromTemplate.toSeq ++ specific
    val missing = required.filterNot(r =>
      secrets.keys.exists(k => k == r || k.startsWith(r.takeWhile(_ != '.'))))
    if (missing.nonEmpty)
      throw new IllegalArgumentException(
        s"Missing required secrets for connector '$connectorType': " +
          missing.mkString(", "))
    true
  }

  /** `${secret:name}` / `${secret:name.key}` substitution over a config
    * tree: the graft-side wiring that puts loaded secrets into connector
    * credentials/connection maps without ever writing them to the job YAML.
    */
  def expandSecretRefs(tree: Any, secrets: Map[String, Any]): Any = {
    val re = "\\$\\{secret:([^}]+)\\}".r
    def lookup(ref: String): String = {
      val parts = ref.split("\\.", 2)
      secrets.get(parts(0)) match {
        case Some(m: Map[String, Any] @unchecked) if parts.length == 2 =>
          m.get(parts(1)).map(String.valueOf(_)).getOrElse(
            throw new IllegalArgumentException(
              s"secret '${parts(0)}' has no key '${parts(1)}'"))
        case Some(v) if parts.length == 1 => String.valueOf(v)
        case Some(_) =>
          throw new IllegalArgumentException(
            s"secret '${parts(0)}' is structured; reference a key as " +
              s"$${secret:${parts(0)}.<key>}")
        case None =>
          throw new IllegalArgumentException(s"unknown secret '${parts(0)}'")
      }
    }
    tree match {
      case m: Map[String, Any] @unchecked =>
        m.map { case (k, v) => k -> expandSecretRefs(v, secrets) }
      case l: Seq[Any] @unchecked => l.map(expandSecretRefs(_, secrets))
      case s: String =>
        re.replaceAllIn(s, m =>
          scala.util.matching.Regex.quoteReplacement(lookup(m.group(1))))
      case other => other
    }
  }
}

/** Secret redaction for driver logs (reference logging.py:16-66):
  * key-pattern redaction for password/token/api_key/secret/credential
  * fields, plus exact-value scrubbing of every loaded secret value.
  */
final class Redactor(secretValues: Set[String]) {
  private val keyPatterns = Seq("password", "token", "api_key", "secret", "credential")
    .map(k => s"""(?i)($k["']?\\s*[:=]\\s*["']?)([^"',\\s}]+)""".r)
  // flatten structured secrets to their leaf strings for value scrubbing
  private val values = secretValues.filter(_.length >= 4) // avoid scrubbing "a"

  def redact(line: String): String = {
    val keyed = keyPatterns.foldLeft(line)((acc, re) =>
      re.replaceAllIn(acc, m =>
        scala.util.matching.Regex.quoteReplacement(m.group(1) + "[REDACTED]")))
    values.foldLeft(keyed)((acc, v) => acc.replace(v, "[REDACTED]"))
  }
}

object Redactor {

  /** Collect every leaf string of a loaded-secrets tree. */
  def leafValues(secrets: Map[String, Any]): Set[String] = {
    def walk(v: Any): Iterator[String] = v match {
      case m: Map[String, Any] @unchecked => m.valuesIterator.flatMap(walk)
      case l: Seq[Any] @unchecked         => l.iterator.flatMap(walk)
      case s: String                      => Iterator.single(s)
      case other if other != null         => Iterator.single(String.valueOf(other))
      case _                              => Iterator.empty
    }
    walk(secrets).toSet
  }

  def forSecrets(secrets: Map[String, Any]): Redactor =
    new Redactor(leafValues(secrets))
}
