package graft.secrets

import graft.catalog.{HttpRequest, HttpTransport, JavaHttpTransport, Json}
import Json.obj

/** Remote secret managers at request parity with the reference
  * (src/dativo_ingest/secrets/managers/{vault,aws,gcp}.py): every HTTP
  * request the reference's SDK clients (hvac / boto3 / google-cloud)
  * would issue is reconstructed verbatim — URL, auth headers, JSON body
  * — against the same injectable [[graft.catalog.HttpTransport]] the
  * catalog clients use, so the full request-construction and
  * payload-parsing logic is exercised offline by a recording transport.
  * Only the wire call itself is swappable (zero-egress builds never
  * connect; a real deploy uses the default [[JavaHttpTransport]]).
  */
object RemoteSecretManagers {

  /** Concrete secret to resolve from a remote manager
    * (reference base.py:40-61).
    */
  final case class SecretDefinition(
      name: String,
      identifier: Option[String] = None,
      versionStage: Option[String] = None,
      versionId: Option[String] = None,
      format: Option[String] = None) {

    /** base.py:50-61: explicit identifier wins, else the template;
      * both substitute {tenant} and {name}.
      */
    def resolveIdentifier(tenantId: String, template: String): String =
      RemoteSecretManagers.renderTemplate(identifier.getOrElse(template),
        "tenant" -> tenantId, "name" -> name)
  }

  /** base.py:64-98: entries are bare names or maps with `name` plus
    * optional id/identifier, version_stage, version_id, format.
    */
  def buildSecretDefinitions(entries: Seq[Any]): Seq[SecretDefinition] =
    entries.map {
      case s: String => SecretDefinition(s)
      case m: Map[String, Any] @unchecked =>
        val name = m.getOrElse("name", throw new IllegalArgumentException(
          "Secret definition dictionaries must include 'name'.")).toString
        SecretDefinition(
          name,
          identifier = m.get("id").orElse(m.get("identifier")).map(_.toString),
          versionStage = m.get("version_stage").map(_.toString),
          versionId = m.get("version_id").map(_.toString),
          format = m.get("format").map(_.toString))
      case _ => throw new IllegalArgumentException(
        "Secret definitions must be strings or dictionaries.")
    }

  private[secrets] def base64Utf8(b64: String): String =
    new String(java.util.Base64.getDecoder.decode(b64), "UTF-8")

  /** Substitute `{key}` placeholders, failing fast on TEMPLATE defects.
    * The reference renders these templates with Python's `str.format`,
    * which raises on unknown placeholders (a typo like `{tenat}` or a
    * stray `{name}` in a path template); a silent `.replace` would turn
    * that loud config error into a confusing 404-style read failure
    * against the remote manager.
    *
    * Validation inspects the TEMPLATE, never the rendered result —
    * str.format only parses the format string, so a tenant id or secret
    * name whose VALUE contains braces is legal and must render
    * verbatim. Substitution is a single left-to-right pass for the same
    * reason: a sequential `.replace` chain would re-scan earlier
    * substituted values and expand placeholder-shaped text inside them.
    */
  private val placeholderRe = "\\{([^{}]*)\\}".r
  private[secrets] def renderTemplate(template: String,
      subs: (String, String)*): String = {
    val subMap = subs.toMap
    def fail(what: String): Nothing =
      throw new IllegalArgumentException(
        s"$what in secret template '$template'; supported: " +
          subs.map { case (k, _) => s"{$k}" }.mkString(", "))
    placeholderRe.findAllMatchIn(template).foreach { m =>
      if (!subMap.contains(m.group(1)))
        fail(s"Unresolved placeholder '{${m.group(1)}}'")
    }
    val stripped = placeholderRe.replaceAllIn(template, "")
    if (stripped.contains('{') || stripped.contains('}'))
      fail("Unbalanced brace")
    placeholderRe.replaceAllIn(template,
      m => scala.util.matching.Regex.quoteReplacement(subMap(m.group(1))))
  }
}

/** HashiCorp Vault KV backend (reference managers/vault.py). hvac is a
  * thin wrapper over Vault's public HTTP API; the requests replayed here
  * are exactly the ones it sends:
  *
  *  - approle login (vault.py:155-158): POST
  *    `{addr}/v1/auth/approle/login` `{"role_id","secret_id"}` →
  *    `auth.client_token`.
  *  - `client.is_authenticated()` (vault.py:162-163): GET
  *    `{addr}/v1/auth/token/lookup-self` with the token; non-200 →
  *    "Vault authentication failed."
  *  - KV v1 read (vault.py:181-185): GET `{addr}/v1/{mount}/{path}` →
  *    `data`.
  *  - KV v2 read (vault.py:186-189): GET
  *    `{addr}/v1/{mount}/data/{path}` → `data.data`.
  *
  * Every read carries `X-Vault-Token` (and `X-Vault-Namespace` when
  * set); per-path mount_point/kv_version overrides and the {tenant}
  * path template follow vault.py:81-124, and each path's secrets are
  * env-expanded and merged in order (vault.py:71-78).
  */
final class VaultSecretManager(
    address: Option[String] = None,
    mountPoint: String = "secret",
    pathTemplate: String = "{tenant}",
    kvVersion: Int = 2,
    namespace: Option[String] = None,
    authMethod: String = "token",
    token: Option[String] = None,
    roleId: Option[String] = None,
    secretId: Option[String] = None,
    paths: Seq[Any] = Seq.empty,
    transport: HttpTransport = new JavaHttpTransport(),
    env: Map[String, String] = sys.env,
    val config: Map[String, Any] = Map.empty
) extends SecretManager {
  val typeName = "vault"

  private val addr = address.orElse(env.get("VAULT_ADDR")).map(_.stripSuffix("/"))
    .getOrElse(throw new IllegalArgumentException(
      "Vault address is required (set 'address' or VAULT_ADDR)."))
  private val ns = namespace.orElse(env.get("VAULT_NAMESPACE"))
  private val configuredToken = token.orElse(env.get("VAULT_TOKEN"))
  private val rid = roleId.orElse(env.get("VAULT_ROLE_ID"))
  private val sid = secretId.orElse(env.get("VAULT_SECRET_ID"))

  private case class PathCfg(path: String, mount: String, kv: Int)

  /** vault.py:81-124: default to the template; strings inherit the
    * manager's mount/kv; dicts may override per path.
    */
  private val normalizedPaths: Seq[PathCfg] =
    if (paths.isEmpty) Seq(PathCfg(pathTemplate, mountPoint, kvVersion))
    else paths.map {
      case s: String => PathCfg(s, mountPoint, kvVersion)
      case m: Map[String, Any] @unchecked if m.contains("path") =>
        PathCfg(m("path").toString,
          m.get("mount_point").map(_.toString).getOrElse(mountPoint),
          m.get("kv_version").map(_.toString.toInt).getOrElse(kvVersion))
      case _ => throw new IllegalArgumentException(
        "Each Vault path entry must be a string or dict with 'path'.")
    }

  private def headers(tok: Option[String]): Map[String, String] =
    Map("Content-Type" -> "application/json") ++
      tok.map("X-Vault-Token" -> _) ++
      ns.map("X-Vault-Namespace" -> _)

  /** vault.py:151-163: token or approle, then is_authenticated(). */
  private def authenticate(): String = {
    val tok = authMethod match {
      case "token" =>
        configuredToken.getOrElse(throw new IllegalArgumentException(
          "Vault token is required for token authentication."))
      case "approle" =>
        val (r, s) = (rid, sid) match {
          case (Some(r0), Some(s0)) => (r0, s0)
          case _ => throw new IllegalArgumentException(
            "role_id and secret_id are required for approle auth.")
        }
        val resp = transport.send(HttpRequest("POST",
          s"$addr/v1/auth/approle/login", headers(None),
          Some(Json.render(obj("role_id" -> r, "secret_id" -> s)))))
        if (resp.status != 200)
          throw new IllegalArgumentException("Vault authentication failed.")
        Json.parse(resp.body).get("auth") match {
          case Some(a: Map[String, Any] @unchecked) =>
            a.get("client_token").map(_.toString).getOrElse(
              throw new IllegalArgumentException("Vault authentication failed."))
          case _ =>
            throw new IllegalArgumentException("Vault authentication failed.")
        }
      case other => throw new IllegalArgumentException(
        s"Unsupported Vault auth_method: $other")
    }
    val check = transport.send(HttpRequest("GET",
      s"$addr/v1/auth/token/lookup-self", headers(Some(tok)), None))
    if (check.status != 200)
      throw new IllegalArgumentException("Vault authentication failed.")
    tok
  }

  def loadSecrets(tenantId: String): Map[String, Any] = {
    val tok = authenticate()
    normalizedPaths.foldLeft(Map.empty[String, Any]) { (acc, pc) =>
      val rendered = RemoteSecretManagers.renderTemplate(pc.path,
        "tenant" -> tenantId)
      val url =
        if (pc.kv == 1) s"$addr/v1/${pc.mount}/$rendered"
        else s"$addr/v1/${pc.mount}/data/$rendered"
      val resp = transport.send(HttpRequest("GET", url, headers(Some(tok)), None))
      if (resp.status != 200)
        throw new IllegalArgumentException(
          s"Vault read failed for path '$rendered' (HTTP ${resp.status}).")
      val data = Json.parse(resp.body).get("data") match {
        case Some(d: Map[String, Any] @unchecked) =>
          if (pc.kv == 1) d
          else d.get("data") match {
            case Some(dd: Map[String, Any] @unchecked) => dd
            case _                                     => Map.empty[String, Any]
          }
        case _ => Map.empty[String, Any]
      }
      if (data.isEmpty) acc
      else acc ++ SecretParsers.expandDeep(data, env)
        .asInstanceOf[Map[String, Any]]
    }
  }
}

/** AWS Secrets Manager backend (reference managers/aws.py). boto3's
  * `get_secret_value` is one POST to the public JSON-1.1 API:
  *
  *  - endpoint `https://secretsmanager.{region}.amazonaws.com/`
  *  - headers `Content-Type: application/x-amz-json-1.1`,
  *    `X-Amz-Target: secretsmanager.GetSecretValue`
  *  - body `{"SecretId": ..., "VersionId"?: ..., "VersionStage"?: ...}`
  *    with absent versions omitted, exactly as aws.py:107-131 builds the
  *    params dict.
  *
  * Request signing (SigV4) is environment plumbing boto3 layers under
  * the call; it is injectable here (`sign`) so a real deploy plugs a
  * signer while request parity stays testable offline. Payload
  * semantics follow aws.py:42-83 and 132-141: per-definition
  * `secret_id_template` resolution, bundle mode via
  * `bundle_secret_id_template` (must parse to a dict), `SecretString`
  * preferred, `SecretBinary` base64-decoded to UTF-8, missing both → "".
  */
final class AwsSecretsManager(
    regionName: Option[String] = None,
    secretIdTemplate: String = "{tenant}/{name}",
    secrets: Seq[Any] = Seq.empty,
    bundleSecretIdTemplate: Option[String] = None,
    bundleFormat: String = "json",
    transport: HttpTransport = new JavaHttpTransport(),
    sign: HttpRequest => HttpRequest = identity,
    env: Map[String, String] = sys.env,
    val config: Map[String, Any] = Map.empty
) extends SecretManager {
  import RemoteSecretManagers._
  val typeName = "aws"

  private val region = regionName.orElse(env.get("AWS_REGION"))
    .orElse(env.get("AWS_DEFAULT_REGION"))
    .getOrElse(throw new IllegalArgumentException(
      "AWS region is required (set 'region_name' or AWS_REGION)."))
  private val definitions = buildSecretDefinitions(secrets)
  private val endpoint = s"https://secretsmanager.$region.amazonaws.com/"

  private def getSecretValue(secretId: String,
      versionId: Option[String] = None,
      versionStage: Option[String] = None): String = {
    val params = Seq[(String, Any)]("SecretId" -> secretId) ++
      versionId.map("VersionId" -> _) ++
      versionStage.map("VersionStage" -> _)
    val resp = transport.send(sign(HttpRequest("POST", endpoint,
      Map("Content-Type" -> "application/x-amz-json-1.1",
        "X-Amz-Target" -> "secretsmanager.GetSecretValue"),
      Some(Json.render(Json.JObj(params))))))
    if (resp.status != 200)
      throw new IllegalArgumentException(
        s"AWS GetSecretValue failed for '$secretId' (HTTP ${resp.status}).")
    val body = Json.parse(resp.body)
    body.get("SecretString").map(_.toString).getOrElse(
      body.get("SecretBinary").map(b => base64Utf8(b.toString)).getOrElse(""))
  }

  def loadSecrets(tenantId: String): Map[String, Any] =
    if (definitions.nonEmpty)
      definitions.map { d =>
        val sid = d.resolveIdentifier(tenantId, secretIdTemplate)
        d.name -> SecretParsers.parsePayload(
          getSecretValue(sid, d.versionId, d.versionStage), d.format, env)
      }.toMap
    else bundleSecretIdTemplate match {
      case None => throw new IllegalArgumentException(
        "AWS Secrets Manager requires either 'secrets' definitions or " +
          "'bundle_secret_id_template'.")
      case Some(t) =>
        val payload = getSecretValue(RemoteSecretManagers.renderTemplate(
          t, "tenant" -> tenantId))
        SecretParsers.parsePayload(payload, Some(bundleFormat), env) match {
          case m: Map[String, Any] @unchecked => m
          case _ => throw new IllegalArgumentException(
            "AWS bundle secret must deserialize into a dictionary.")
        }
    }
}

/** Google Cloud Secret Manager backend (reference managers/gcp.py). The
  * SDK's `access_secret_version(name=...)` is one GET to the public REST
  * API:
  *
  *  - `https://secretmanager.googleapis.com/v1/{resource}:access` with
  *    `Authorization: Bearer {access_token}`
  *  - resource per gcp.py:126-140: ids already starting with
  *    `projects/` pass through, otherwise
  *    `projects/{project_id}/secrets/{secret_id}`, always suffixed
  *    `/versions/{version}` (per-definition version_id overrides the
  *    manager default "latest", gcp.py:65-69)
  *  - response `payload.data` is base64; decoded to UTF-8
  *    (gcp.py:120-124).
  *
  * The bearer token is what google-auth would mint from application
  * default credentials — injectable (`accessToken` /
  * GOOGLE_OAUTH_ACCESS_TOKEN) for the same reason AWS signing is.
  */
final class GcpSecretManager(
    projectId: Option[String] = None,
    secretIdTemplate: String = "{tenant}-{name}",
    secrets: Seq[Any] = Seq.empty,
    bundleSecretIdTemplate: Option[String] = None,
    bundleFormat: String = "json",
    version: String = "latest",
    accessToken: Option[String] = None,
    transport: HttpTransport = new JavaHttpTransport(),
    env: Map[String, String] = sys.env,
    val config: Map[String, Any] = Map.empty
) extends SecretManager {
  import RemoteSecretManagers._
  val typeName = "gcp"

  private val project = projectId.orElse(env.get("GOOGLE_CLOUD_PROJECT"))
    .getOrElse(throw new IllegalArgumentException(
      "project_id is required for GCP secret manager."))
  private val definitions = buildSecretDefinitions(secrets)

  private def resourceName(secretId: String, ver: String): String = {
    val base =
      if (secretId.startsWith("projects/")) secretId
      else s"projects/$project/secrets/$secretId"
    s"$base/versions/$ver"
  }

  private def accessSecret(secretId: String, ver: String): String = {
    val tok = accessToken.orElse(env.get("GOOGLE_OAUTH_ACCESS_TOKEN"))
      .getOrElse(throw new IllegalArgumentException(
        "GCP access token is required (set 'access_token' or " +
          "GOOGLE_OAUTH_ACCESS_TOKEN)."))
    val name = resourceName(secretId, ver)
    val resp = transport.send(HttpRequest("GET",
      s"https://secretmanager.googleapis.com/v1/$name:access",
      Map("Authorization" -> s"Bearer $tok"), None))
    if (resp.status != 200)
      throw new IllegalArgumentException(
        s"GCP access_secret_version failed for '$name' (HTTP ${resp.status}).")
    Json.parse(resp.body).get("payload") match {
      case Some(p: Map[String, Any] @unchecked) =>
        p.get("data").map(d => base64Utf8(d.toString)).getOrElse("")
      case _ => ""
    }
  }

  def loadSecrets(tenantId: String): Map[String, Any] =
    if (definitions.nonEmpty)
      definitions.map { d =>
        val sid = d.resolveIdentifier(tenantId, secretIdTemplate)
        d.name -> SecretParsers.parsePayload(
          accessSecret(sid, d.versionId.getOrElse(version)), d.format, env)
      }.toMap
    else bundleSecretIdTemplate match {
      case None => throw new IllegalArgumentException(
        "GCP Secret Manager requires either 'secrets' definitions or " +
          "'bundle_secret_id_template'.")
      case Some(t) =>
        val payload = accessSecret(RemoteSecretManagers.renderTemplate(
          t, "tenant" -> tenantId), version)
        SecretParsers.parsePayload(payload, Some(bundleFormat), env) match {
          case m: Map[String, Any] @unchecked => m
          case _ => throw new IllegalArgumentException(
            "GCP bundle secret must deserialize into a dictionary.")
        }
    }
}
