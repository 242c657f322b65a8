package graft.config

import graft.core.{ContractField, DataContract}
import java.io.FileInputStream
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Minimal YAML/JSON config loader over snakeyaml (ships with Spark's
  * jars). Values are plain Scala Map[String, Any] / Seq[Any] trees — the
  * reference's Pydantic models become case classes constructed from these.
  */
object Yaml {

  /** `${VAR}` / `${VAR:-default}` expansion, the reference's env-var
    * semantics (config.py uses os.path.expandvars on paths;
    * postgres_extractor.py:96-111 adds the `:-default` form).
    */
  def expandEnv(s: String, env: Map[String, String] = sys.env): String = {
    val re = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)(?::-([^}]*))?\\}".r
    re.replaceAllIn(s, m => {
      val v = env.get(m.group(1)).orElse(Option(m.group(2))).getOrElse(m.group(0))
      scala.util.matching.Regex.quoteReplacement(v)
    })
  }

  private def toScala(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScala(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScala).toSeq
    case s: String            => expandEnv(s)
    case other                => other
  }

  def loadFile(path: String): Map[String, Any] = {
    val in = new FileInputStream(path)
    try {
      val y = new org.yaml.snakeyaml.Yaml()
      toScala(y.load[java.util.Map[String, Any]](in)) match {
        case m: Map[String, Any] @unchecked => m
        case _ => Map.empty
      }
    } finally in.close()
  }

  def loadString(s: String): Map[String, Any] = {
    val y = new org.yaml.snakeyaml.Yaml()
    toScala(y.load[java.util.Map[String, Any]](s)) match {
      case m: Map[String, Any] @unchecked => m
      case _ => Map.empty
    }
  }

  private def toScalaRaw(v: Any): Any = v match {
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, x) => k.toString -> toScalaRaw(x) }.toMap
    case l: java.util.List[_] => l.asScala.map(toScalaRaw).toSeq
    case other                => other
  }

  /** Raw parse that preserves the top-level shape (map, list, or scalar)
    * and performs NO env expansion — for payloads (e.g. secrets) where the
    * caller applies its own expansion semantics against its own env map.
    */
  def loadAny(s: String): Any = {
    val y = new org.yaml.snakeyaml.Yaml()
    toScalaRaw(y.load[Any](s))
  }

  // typed accessors over the Any-tree
  def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).collect { case s if s != null => s.toString }
  def map(m: Map[String, Any], k: String): Map[String, Any] =
    m.get(k) match {
      case Some(x: Map[String, Any] @unchecked) => x
      case _                                    => Map.empty
    }
  def seq(m: Map[String, Any], k: String): Seq[Any] =
    m.get(k) match {
      case Some(x: Seq[Any] @unchecked) => x
      case _                            => Seq.empty
    }
  def bool(m: Map[String, Any], k: String, dflt: Boolean = false): Boolean =
    m.get(k) match {
      case Some(b: java.lang.Boolean) => b
      case Some(s: String)            => s.equalsIgnoreCase("true")
      case _                          => dflt
    }
}

/** Connector recipe — the unified format (reference:
  * src/dativo_ingest/config.py:15-57; instances connectors/csv.yaml etc.).
  */
final case class ConnectorRecipe(
    name: String,
    connectorType: String,
    roles: Seq[String],
    description: Option[String],
    defaultEngine: Map[String, Any],
    credentials: Map[String, Any],
    incremental: Map[String, Any],
    connectionTemplate: Map[String, Any],
    fileFormat: Option[String],
    partitioningDefault: Seq[String],
    catalog: Map[String, Any]
) {
  def supportsRole(role: String): Boolean = roles.contains(role)
}

object ConnectorRecipe {
  def fromYaml(path: String): ConnectorRecipe = fromMap(Yaml.loadFile(path))

  def fromMap(m: Map[String, Any]): ConnectorRecipe = {
    val typ = Yaml.str(m, "type").getOrElse(
      throw new IllegalArgumentException("connector recipe missing 'type'"))
    ConnectorRecipe(
      name = Yaml.str(m, "name").getOrElse(typ),
      connectorType = typ,
      roles = Yaml.seq(m, "roles").map(_.toString),
      description = Yaml.str(m, "description"),
      defaultEngine = Yaml.map(m, "default_engine"),
      credentials = Yaml.map(m, "credentials"),
      incremental = Yaml.map(m, "incremental"),
      connectionTemplate = Yaml.map(m, "connection_template"),
      fileFormat = Yaml.str(m, "file_format"),
      partitioningDefault = Yaml.seq(m, "partitioning_default").map(_.toString),
      catalog = Yaml.map(m, "catalog"))
  }
}

/** Resolved source config (recipe deep-merged with the job's `source:`
  * block — reference `_merge_source_with_recipe`, config.py:625-712).
  */
final case class SourceConfig(
    connectorType: String,
    engine: Map[String, Any],
    credentials: Map[String, Any],
    incremental: Option[Map[String, Any]],
    raw: Map[String, Any]
) {
  def files: Seq[Map[String, Any]] =
    Yaml.seq(raw, "files").collect { case m: Map[String, Any] @unchecked => m }
  def tables: Seq[Map[String, Any]] =
    Yaml.seq(raw, "tables").collect { case m: Map[String, Any] @unchecked => m }
  def objects: Seq[String] = Yaml.seq(raw, "objects").map(_.toString)
}

/** Resolved target config (reference `_merge_target_with_recipe`,
  * config.py:714-762).
  */
final case class TargetConfig(
    connectorType: String,
    fileFormat: Option[String],
    partitioning: Seq[String],
    connection: Map[String, Any],
    catalog: Map[String, Any],
    branch: Option[String],
    parquetTargetSizeMb: Int,
    raw: Map[String, Any]
)

/** Asset definition → DataContract (reference config.py:195-375; the
  * nested `asset:` wrapper of the fixture YAMLs is supported like the
  * legacy-migration path, config.py:249-288).
  */
object AssetLoader {
  def fromYaml(path: String, validateSchema: Boolean = false): DataContract = {
    if (!Files.exists(Paths.get(path)))
      throw new IllegalArgumentException(s"asset file not found: $path") // exit 2
    val data = Odcs.migrateOldFormat(Yaml.loadFile(path))
    if (validateSchema) Odcs.validateAgainstSchema(data) // config.py:367-374 (opt-in)
    fromMap(data)
  }

  def fromMap(root: Map[String, Any]): DataContract = {
    // read governance-only keys the migration intentionally drops
    // (config.py pops governance wholesale) before migrating
    val rawGovernance = Yaml.map(
      if (root.contains("asset")) Yaml.map(root, "asset") else root, "governance")
    val m = Odcs.migrateOldFormat(root)
    val schema = Yaml.seq(m, "schema").collect {
      case f: Map[String, Any] @unchecked =>
        ContractField(
          name = Yaml.str(f, "name").getOrElse(
            throw new IllegalArgumentException("schema field missing 'name'")),
          odcsType = Yaml.str(f, "type").getOrElse("string"),
          required = Yaml.bool(f, "required"),
          classification = Yaml.str(f, "classification"),
          description = Yaml.str(f, "description"))
    }
    if (schema.isEmpty) // config.py:786-823 hard-fails on missing/empty schema
      throw new IllegalArgumentException("asset definition has no schema fields")
    val team = Yaml.map(m, "team")
    val governance = rawGovernance
    val compliance = Yaml.map(m, "compliance")
    DataContract(
      name = Yaml.str(m, "name").getOrElse("asset"),
      version = Yaml.str(m, "version").getOrElse("v1.0"),
      domain = Yaml.str(m, "domain").orElse(Yaml.str(team, "domain")),
      dataProduct = Yaml.str(m, "data_product")
        .orElse(Yaml.str(m, "dataProduct")) // flat ODCS uses camelCase
        .orElse(Yaml.str(team, "data_product")),
      owner = Yaml.str(m, "owner").orElse(Yaml.str(team, "owner")),
      retentionDays = Yaml.str(governance, "retention_days")
        .orElse(Yaml.str(compliance, "retention_days")).map(_.toInt),
      defaultClassification = Yaml.str(governance, "default_classification"),
      tags = Yaml.map(m, "tags").map { case (k, v) => k -> String.valueOf(v) },
      complianceClassification = Yaml.seq(compliance, "classification").map(_.toString),
      regulations = Yaml.seq(compliance, "regulations").map(_.toString),
      finops = Yaml.map(m, "finops"),
      sourceType = Yaml.str(m, "source_type"),
      objectName = Yaml.str(m, "object"),
      fields = schema)
  }
}

/** Job config + recipe resolution (reference config.py:519-780). */
final case class JobConfig(
    tenantId: String,
    environment: Option[String],
    sourceConnectorPath: Option[String],
    targetConnectorPath: Option[String],
    assetPath: Option[String],
    validationMode: String,
    sourceOverrides: Map[String, Any],
    targetOverrides: Map[String, Any],
    raw: Map[String, Any]
) {

  /** One-level-nested deep merge, matching Python's `{**a, **b}` on dict
    * values (config.py:653-672, :744-752).
    */
  private def merge(base: Map[String, Any], over: Map[String, Any]): Map[String, Any] =
    over.foldLeft(base) { case (acc, (k, v)) =>
      (acc.get(k), v) match {
        case (Some(b: Map[String, Any] @unchecked), o: Map[String, Any] @unchecked) =>
          acc.updated(k, b ++ o)
        case _ => acc.updated(k, v)
      }
    }

  def resolveSource(recipe: ConnectorRecipe): SourceConfig = {
    require(recipe.supportsRole("source"),
      s"Connector '${recipe.name}' does not support source role. Supported roles: ${recipe.roles}")
    // incremental disabled unless the job explicitly configures it
    val base = Map[String, Any](
      "type" -> recipe.connectorType,
      "engine" -> recipe.defaultEngine,
      "credentials" -> recipe.credentials)
    val merged = merge(base, sourceOverrides)
    val incremental = sourceOverrides.get("incremental") match {
      case Some(m: Map[String, Any] @unchecked) if m.nonEmpty =>
        Some(recipe.incremental ++ m) // merge with recipe defaults
      case Some(_) | None => None // null / {} / absent ⇒ disabled
    }
    val withState = incremental.map { inc =>
      if (inc.contains("state_path")) inc
      else {
        // default state path .local/state/{tenant}/{type}.{object}.state.json
        // (config.py:682-711)
        val objectName =
          Yaml.seq(sourceOverrides, "objects").headOption.map(_.toString)
            .orElse(Yaml.seq(sourceOverrides, "files").collectFirst {
              case f: Map[String, Any] @unchecked if f.contains("object") =>
                f("object").toString
            })
            .orElse(Yaml.seq(sourceOverrides, "tables").collectFirst {
              case t: Map[String, Any] @unchecked if t.contains("object") =>
                t("object").toString
            })
            .getOrElse("default")
        val stateDir = sys.env.getOrElse("STATE_DIR", ".local/state")
        inc + ("state_path" ->
          s"$stateDir/$tenantId/${recipe.connectorType}.$objectName.state.json")
      }
    }
    SourceConfig(
      connectorType = recipe.connectorType,
      engine = Yaml.map(merged, "engine"),
      credentials = Yaml.map(merged, "credentials"),
      incremental = withState,
      raw = merged)
  }

  def resolveTarget(recipe: ConnectorRecipe): TargetConfig = {
    require(recipe.supportsRole("target"),
      s"Connector '${recipe.name}' does not support target role. Supported roles: ${recipe.roles}")
    val base = Map[String, Any](
      "type" -> recipe.connectorType,
      "catalog" -> recipe.catalog,
      "file_format" -> recipe.fileFormat.getOrElse("parquet"),
      "partitioning" -> recipe.partitioningDefault,
      "connection" -> recipe.connectionTemplate)
    val merged = merge(base, targetOverrides)
    val catalog = Yaml.map(merged, "catalog")
    // branch defaults to tenant when a catalog is configured (config.py:756-761)
    val branch = Yaml.str(merged, "branch")
      .orElse(if (catalog.nonEmpty) Some(tenantId) else None)
    TargetConfig(
      connectorType = Yaml.str(merged, "type").getOrElse(recipe.connectorType),
      fileFormat = Yaml.str(merged, "file_format"),
      partitioning = Yaml.seq(merged, "partitioning").map(_.toString),
      connection = Yaml.map(merged, "connection"),
      catalog = catalog,
      branch = branch,
      parquetTargetSizeMb = Yaml.str(merged, "parquet_target_size_mb")
        .map(_.toDouble.toInt).getOrElse(graft.sinks.ParquetSink.DefaultTargetMb),
      raw = merged)
  }
}

object JobConfig {
  def fromYaml(path: String): JobConfig = fromMap(Yaml.loadFile(path))

  def fromMap(m: Map[String, Any]): JobConfig = JobConfig(
    tenantId = Yaml.str(m, "tenant_id").getOrElse(
      throw new IllegalArgumentException("job config missing tenant_id")),
    environment = Yaml.str(m, "environment"),
    sourceConnectorPath = Yaml.str(m, "source_connector_path"),
    targetConnectorPath = Yaml.str(m, "target_connector_path"),
    assetPath = Yaml.str(m, "asset_path"),
    validationMode = Yaml.str(m, "schema_validation_mode").getOrElse("strict"),
    sourceOverrides = Yaml.map(m, "source"),
    targetOverrides = Yaml.map(m, "target"),
    raw = m)
}
