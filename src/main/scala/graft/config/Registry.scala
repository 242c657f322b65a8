package graft.config

/** Connector-type registry + job validation (reference:
  * registry/connectors.yaml:1-110, enforced src/dativo_ingest/validator.py:88-270).
  *
  * Validation failures throw [[RegistryViolation]] (the reference calls
  * sys.exit(2); the job driver maps this exception to exit code 2).
  */
final case class RegistryViolation(msg: String) extends RuntimeException(msg)

final case class ConnectorDef(
    name: String,
    roles: Seq[String],
    category: Option[String],
    defaultEngine: Option[String],
    enginesSupported: Seq[String],
    allowedInCloud: Boolean,
    supportsIncremental: Boolean,
    incrementalStrategyDefault: Option[String]
)

final case class Registry(connectors: Map[String, ConnectorDef]) {

  /** validator.py:88-140 — type exists + supports role. */
  def validateConnectorType(connectorType: String, role: String): ConnectorDef = {
    val d = connectors.getOrElse(connectorType,
      throw RegistryViolation(
        s"Connector type '$connectorType' not found in registry. " +
          s"Available connectors: ${connectors.keys.toSeq.sorted.mkString(", ")}"))
    if (!d.roles.contains(role))
      throw RegistryViolation(
        s"Connector type '$connectorType' does not support '$role' role. " +
          s"Supported roles: ${d.roles.mkString(", ")}")
    d
  }

  /** validator.py:141-160 — DB connectors blocked in cloud mode. */
  def validateModeRestriction(connectorType: String, mode: String, d: ConnectorDef): Unit =
    if (mode == "cloud" && !d.allowedInCloud)
      throw RegistryViolation(
        s"Connector '$connectorType' is not allowed in cloud mode. " +
          "Database connectors can only run in self_hosted mode.")

  /** validator.py:162-241 — incremental strategy legality. */
  def validateIncrementalStrategy(src: SourceConfig, d: ConnectorDef): Unit =
    src.incremental.foreach { inc =>
      val strategy = Yaml.str(inc, "strategy").getOrElse(
        throw RegistryViolation("Incremental configuration missing 'strategy' field."))
      if (!d.supportsIncremental)
        throw RegistryViolation(
          s"Connector '${src.connectorType}' does not support incremental extraction.")
      val fileStrategies = Seq("file_modified_time", "spreadsheet_modified_time")
      if (!d.incrementalStrategyDefault.contains(strategy) &&
        !fileStrategies.contains(strategy))
        throw RegistryViolation(
          s"Incremental strategy '$strategy' does not match connector default " +
            s"'${d.incrementalStrategyDefault.getOrElse("<none>")}'.")
      strategy match {
        case "updated_at" | "created" | "updated_after" =>
          if (!inc.contains("cursor_field"))
            throw RegistryViolation(
              s"Incremental strategy '$strategy' requires 'cursor_field'.")
        case "file_modified_time" =>
          if (src.files.isEmpty)
            throw RegistryViolation(
              "Incremental strategy 'file_modified_time' requires 'files' configuration.")
        case _ => ()
      }
    }

  /** validator.py:243-270 — full job check. */
  def validateJob(src: SourceConfig, tgt: TargetConfig, mode: String = "self_hosted"): Unit = {
    val sDef = validateConnectorType(src.connectorType, "source")
    validateConnectorType(tgt.connectorType, "target")
    validateModeRestriction(src.connectorType, mode, sDef)
    validateIncrementalStrategy(src, sDef)
  }
}

object Registry {

  def fromYaml(path: String): Registry = fromMap(Yaml.loadFile(path))

  def fromMap(root: Map[String, Any]): Registry = Registry(
    Yaml.map(root, "connectors").map { case (name, v) =>
      val m = v match {
        case x: Map[String, Any] @unchecked => x
        case _                              => Map.empty[String, Any]
      }
      name -> ConnectorDef(
        name = name,
        roles = Yaml.seq(m, "roles").map(_.toString),
        category = Yaml.str(m, "category"),
        defaultEngine = Yaml.str(m, "default_engine"),
        enginesSupported = Yaml.seq(m, "engines_supported").map(_.toString),
        allowedInCloud = Yaml.bool(m, "allowed_in_cloud", dflt = true),
        supportsIncremental = Yaml.bool(m, "supports_incremental"),
        incrementalStrategyDefault = Yaml.str(m, "incremental_strategy_default"))
    })

  /** Built-in default mirroring the reference registry's entries that this
    * engine implements natively (registry/connectors.yaml). Spark-first
    * addition: a `parquet` connector for lakehouse-native reads.
    */
  val default: Registry = fromMap(Yaml.loadString(
    """connectors:
      |  csv:
      |    roles: [source, target]
      |    category: files
      |    default_engine: native
      |    engines_supported: [native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: file_modified_time
      |  markdown_kv:
      |    roles: [source, target]
      |    category: files
      |    default_engine: native
      |    engines_supported: [native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: file_modified_time
      |  parquet:
      |    roles: [source, target]
      |    category: files
      |    default_engine: native
      |    engines_supported: [native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: file_modified_time
      |  jsonl:
      |    roles: [source, target]
      |    category: files
      |    default_engine: native
      |    engines_supported: [native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: file_modified_time
      |  postgres:
      |    roles: [source, target]
      |    category: database
      |    default_engine: jdbc
      |    engines_supported: [jdbc]
      |    allowed_in_cloud: false
      |    supports_incremental: true
      |    incremental_strategy_default: updated_at
      |  mysql:
      |    roles: [source, target]
      |    category: database
      |    default_engine: jdbc
      |    engines_supported: [jdbc]
      |    allowed_in_cloud: false
      |    supports_incremental: true
      |    incremental_strategy_default: updated_at
      |  google_sheets:
      |    roles: [source, target]
      |    category: files
      |    default_engine: native
      |    engines_supported: [native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: spreadsheet_modified_time
      |  gdrive_csv:
      |    roles: [source]
      |    category: files
      |    default_engine: native
      |    engines_supported: [native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: file_modified_time
      |  stripe:
      |    roles: [source]
      |    category: payments
      |    default_engine: airbyte
      |    engines_supported: [airbyte, native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: created
      |  hubspot:
      |    roles: [source]
      |    category: crm
      |    default_engine: airbyte
      |    engines_supported: [airbyte, native]
      |    allowed_in_cloud: true
      |    supports_incremental: true
      |    incremental_strategy_default: updated_after
      |  iceberg:
      |    roles: [target]
      |    default_engine: native
      |    engines_supported: [native, spark]
      |  s3:
      |    roles: [source, target]
      |    default_engine: native
      |    engines_supported: [native]
      |  minio:
      |    roles: [source, target]
      |    default_engine: native
      |    engines_supported: [native]
      |  azure_blob:
      |    roles: [source, target]
      |    default_engine: native
      |    engines_supported: [native]
      |""".stripMargin))
}
