package graft.catalog

import Json.obj

/** Databricks Unity Catalog backend (reference: catalog/databricks_unity.py).
  *
  * Same offline-testable construction as [[OpenMetadataCatalog]]: every
  * request the reference sends — the tables GET, the SQL-statement POSTs
  * with escaped literals, the owner PATCH — is built verbatim against
  * the injectable transport.
  */
final class DatabricksUnityCatalog(
    workspaceUrl: String,
    accessToken: String,
    transport: HttpTransport = new JavaHttpTransport(),
    catalogName: String = "main",
    defaultDatabase: String = "default",
    warehouseId: Option[String] = None,
    log: String => Unit = m => System.err.println(s"[graft] $m")
) extends CatalogClient {

  require(workspaceUrl != null && workspaceUrl.nonEmpty &&
    accessToken != null && accessToken.nonEmpty,
    "Databricks workspace_url and access_token are required. " +
      "Set them in catalog.connection or environment variables.")

  private val headers = Map(
    "Authorization" -> s"Bearer $accessToken",
    "Content-Type" -> "application/json")

  /** databricks_unity.py:124-138 — double single quotes. */
  def escapeSql(value: String): String =
    if (value == null) "" else value.replace("'", "''")

  private def fullName(database: String, table: String): String = {
    val db = if (database.nonEmpty) database else defaultDatabase
    s"$catalogName.$db.$table"
  }

  private def sqlStatement(statement: String, withWarehouse: Boolean): HttpResponse =
    transport.send(HttpRequest("POST", s"$workspaceUrl/api/2.0/sql/statements",
      headers, Some(Json.render(
        if (withWarehouse) obj("statement" -> statement, "warehouse_id" -> warehouseId)
        else obj("statement" -> statement)))))

  /** databricks_unity.py:49-122: GET the table; on miss CREATE TABLE IF
    * NOT EXISTS ... USING DELTA LOCATION via the SQL API.
    */
  def ensureTable(
      table: String,
      database: String = "",
      schema: Seq[graft.core.ContractField] = Seq.empty,
      location: String = ""): String = {
    val full = fullName(database, table)
    try {
      val r = transport.send(HttpRequest("GET",
        s"$workspaceUrl/api/2.1/unity-catalog/tables/$full", headers, None))
      if (r.status == 200) return full
    } catch { case _: Exception => () }
    val columns =
      if (schema.isEmpty) "id string"
      else schema.map { f =>
        val t = DatabricksUnityCatalog.mapType(f.odcsType)
        val nn = if (f.required) " NOT NULL" else ""
        s"${f.name} $t$nn"
      }.mkString(", ")
    val createSql =
      s"""CREATE TABLE IF NOT EXISTS $full
         |($columns)
         |USING DELTA
         |LOCATION '${escapeSql(location)}'""".stripMargin
    try sqlStatement(createSql, withWarehouse = true)
    catch { case e: Exception =>
      log(s"Failed to create Unity Catalog table: ${e.getMessage}")
    }
    full
  }

  /** databricks_unity.py:161-243: owner via table PATCH; comment + tags
    * as ONE SET TBLPROPERTIES statement with escaped keys and values.
    */
  def pushMetadata(
      table: String,
      database: String = "",
      tags: Seq[String] = Seq.empty,
      owners: Seq[String] = Seq.empty,
      description: Option[String] = None): String = {
    val full = fullName(database, table)
    if (owners.nonEmpty)
      try transport.send(HttpRequest("PATCH",
        s"$workspaceUrl/api/2.1/unity-catalog/tables/$full", headers,
        Some(Json.render(obj("owner" -> owners.head)))))
      catch { case _: Exception => () }
    val props =
      description.map("comment" -> _).toSeq ++
      (if (tags.nonEmpty) Seq("tags" -> tags.mkString(",")) else Nil)
    if (props.nonEmpty) {
      val pairs = props.map { case (k, v) =>
        s"'${escapeSql(k)}' = '${escapeSql(v)}'" }.mkString(", ")
      try {
        val r = sqlStatement(s"ALTER TABLE $full SET TBLPROPERTIES ($pairs)",
          withWarehouse = false)
        if (r.status == 200 || r.status == 201) return "success"
      } catch { case e: Exception =>
        log(s"Failed to update Unity Catalog metadata: ${e.getMessage}")
      }
    }
    "partial"
  }

  /** databricks_unity.py:245-300: lineage via TBLPROPERTIES. */
  def pushTableLineage(
      sourceFqns: Seq[String],
      targetTable: String,
      database: String = "",
      operation: String = "ingest"): String = {
    val full = fullName(database, targetTable)
    val alterSql =
      s"""ALTER TABLE $full
         |SET TBLPROPERTIES (
         |  'lineage_sources' = '${escapeSql(sourceFqns.mkString(","))}',
         |  'lineage_operation' = '${escapeSql(operation)}'
         |)""".stripMargin
    try {
      val r = sqlStatement(alterSql, withWarehouse = false)
      if (r.status == 200 || r.status == 201) "success" else "partial"
    } catch { case e: Exception =>
      log(s"Failed to push Unity Catalog lineage: ${e.getMessage}")
      "partial"
    }
  }

  // ----------------------------------------------- CatalogClient bridge
  private def split(fqn: String): (String, String) = {
    val i = fqn.lastIndexOf('.')
    if (i < 0) (defaultDatabase, fqn) else (fqn.take(i), fqn.drop(i + 1))
  }
  def ensureEntity(entity: CatalogEntity): Unit = {
    val (db, name) = split(entity.fullyQualifiedName)
    ensureTable(name, db)
  }
  def pushTags(fqn: String, tags: Map[String, String]): Unit = {
    val (db, name) = split(fqn)
    pushMetadata(name, db, tags = tags.map { case (k, v) => s"$k=$v" }.toSeq.sorted)
  }
  def pushOwner(fqn: String, owner: String): Unit = {
    val (db, name) = split(fqn)
    pushMetadata(name, db, owners = Seq(owner))
  }
  def pushLineage(edge: LineageEdge): Unit = {
    val (db, name) = split(edge.targetFqn)
    pushTableLineage(Seq(edge.sourceFqn), name, db)
  }
}

object DatabricksUnityCatalog {
  /** databricks_unity.py:140-159. */
  def mapType(fieldType: String): String = fieldType.toLowerCase match {
    case "string"                 => "STRING"
    case "integer"                => "BIGINT"
    case "float"                  => "FLOAT"
    case "double"                 => "DOUBLE"
    case "boolean"                => "BOOLEAN"
    case "timestamp" | "datetime" => "TIMESTAMP"
    case "date"                   => "DATE"
    case _                        => "STRING"
  }

  /** databricks_unity.py:30-42: connection config wins, env fallback,
    * both url and token required.
    */
  def fromConnection(
      connection: Map[String, Any],
      env: Map[String, String] = sys.env,
      transport: HttpTransport = new JavaHttpTransport()): DatabricksUnityCatalog = {
    def pick(key: String, envKey: String) =
      connection.get(key).map(_.toString).orElse(env.get(envKey)).getOrElse("")
    new DatabricksUnityCatalog(
      workspaceUrl = pick("workspace_url", "DATABRICKS_WORKSPACE_URL"),
      accessToken = pick("access_token", "DATABRICKS_ACCESS_TOKEN"),
      transport = transport,
      catalogName = connection.get("catalog").map(_.toString).getOrElse("main"),
      warehouseId = connection.get("warehouse_id").map(_.toString))
  }
}

// --------------------------------------------------------------- AWS Glue

/** The boto3 Glue client surface the reference calls (aws_glue.py) —
  * implemented by an SDK binding in a real deployment; tests use a
  * recorder. `getDatabase`/`getTable` return None for
  * EntityNotFoundException and throw for any other ClientError.
  */
trait GlueApi {
  def getDatabase(name: String): Option[Map[String, Any]]
  def createDatabase(databaseInput: Map[String, Any]): Unit
  def getTable(database: String, name: String): Option[Map[String, Any]]
  def createTable(database: String, tableInput: Map[String, Any]): Unit
  def updateTable(database: String, tableInput: Map[String, Any]): Unit
}

/** The reference raises ImportError when boto3 is absent
  * (aws_glue.py:35-38); this is the same fail-fast for a missing SDK.
  */
object UnavailableGlueApi extends GlueApi {
  private def nope = throw new UnsupportedOperationException(
    "an AWS Glue SDK binding is required for aws_glue catalog integration")
  def getDatabase(name: String) = nope
  def createDatabase(d: Map[String, Any]) = nope
  def getTable(db: String, n: String) = nope
  def createTable(db: String, t: Map[String, Any]) = nope
  def updateTable(db: String, t: Map[String, Any]) = nope
}

/** AWS Glue catalog backend (reference: catalog/aws_glue.py). All the
  * request-construction logic — TableInput shape, hive type mapping,
  * asset parameters, the TableInput allowed-field filter, parameter
  * merges for metadata/lineage — is pure and tested; only the SDK call
  * itself sits behind [[GlueApi]].
  */
final class AwsGlueCatalog(
    api: GlueApi,
    defaultDatabase: String = "default",
    assetDomain: Option[String] = None,
    assetDataProduct: Option[String] = None,
    assetOwner: Option[String] = None,
    log: String => Unit = m => System.err.println(s"[graft] $m")
) extends CatalogClient {

  /** aws_glue.py:57-151. */
  def ensureTable(
      table: String,
      database: String = "",
      schema: Seq[graft.core.ContractField] = Seq.empty,
      location: String = ""): (String, String) = {
    val db = if (database.nonEmpty) database else defaultDatabase
    if (api.getDatabase(db).isEmpty)
      api.createDatabase(Map(
        "Name" -> db, "Description" -> s"Database for $db"))
    if (api.getTable(db, table).isDefined) return (db, table)
    val storage = Map(
      "Location" -> location,
      "InputFormat" -> "org.apache.hadoop.mapred.TextInputFormat",
      "OutputFormat" -> "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat",
      "SerdeInfo" -> Map("SerializationLibrary" ->
        "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe")) ++
      (if (schema.isEmpty) Map.empty else Map("Columns" -> schema.map(f => Map(
        "Name" -> f.name,
        "Type" -> AwsGlueCatalog.mapType(f.odcsType),
        "Comment" -> f.description.getOrElse("")))))
    val parameters =
      assetDomain.map("domain" -> _).toMap ++
      assetDataProduct.map("data_product" -> _).toMap ++
      assetOwner.map("owner" -> _).toMap
    val tableInput = Map(
      "Name" -> table,
      "StorageDescriptor" -> storage,
      "TableType" -> "EXTERNAL_TABLE",
      "Parameters" -> parameters)
    try api.createTable(db, tableInput)
    catch { case e: Exception => log(s"Failed to create Glue table: ${e.getMessage}") }
    (db, table)
  }

  /** aws_glue.py:174-207: Table → TableInput allowed-field filter. */
  def tableToTableInput(table: Map[String, Any]): Map[String, Any] =
    table.view.filterKeys(AwsGlueCatalog.tableInputFields).toMap

  /** aws_glue.py:209-262: merge tags/owners/custom properties into the
    * table Parameters and update.
    */
  def pushMetadata(
      table: String,
      database: String = "",
      tags: Seq[String] = Seq.empty,
      owners: Seq[String] = Seq.empty,
      description: Option[String] = None,
      customProperties: Map[String, String] = Map.empty): String = {
    val db = if (database.nonEmpty) database else defaultDatabase
    try {
      val existing = api.getTable(db, table).getOrElse(
        throw new NoSuchElementException(s"table not found: $db.$table"))
      var input = tableToTableInput(existing)
      description.foreach(d => input += "Description" -> d)
      var parameters = input.get("Parameters") match {
        case Some(p: Map[_, _]) => p.asInstanceOf[Map[String, Any]]
        case _                  => Map.empty[String, Any]
      }
      if (tags.nonEmpty) parameters += "tags" -> tags.mkString(",")
      if (owners.nonEmpty) parameters += "owners" -> owners.mkString(",")
      parameters ++= customProperties
      api.updateTable(db, input + ("Parameters" -> parameters))
      "success"
    } catch { case e: Exception =>
      log(s"Failed to update Glue table metadata: ${e.getMessage}")
      "error"
    }
  }

  /** aws_glue.py:264-316: lineage via table parameters. */
  def pushTableLineage(
      sourceFqns: Seq[String],
      targetTable: String,
      database: String = "",
      operation: String = "ingest"): String = {
    val db = if (database.nonEmpty) database else defaultDatabase
    try {
      val existing = api.getTable(db, targetTable).getOrElse(
        throw new NoSuchElementException(s"table not found: $db.$targetTable"))
      val input = tableToTableInput(existing)
      val parameters = (input.get("Parameters") match {
        case Some(p: Map[_, _]) => p.asInstanceOf[Map[String, Any]]
        case _                  => Map.empty[String, Any]
      }) ++ Map(
        "lineage_sources" -> sourceFqns.mkString(","),
        "lineage_operation" -> operation)
      api.updateTable(db, input + ("Parameters" -> parameters))
      "success"
    } catch { case e: Exception =>
      log(s"Failed to push Glue lineage: ${e.getMessage}")
      "error"
    }
  }

  // ----------------------------------------------- CatalogClient bridge
  private def split(fqn: String): (String, String) = {
    val i = fqn.lastIndexOf('.')
    if (i < 0) (defaultDatabase, fqn) else (fqn.take(i), fqn.drop(i + 1))
  }
  def ensureEntity(entity: CatalogEntity): Unit = {
    val (db, name) = split(entity.fullyQualifiedName)
    ensureTable(name, db)
  }
  def pushTags(fqn: String, tags: Map[String, String]): Unit = {
    val (db, name) = split(fqn)
    pushMetadata(name, db,
      tags = tags.map { case (k, v) => s"$k=$v" }.toSeq.sorted,
      customProperties = tags)
  }
  def pushOwner(fqn: String, owner: String): Unit = {
    val (db, name) = split(fqn)
    pushMetadata(name, db, owners = Seq(owner))
  }
  def pushLineage(edge: LineageEdge): Unit = {
    val (db, name) = split(edge.targetFqn)
    pushTableLineage(Seq(edge.sourceFqn), name, db)
  }
}

object AwsGlueCatalog {
  /** aws_glue.py:153-172 — hive type names (integer → bigint). */
  def mapType(fieldType: String): String = fieldType.toLowerCase match {
    case "string"                 => "string"
    case "integer"                => "bigint"
    case "float"                  => "float"
    case "double"                 => "double"
    case "boolean"                => "boolean"
    case "timestamp" | "datetime" => "timestamp"
    case "date"                   => "date"
    case _                        => "string"
  }

  /** aws_glue.py:186-199 — the fields TableInput accepts. */
  val tableInputFields: Set[String] = Set(
    "Name", "Description", "Owner", "LastAccessTime", "LastAnalyzedTime",
    "Retention", "StorageDescriptor", "PartitionKeys", "ViewOriginalText",
    "ViewExpandedText", "TableType", "Parameters", "TargetTable")
}
