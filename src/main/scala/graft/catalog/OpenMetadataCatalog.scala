package graft.catalog

import Json.{obj, JObj}

/** OpenMetadata catalog backend (reference: catalog/openmetadata.py).
  *
  * Every request the reference sends is reconstructed verbatim — URLs,
  * auth headers, JSON payload shapes, status-code handling, and the
  * warn-and-degrade error policy — against the injectable
  * [[HttpTransport]], so the whole flow is testable offline:
  *
  *  - service get-or-create (openmetadata.py:49-94):
  *    GET /v1/services/{type}/name/{name}; on miss POST /v1/services/{type}
  *    with {name, serviceType, connection:{}}.
  *  - ensure table (py:95-173): GET /v1/tables/name/{fqn}; on miss POST
  *    /v1/tables with database ref + columns (types mapped per
  *    _map_type_to_openmetadata py:175-195, NOT_NULL/NULL constraints).
  *  - push metadata (py:197-290): GET table, merge tag labels
  *    ({tagFQN, source:"Classification"}), resolved owners
  *    (GET /v1/users/name/{owner} → {id,type:"user"} or fallback
  *    {name,type:"user"}), description, extension; PATCH /v1/tables/{id}.
  *  - push lineage (py:292-352): PUT /v1/lineage/table/name/{fqn} with
  *    {description, edges:[{fromEntity,toEntity,description}]}.
  */
final class OpenMetadataCatalog(
    apiUrl: String,
    authToken: String,
    transport: HttpTransport = new JavaHttpTransport(),
    defaultDatabase: String = "default",
    serviceName: String = "dativo-ingest",
    log: String => Unit = m => System.err.println(s"[graft] $m")
) extends CatalogClient {

  require(authToken != null && authToken.nonEmpty,
    "OpenMetadata auth_token is required. Set it in " +
      "catalog.connection.auth_token or OPENMETADATA_AUTH_TOKEN env var.")

  private val headers = Map(
    "Content-Type" -> "application/json",
    "Authorization" -> s"Bearer $authToken")

  private def get(url: String) =
    transport.send(HttpRequest("GET", url, headers, None))
  private def send(method: String, url: String, payload: JObj) =
    transport.send(HttpRequest(method, url, headers, Some(Json.render(payload))))

  /** openmetadata.py:49-94. Returns the service FQN (the requested name
    * when the server is unreachable — warn-and-degrade).
    */
  def getOrCreateService(serviceType: String, name: String): String = {
    try {
      val r = get(s"$apiUrl/v1/services/$serviceType/name/$name")
      if (r.status == 200)
        return Json.parse(r.body).get("fullyQualifiedName")
          .map(_.toString).getOrElse(name)
    } catch { case _: Exception => () }
    try {
      val r = send("POST", s"$apiUrl/v1/services/$serviceType",
        obj("name" -> name, "serviceType" -> serviceType,
          "connection" -> obj()))
      if (r.status == 200 || r.status == 201)
        return Json.parse(r.body).get("fullyQualifiedName")
          .map(_.toString).getOrElse(name)
    } catch { case e: Exception =>
      log(s"Failed to create OpenMetadata service: ${e.getMessage}")
    }
    name
  }

  private def tableFqn(database: String, table: String): String = {
    val svc = getOrCreateService("databaseService", serviceName)
    s"$svc.$database.$table"
  }

  /** openmetadata.py:95-173: returns (fqn, entityId). */
  def ensureTable(
      table: String,
      database: String = "",
      schema: Seq[graft.core.ContractField] = Seq.empty): (String, Option[String]) = {
    val db = if (database.nonEmpty) database else defaultDatabase
    val svc = getOrCreateService("databaseService", serviceName)
    val fqn = s"$svc.$db.$table"
    try {
      val r = get(s"$apiUrl/v1/tables/name/$fqn")
      if (r.status == 200)
        return (fqn, Json.parse(r.body).get("id").map(_.toString))
    } catch { case _: Exception => () }
    val base = Seq[(String, Any)](
      "name" -> table,
      "database" -> obj("name" -> db, "service" -> obj("name" -> svc)),
      "tableType" -> "Regular")
    val withCols =
      if (schema.isEmpty) base
      else base :+ ("columns" -> schema.map(f => obj(
        "name" -> f.name,
        "dataType" -> OpenMetadataCatalog.mapType(f.odcsType),
        "constraint" -> (if (f.required) "NOT_NULL" else "NULL"))))
    try {
      val r = send("POST", s"$apiUrl/v1/tables", JObj(withCols))
      if (r.status == 200 || r.status == 201)
        return (fqn, Json.parse(r.body).get("id").map(_.toString))
    } catch { case e: Exception =>
      log(s"Failed to create OpenMetadata table: ${e.getMessage}")
    }
    (fqn, None)
  }

  /** openmetadata.py:197-290: GET → merge → PATCH. Returns "success" /
    * "partial" / "error" exactly like the reference.
    */
  def pushMetadata(
      table: String,
      database: String = "",
      tags: Seq[String] = Seq.empty,
      owners: Seq[String] = Seq.empty,
      description: Option[String] = None,
      customProperties: Map[String, String] = Map.empty): String = {
    val db = if (database.nonEmpty) database else defaultDatabase
    val fqn = tableFqn(db, table)
    val tableData = try {
      val r = get(s"$apiUrl/v1/tables/name/$fqn")
      if (r.status != 200) return "error"
      Json.parse(r.body)
    } catch { case _: Exception => return "error" }

    val tagLabels = tags.map(t => obj("tagFQN" -> t, "source" -> "Classification"))
    val ownerRefs = owners.flatMap { o =>
      val resolved = try {
        val r = get(s"$apiUrl/v1/users/name/$o")
        if (r.status == 200)
          Json.parse(r.body).get("id").map(id => obj("id" -> id.toString, "type" -> "user"))
        else None
      } catch { case _: Exception => None }
      Some(resolved.getOrElse(obj("name" -> o, "type" -> "user")))
    }
    val existingTags = tableData.get("tags") match {
      case Some(s: Seq[_]) => s
      case _               => Seq.empty[Any]
    }
    val patched = JObj(
      tableData.toSeq.filterNot { case (k, _) =>
        Seq("tags", "owners", "description", "extension").contains(k) } ++
      Seq[(String, Any)]("tags" -> (existingTags ++ tagLabels)) ++
      (if (ownerRefs.nonEmpty) Seq("owners" -> ownerRefs) else Nil) ++
      description.map("description" -> _).toSeq ++
      (if (customProperties.nonEmpty)
        Seq("extension" -> (tableData.get("extension") match {
          case Some(m: Map[_, _]) =>
            m.asInstanceOf[Map[String, Any]] ++ customProperties
          case _ => customProperties
        })) else Nil))
    val id = tableData.get("id").map(_.toString).getOrElse("")
    try {
      val r = send("PATCH", s"$apiUrl/v1/tables/$id", patched)
      if (r.status == 200 || r.status == 201) "success" else "partial"
    } catch { case e: Exception =>
      log(s"Failed to update OpenMetadata table metadata: ${e.getMessage}")
      "partial"
    }
  }

  /** openmetadata.py:292-352. */
  def pushTableLineage(
      sourceFqns: Seq[String],
      targetTable: String,
      database: String = "",
      operation: String = "ingest"): String = {
    if (sourceFqns.isEmpty) return "skipped"
    val db = if (database.nonEmpty) database else defaultDatabase
    val targetFqn = tableFqn(db, targetTable)
    val payload = obj(
      "description" -> s"Lineage from $operation",
      "edges" -> sourceFqns.map(s => obj(
        "fromEntity" -> s, "toEntity" -> targetFqn,
        "description" -> s"$operation operation")))
    try {
      val r = send("PUT", s"$apiUrl/v1/lineage/table/name/$targetFqn", payload)
      if (r.status == 200 || r.status == 201) "success" else "partial"
    } catch { case e: Exception =>
      log(s"Failed to push OpenMetadata lineage: ${e.getMessage}")
      "partial"
    }
  }

  // ----------------------------------------------- CatalogClient bridge
  // The engine-side trait speaks entity FQNs "domain.product.name"; the
  // OpenMetadata flows key on (database, table) = (domain.product, name).
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
      tags = tags.map { case (k, v) => s"$k.$v" }.toSeq.sorted,
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

object OpenMetadataCatalog {
  /** openmetadata.py:175-195. */
  def mapType(fieldType: String): String = fieldType.toLowerCase match {
    case "string"                  => "STRING"
    case "integer"                 => "INT"
    case "float"                   => "FLOAT"
    case "double"                  => "DOUBLE"
    case "boolean"                 => "BOOLEAN"
    case "timestamp" | "datetime"  => "TIMESTAMP"
    case "date"                    => "DATE"
    case _                         => "STRING"
  }

  /** Connection resolution (openmetadata.py:30-47): explicit config wins,
    * else OPENMETADATA_API_URL / OPENMETADATA_AUTH_TOKEN env; missing
    * token is fatal.
    */
  def fromConnection(
      connection: Map[String, Any],
      env: Map[String, String] = sys.env,
      transport: HttpTransport = new JavaHttpTransport()): OpenMetadataCatalog = {
    val apiUrl = connection.get("api_url").map(_.toString)
      .orElse(env.get("OPENMETADATA_API_URL"))
      .getOrElse("http://localhost:8585/api")
    val token = connection.get("auth_token").map(_.toString)
      .orElse(env.get("OPENMETADATA_AUTH_TOKEN"))
      .getOrElse("")
    new OpenMetadataCatalog(apiUrl, token, transport)
  }
}

/** Nessie catalog backend (reference: catalog/nessie.py) — tables and
  * metadata are managed by the Iceberg committer; this adapter only
  * derives the lineage properties the committer stores on the table
  * (nessie.py:90-127). Pure, no HTTP.
  */
final class NessieCatalog(defaultDatabase: String = "default") extends CatalogClient {
  val lineageProperties = scala.collection.mutable.Map[String, String]()

  /** nessie.py:111-121: the table-property triple. */
  def lineageInfo(sources: Seq[String], target: String,
      operation: String = "ingest"): Map[String, String] = Map(
    "lineage.sources" -> sources.mkString(","),
    "lineage.operation" -> operation,
    "lineage.target" -> target)

  def ensureEntity(entity: CatalogEntity): Unit = () // IcebergCommitter's job
  def pushTags(fqn: String, tags: Map[String, String]): Unit = () // via table properties
  def pushOwner(fqn: String, owner: String): Unit = ()
  def pushLineage(edge: LineageEdge): Unit =
    lineageProperties ++= lineageInfo(Seq(edge.sourceFqn), edge.targetFqn)
}
