package graft.config

/** ODCS asset-definition migration + schema validation (reference
  * config.py:249-327, schemas/odcs/ schema files).
  *
  * [[JsonSchemaValidator]] is a draft-07 subset (type / required /
  * properties / items / enum / allOf) — exactly the constructs the ODCS
  * schema files use for the load-bearing constraints. Schemas are plain
  * `Map[String, Any]` so deployments can point at their own schema file
  * (YAML or JSON) just like the reference's `schema_path` argument.
  */
object JsonSchemaValidator {

  /** Returns every violation as "path: message" (empty = valid). */
  def validate(instance: Any, schema: Map[String, Any], path: String = "$"): Seq[String] = {
    var errs = Vector.empty[String]

    Yaml.seq(schema, "allOf").foreach {
      case sub: Map[String, Any] @unchecked => errs ++= validate(instance, sub, path)
      case _ => ()
    }

    schema.get("enum").foreach {
      case allowed: Seq[_] =>
        if (!allowed.exists(v => String.valueOf(v) == String.valueOf(instance)))
          errs :+= s"$path: ${String.valueOf(instance)} is not one of ${allowed.mkString("[", ", ", "]")}"
      case _ => ()
    }

    Yaml.str(schema, "type").foreach { t =>
      val ok = (t, instance) match {
        case ("object", _: Map[_, _])   => true
        case ("array", _: Seq[_])       => true
        case ("string", _: String)      => true
        case ("integer", _: Int | _: Long | _: java.math.BigInteger) => true
        case ("number", _: Number)      => true
        case ("boolean", _: Boolean)    => true
        case ("null", null)             => true
        case _                          => false
      }
      if (!ok) errs :+= s"$path: expected $t, got ${
        if (instance == null) "null" else instance.getClass.getSimpleName}"
    }

    instance match {
      case m: Map[String, Any] @unchecked =>
        Yaml.seq(schema, "required").foreach { r =>
          val k = r.toString
          if (!m.contains(k)) errs :+= s"$path: missing required property '$k'"
        }
        Yaml.map(schema, "properties").foreach {
          case (k, sub: Map[String, Any] @unchecked) if m.contains(k) =>
            errs ++= validate(m(k), sub, s"$path.$k")
          case _ => ()
        }
      case s: Seq[_] =>
        Yaml.map(schema, "items") match {
          case item if item.nonEmpty =>
            s.zipWithIndex.foreach { case (v, i) =>
              errs ++= validate(v, item, s"$path[$i]")
            }
          case _ => ()
        }
      case _ => ()
    }
    errs
  }
}

object Odcs {

  /** Legacy nested `asset:` → flat ODCS migration (config.py:249-288):
    * synthesize id, default apiVersion/kind/status, move
    * governance.owner → team.owner (and governance.tags → tags inside
    * that branch, replicating the reference's nesting), move
    * governance.classification / retention_days → compliance, and set
    * the $schema reference. Flat input gets the id/$schema defaults
    * (config.py:353-361).
    */
  def migrateOldFormat(data: Map[String, Any]): Map[String, Any] =
    if (data.contains("asset")) {
      var a = Yaml.map(data, "asset")
      if (!a.contains("id")) a += "id" -> java.util.UUID.randomUUID().toString
      if (!a.contains("apiVersion")) a += "apiVersion" -> "v3.0.2"
      if (!a.contains("kind")) a += "kind" -> "DataContract"
      if (!a.contains("status")) a += "status" -> "active"
      if (a.contains("governance")) {
        val governance = Yaml.map(a, "governance")
        a -= "governance"
        if (governance.contains("owner")) {
          a += "team" -> Map("owner" -> governance("owner"))
          if (governance.contains("tags") && !a.contains("tags"))
            a += "tags" -> governance("tags")
        }
        val compliance =
          governance.get("classification").map("classification" -> _).toMap ++
          governance.get("retention_days").map("retention_days" -> _).toMap
        if (compliance.nonEmpty) a += "compliance" -> compliance
      }
      if (!a.contains("$schema"))
        a += "$schema" -> "schemas/odcs/dativo-odcs-3.0.2-extended.schema.json"
      a
    } else {
      var d = data
      if (!d.contains("id")) d += "id" -> java.util.UUID.randomUUID().toString
      if (!d.contains("$schema"))
        d += "$schema" -> "schemas/odcs/dativo-odcs-3.0.2-extended.schema.json"
      d
    }

  /** The load-bearing constraints of the ODCS 3.0.2 extended schema
    * (schemas/odcs/odcs-3.0.2.schema.json top-level `required` + enums,
    * dativo-odcs-3.0.2-extended.schema.json property types), encoded
    * directly — the subset the reference's validate_against_schema
    * enforces on asset definitions.
    */
  val contractSchema: Map[String, Any] = Map(
    "type" -> "object",
    "required" -> Seq("version", "apiVersion", "kind", "id", "status"),
    "properties" -> Map(
      "version" -> Map("type" -> "string"),
      "apiVersion" -> Map("type" -> "string", "enum" ->
        Seq("v3.0.2", "v3.0.1", "v3.0.0", "v2.2.2", "v2.2.1", "v2.2.0")),
      "kind" -> Map("type" -> "string", "enum" -> Seq("DataContract")),
      "id" -> Map("type" -> "string"),
      "status" -> Map("type" -> "string"),
      "name" -> Map("type" -> "string"),
      "domain" -> Map("type" -> "string"),
      "dataProduct" -> Map("type" -> "string"),
      "source_type" -> Map("type" -> "string"),
      "object" -> Map("type" -> "string"),
      "schema" -> Map(
        "type" -> "array",
        "items" -> Map(
          "type" -> "object",
          "required" -> Seq("name"),
          "properties" -> Map(
            "name" -> Map("type" -> "string"),
            "required" -> Map("type" -> "boolean")))),
      "target" -> Map(
        "type" -> "object",
        "properties" -> Map(
          "file_format" -> Map("type" -> "string"),
          "partitioning" -> Map("type" -> "array"),
          "mode" -> Map("type" -> "string", "enum" ->
            Seq("strict", "merge", "relaxed")))),
      "compliance" -> Map(
        "type" -> "object",
        "properties" -> Map(
          "classification" -> Map("type" -> "array"),
          "regulations" -> Map("type" -> "array"),
          "retention_days" -> Map("type" -> "integer")))))

  /** validate_against_schema (config.py:299-327): throws the same
    * "Schema validation failed: ..." error, first violation quoted. An
    * explicit schema path loads YAML/JSON from disk.
    */
  def validateAgainstSchema(
      data: Map[String, Any],
      schemaPath: Option[String] = None): Unit = {
    val schema = schemaPath.map { p =>
      if (!java.nio.file.Files.exists(java.nio.file.Paths.get(p)))
        throw new java.io.FileNotFoundException(s"Schema file not found: $p")
      Yaml.loadFile(p)
    }.getOrElse(contractSchema)
    val errs = JsonSchemaValidator.validate(data, schema)
    if (errs.nonEmpty)
      throw new IllegalArgumentException(s"Schema validation failed: ${errs.head}")
  }
}
