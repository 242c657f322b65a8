package graft.config

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Legacy-format migration + JSON-schema validation parity with
  * config.py:249-327 and the ODCS 3.0.2 schema constraints.
  */
class OdcsSchemaSpec extends AnyFunSuite with Matchers {

  private val legacy: Map[String, Any] = Map(
    "asset" -> Map(
      "name" -> "people", "version" -> "1.0",
      "domain" -> "hr", "data_product" -> "core",
      "governance" -> Map(
        "owner" -> "ana@x.io",
        "tags" -> Seq("pii"),
        "classification" -> Seq("PII"),
        "retention_days" -> 30),
      "schema" -> Seq(Map("name" -> "id", "type" -> "integer", "required" -> true))))

  test("migrate: nested asset gains id/apiVersion/kind/status/$schema defaults (config.py:253-263)") {
    val m = Odcs.migrateOldFormat(legacy)
    m("apiVersion") shouldBe "v3.0.2"
    m("kind") shouldBe "DataContract"
    m("status") shouldBe "active"
    m("$schema") shouldBe "schemas/odcs/dativo-odcs-3.0.2-extended.schema.json"
    m("id").toString should not be empty
    m.contains("asset") shouldBe false
    // explicit values win over defaults
    val keep = Odcs.migrateOldFormat(Map("asset" -> Map(
      "id" -> "fixed", "status" -> "draft", "schema" -> Seq.empty)))
    keep("id") shouldBe "fixed"
    keep("status") shouldBe "draft"
  }

  test("migrate: governance splits into team + tags + compliance and is dropped (config.py:265-277)") {
    val m = Odcs.migrateOldFormat(legacy)
    m.contains("governance") shouldBe false
    m("team") shouldBe Map("owner" -> "ana@x.io")
    m("tags") shouldBe Seq("pii")
    m("compliance") shouldBe Map(
      "classification" -> Seq("PII"), "retention_days" -> 30)
    // the reference only migrates governance.tags when owner is present
    val noOwner = Odcs.migrateOldFormat(Map("asset" -> Map(
      "governance" -> Map("tags" -> Seq("x"), "retention_days" -> 7))))
    noOwner.contains("tags") shouldBe false
    noOwner("compliance") shouldBe Map("retention_days" -> 7)
  }

  test("migrate: flat format only gains id/$schema (config.py:353-361); idempotent on migrated output") {
    val flat = Map[String, Any]("name" -> "n", "version" -> "1.0")
    val m = Odcs.migrateOldFormat(flat)
    m.keySet shouldBe Set("name", "version", "id", "$schema")
    val twice = Odcs.migrateOldFormat(Odcs.migrateOldFormat(legacy))
    twice - "id" shouldBe Odcs.migrateOldFormat(legacy) - "id"
  }

  test("loader parity: governance.owner reaches the contract via team after migration") {
    val c = AssetLoader.fromMap(legacy)
    c.owner shouldBe Some("ana@x.io")
    c.retentionDays shouldBe Some(30)
    c.complianceClassification shouldBe Seq("PII")
  }

  test("validator: ODCS required fields + enums (odcs-3.0.2.schema.json)") {
    val valid = Odcs.migrateOldFormat(legacy)
    JsonSchemaValidator.validate(valid, Odcs.contractSchema) shouldBe empty
    Odcs.validateAgainstSchema(valid) // no throw

    val missing = valid - "status"
    val errs = JsonSchemaValidator.validate(missing, Odcs.contractSchema)
    errs.exists(_.contains("missing required property 'status'")) shouldBe true

    val badKind = valid + ("kind" -> "Dataset")
    JsonSchemaValidator.validate(badKind, Odcs.contractSchema)
      .exists(_.contains("not one of")) shouldBe true

    val badApi = valid + ("apiVersion" -> "v9.9")
    the[IllegalArgumentException] thrownBy
      Odcs.validateAgainstSchema(badApi) should have message
      "Schema validation failed: $.apiVersion: v9.9 is not one of [v3.0.2, v3.0.1, v3.0.0, v2.2.2, v2.2.1, v2.2.0]"
  }

  test("validator: nested property, array item, and type checks") {
    val base = Odcs.migrateOldFormat(legacy)
    // schema items need 'name'
    val noName = base + ("schema" -> Seq(Map("type" -> "integer")))
    JsonSchemaValidator.validate(noName, Odcs.contractSchema)
      .exists(_.contains("$.schema[0]: missing required property 'name'")) shouldBe true
    // target.mode enum
    val badMode = base + ("target" -> Map("mode" -> "yolo"))
    JsonSchemaValidator.validate(badMode, Odcs.contractSchema)
      .exists(_.startsWith("$.target.mode:")) shouldBe true
    // compliance.retention_days must be integer
    val badRet = base + ("compliance" -> Map("retention_days" -> "30"))
    JsonSchemaValidator.validate(badRet, Odcs.contractSchema)
      .exists(_.contains("$.compliance.retention_days: expected integer")) shouldBe true
    // allOf composes
    val allOf = Map("allOf" -> Seq(
      Map("type" -> "object", "required" -> Seq("a")),
      Map("type" -> "object", "required" -> Seq("b"))))
    JsonSchemaValidator.validate(Map("a" -> 1), allOf).size shouldBe 1
  }

  test("from_yaml: opt-in validation throws on invalid, default skips (config.py:330-374)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-odcs-")
    val bad = dir.resolve("bad.yaml")
    java.nio.file.Files.writeString(bad,
      """name: x
        |version: "1.0"
        |apiVersion: v9.9
        |kind: DataContract
        |status: active
        |schema:
        |  - {name: id, type: integer}
        |""".stripMargin)
    AssetLoader.fromYaml(bad.toString).name shouldBe "x" // default: not validated
    the[IllegalArgumentException] thrownBy
      AssetLoader.fromYaml(bad.toString, validateSchema = true) should have message
      "Schema validation failed: $.apiVersion: v9.9 is not one of [v3.0.2, v3.0.1, v3.0.0, v2.2.2, v2.2.1, v2.2.0]"
    // explicit schema path that does not exist
    a[java.io.FileNotFoundException] should be thrownBy
      Odcs.validateAgainstSchema(Map.empty, Some(dir.resolve("nope.json").toString))
  }
}
