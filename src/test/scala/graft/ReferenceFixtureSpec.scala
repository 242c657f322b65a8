package graft

import graft.core.ExitCodes
import java.nio.file.{Files, Paths}

/** Parity smoke against the REFERENCE's own fixtures: the engine consumes
  * the reference repo's actual ODCS asset contract and AdventureWorks-era
  * employee seed CSV (tests/fixtures/assets/csv/v1.0/employee.yaml +
  * seeds/employee/), mirroring its canonical smoke job
  * csv_employee_to_iceberg.yaml (warn mode).
  */
class ReferenceFixtureSpec extends SparkSpec {

  private val refAsset =
    "/root/reference/tests/fixtures/assets/csv/v1.0/employee.yaml"
  private val refSeed =
    "/root/reference/tests/fixtures/seeds/employee/Employee_Complete_Dataset.csv"

  test("reference employee asset parses as a flat ODCS contract") {
    assume(Files.exists(Paths.get(refAsset)))
    val c = graft.config.AssetLoader.fromYaml(refAsset)
    c.name shouldBe "csv_employee"
    c.domain shouldBe Some("dativo")
    c.dataProduct shouldBe Some("employee")
    c.fields.map(_.name) should contain("employee_id")
    c.fields.exists(_.required) shouldBe true
  }

  test("reference strict-validation fixture: invalid product row fails the job") {
    val productAsset =
      "/root/reference/tests/fixtures/assets/csv/v1.0/product.yaml"
    val invalidSeed =
      "/root/reference/tests/fixtures/seeds/adventureworks/Product_invalid.csv"
    assume(Files.exists(Paths.get(productAsset)) &&
      Files.exists(Paths.get(invalidSeed)))
    val dir = Files.createTempDirectory("ref-product-")
    def w(n: String, c: String) = Files.writeString(dir.resolve(n), c)
    w("recipe_csv.yaml",
      "name: csv\ntype: csv\nroles: [source]\ndefault_engine: {type: native}\n")
    w("recipe_parquet.yaml",
      "name: parquet\ntype: parquet\nroles: [source, target]\n" +
        "default_engine: {type: native}\n")
    w("job.yaml",
      s"""tenant_id: test_tenant
         |source_connector_path: recipe_csv.yaml
         |target_connector_path: recipe_parquet.yaml
         |asset_path: $productAsset
         |schema_validation_mode: strict
         |source:
         |  files:
         |    - {path: $invalidSeed}
         |target:
         |  connection: {path: ${dir.resolve("out")}}
         |""".stripMargin)
    val r = JobRunner.run(spark, dir.resolve("job.yaml").toString)
    // csv_product_strict_validation.yaml's expectation: strict fails
    r.exitCode shouldBe ExitCodes.Failure
    r.records shouldBe 5
    r.validRecords should be < 5L
    r.errors.getOrElse("missing_required:ProductID", 0L) shouldBe 1L
  }

  test("reference smoke job: warn-mode run over the real seed CSV") {
    assume(Files.exists(Paths.get(refAsset)) && Files.exists(Paths.get(refSeed)))
    val dir = Files.createTempDirectory("ref-fixture-")
    def w(n: String, c: String) = Files.writeString(dir.resolve(n), c)
    w("recipe_csv.yaml",
      "name: csv\ntype: csv\nroles: [source, target]\n" +
        "default_engine:\n  type: native\n  options:\n    native: {encoding: utf-8}\n")
    w("recipe_parquet.yaml",
      "name: parquet\ntype: parquet\nroles: [source, target]\n" +
        "default_engine: {type: native}\n")
    w("job.yaml",
      s"""tenant_id: test_tenant
         |source_connector_path: recipe_csv.yaml
         |target_connector_path: recipe_parquet.yaml
         |asset_path: $refAsset
         |schema_validation_mode: warn
         |source:
         |  files:
         |    - {path: $refSeed}
         |target:
         |  connection: {path: ${dir.resolve("out")}}
         |""".stripMargin)
    val r = JobRunner.run(spark, dir.resolve("job.yaml").toString)
    // the seed's headers don't match the contract names, so warn mode
    // reports missing-required errors but writes every record — the
    // reference's own smoke expectation for this fixture (exit 1 partial)
    r.exitCode shouldBe ExitCodes.Partial
    r.records should be > 0L
    r.validRecords shouldBe r.records
    val back = spark.read.parquet(r.outputPath)
    back.count() shouldBe r.records
    back.columns should contain("employee_id") // declared (typed, null)
    back.columns.map(_.toLowerCase) should contain("employee_name") // extra kept
    r.outputPath should endWith("dativo/employee/csv_employee")
  }
}
