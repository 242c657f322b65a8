package graft

import graft.sources.{GoogleSheets, GDriveCsv}
import java.nio.file.Files

/** Loadable fixture APIs (top-level objects so PluginLoader resolves them
  * by FQCN from job YAML, exactly as a deployment would wire real
  * clients).
  */
object FixtureSheetsApi extends GoogleSheets.SheetsApi {
  def getValues(id: String, range: String): Seq[Seq[String]] =
    Seq(Seq("id", "name"), Seq("1", "alice"), Seq("2", "bob"))
  def modifiedTime(id: String): String = "2024-01-01T00:00:00Z"
}

object FixtureDriveApi extends GDriveCsv.DriveApi {
  def listCsvFiles(folderId: Option[String], query: Option[String]) =
    Seq(GDriveCsv.DriveFile("d1", "data.csv", "2024-01-05T00:00:00Z"))
  def download(fileId: String, dest: java.nio.file.Path): Unit =
    Files.writeString(dest, "id,name\n7,zoe\n")
}

/** End-to-end §3.1 jobs through the SaaS source routes (S4–S7). */
class SaaSJobSpec extends SparkSpec {

  private def scaffold(srcType: String, sourceBlock: String): String = {
    val dir = Files.createTempDirectory("saas-job-")
    def w(n: String, c: String) = Files.writeString(dir.resolve(n), c)
    w("recipe_src.yaml",
      s"name: $srcType\ntype: $srcType\nroles: [source]\n" +
        "default_engine: {type: native}\n")
    w("recipe_parquet.yaml",
      "name: parquet\ntype: parquet\nroles: [source, target]\n" +
        "default_engine: {type: native}\n")
    w("asset.yaml",
      """asset:
        |  name: saas
        |  schema:
        |    - {name: id, type: integer, required: true}
        |    - {name: name, type: string}
        |""".stripMargin)
    w("job.yaml",
      s"""tenant_id: ts
         |source_connector_path: recipe_src.yaml
         |target_connector_path: recipe_parquet.yaml
         |asset_path: asset.yaml
         |schema_validation_mode: strict
         |source:
         |$sourceBlock
         |target:
         |  connection: {path: ${dir.resolve("out")}}
         |""".stripMargin)
    dir.resolve("job.yaml").toString
  }

  test("google_sheets job (S4): api_class route end-to-end") {
    val job = scaffold("google_sheets",
      """  api_class: graft.FixtureSheetsApi
        |  spreadsheets:
        |    - {id: sheet-1, range: "A1:B3"}""".stripMargin)
    val r = JobRunner.run(spark, job)
    r.exitCode shouldBe 0
    r.validRecords shouldBe 2
    spark.read.parquet(r.outputPath).columns should contain("id")
  }

  test("google_sheets incremental (I3): rerun skips unchanged spreadsheet") {
    val dir = Files.createTempDirectory("sheets-inc-")
    val job = scaffold("google_sheets",
      s"""  api_class: graft.FixtureSheetsApi
         |  spreadsheets:
         |    - {id: sheet-9, range: "A1:B3"}
         |  incremental:
         |    strategy: spreadsheet_modified_time
         |    state_path: ${dir.resolve("state.json")}""".stripMargin)
    JobRunner.run(spark, job).validRecords shouldBe 2
    // FixtureSheetsApi reports a constant modifiedTime -> skipped now
    val r2 = JobRunner.run(spark, job)
    r2.records shouldBe 0
    r2.exitCode shouldBe graft.core.ExitCodes.Failure // reference: no valid rows
  }

  test("gdrive_csv job (S5): list/download route end-to-end") {
    val job = scaffold("gdrive_csv", "  api_class: graft.FixtureDriveApi")
    val r = JobRunner.run(spark, job)
    r.exitCode shouldBe 0
    r.validRecords shouldBe 1
  }

  test("stripe job (S6/S7): airbyte protocol via command override") {
    val proto = Files.createTempFile("stripe-", ".jsonl")
    Files.writeString(proto,
      """{"type":"RECORD","record":{"stream":"customers","data":{"id":"5","name":"carl"}}}""" +
        "\n" +
        """{"type":"STATE","state":{"data":{"customers":{"created":"2024-03-01"}}}}""")
    val job = scaffold("stripe",
      s"""  objects: [customers]
         |  engine:
         |    options:
         |      airbyte:
         |        command: [cat, $proto]""".stripMargin)
    val r = JobRunner.run(spark, job)
    r.exitCode shouldBe 0
    r.validRecords shouldBe 1
  }
}
