package graft.sources

import graft.SparkSpec
import graft.core.{ContractField, DataContract}
import java.nio.file.Files

class DriverSourcesSpec extends SparkSpec {

  private val contract = DataContract(name = "t", fields = Seq(
    ContractField("id", "integer", required = true),
    ContractField("name", "string")))

  // ------------------------------------------------------------ Sheets (S4)

  private class FakeSheets(data: Seq[Seq[String]]) extends GoogleSheets.SheetsApi {
    var appended: Seq[Seq[String]] = Nil
    def getValues(id: String, range: String): Seq[Seq[String]] = data
    def modifiedTime(id: String): String = "2024-01-01T00:00:00Z"
    override def append(id: String, range: String, rows: Seq[Seq[String]]): Unit =
      appended = rows
  }

  test("sheets: header row becomes columns; ragged rows padded; nulls applied") {
    val api = new FakeSheets(Seq(
      Seq("id", "name", "city"),
      Seq("1", "alice", "berlin"),
      Seq("2", "NULL"), // ragged + null marker
      Seq("3", "carol", "rome", "extra-ignored")))
    val df = GoogleSheets.read(spark, api, "sheet1", "A1:C4")
    df.columns shouldBe Array("id", "name", "city")
    val rows = df.collect()
    rows.length shouldBe 3
    rows(1).isNullAt(1) shouldBe true // "NULL" marker
    rows(1).isNullAt(2) shouldBe true // padded
  }

  test("sheets: headerless synthesizes column_N") {
    val api = new FakeSheets(Seq(Seq("1", "x"), Seq("2", "y")))
    val df = GoogleSheets.read(spark, api, "s", "A:B", hasHeader = false)
    df.columns shouldBe Array("column_1", "column_2")
    df.count() shouldBe 2
  }

  test("sheets target: append with header (W8)") {
    import spark.implicits._
    val api = new FakeSheets(Nil)
    val n = GoogleSheets.write(Seq((1L, "a")).toDF("id", "name"), api, "s", "A1")
    n shouldBe 1
    api.appended.head shouldBe Seq("id", "name")
    api.appended(1) shouldBe Seq("1", "a")
  }

  // ------------------------------------------------------------- Drive (S5)

  private class FakeDrive(files: Seq[(GDriveCsv.DriveFile, String)])
      extends GDriveCsv.DriveApi {
    def listCsvFiles(folderId: Option[String], query: Option[String]) = files.map(_._1)
    def download(fileId: String, dest: java.nio.file.Path): Unit =
      Files.writeString(dest, files.find(_._1.id == fileId).get._2)
  }

  test("gdrive: list → download → csv scan; state skips unchanged files") {
    val f1 = GDriveCsv.DriveFile("f1", "a.csv", "2024-01-02T00:00:00Z")
    val api = new FakeDrive(Seq((f1, "id,name\n1,alice\n2,bob\n")))
    val (df, processed) = GDriveCsv.read(spark, api, contract)
    df.count() shouldBe 2
    processed.map(_.id) shouldBe Seq("f1")
    // record state, then re-read: file skipped entirely
    val stateDir = Files.createTempDirectory("gdrive-state-")
    val store = new graft.state.StateStore(
      stateDir.resolve("s.json").toString, spark)
    store.updateFileState("f1", "2024-01-02T00:00:00Z")
    val (df2, p2) = GDriveCsv.read(spark, api, contract, state = Some(store))
    df2.count() shouldBe 0
    p2 shouldBe empty
  }

  // ----------------------------------------------------------- Airbyte (S6)

  private val protocolLines = Seq(
    """{"type":"LOG","log":{"level":"INFO","message":"starting"}}""",
    """{"type":"RECORD","record":{"stream":"customers","data":{"id":"1","name":"alice"}}}""",
    """{"type":"RECORD","record":{"stream":"orders","data":{"id":"9","name":"skip-me"}}}""",
    """{"type":"RECORD","record":{"stream":"customers","data":{"id":"2","name":"bob"}}}""",
    """not json at all""",
    """{"type":"STATE","state":{"data":{"customers":{"created":"2024-02-01"}}}}""")

  test("airbyte: protocol parse keeps selected streams + last STATE") {
    val r = AirbyteSource.fromMessages(spark, protocolLines.iterator,
      Set("customers"), contract)
    r.recordCount shouldBe 2
    r.df.collect().map(_.getString(1)).sorted shouldBe Array("alice", "bob")
    r.lastState.get should include("2024-02-01")
  }

  test("airbyte: real subprocess pipe (cat replaces docker)") {
    val f = Files.createTempFile("airbyte-", ".jsonl")
    Files.writeString(f, protocolLines.mkString("\n"))
    val r = AirbyteSource.fromProcess(spark, Seq("cat", f.toString),
      configJson = "{}", Set.empty, contract)
    r.recordCount shouldBe 3 // empty stream filter = all streams
    r.df.count() shouldBe 3
  }

  test("airbyte: nonzero exit fails the extract") {
    a[RuntimeException] should be thrownBy
      AirbyteSource.fromProcess(spark, Seq("false"), "{}", Set.empty, contract)
  }

  test("airbyte: docker command matches the reference invocation") {
    AirbyteSource.dockerCommand("airbyte/source-stripe:1.0") shouldBe
      Seq("docker", "run", "--rm", "-i", "airbyte/source-stripe:1.0",
        "read", "--config", "/dev/stdin")
  }
}
