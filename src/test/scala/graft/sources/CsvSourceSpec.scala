package graft.sources

import graft.SparkSpec
import graft.core.{ContractField, DataContract}
import java.nio.file.Files

class CsvSourceSpec extends SparkSpec {

  private val contract = DataContract(name = "t", fields = Seq(
    ContractField("id", "integer", required = true),
    ContractField("name", "string")))

  test("multi-file scan with REORDERED headers maps by name, not position") {
    val dir = Files.createTempDirectory("csv-reorder-")
    Files.writeString(dir.resolve("a.csv"), "id,name\n1,alice\n")
    Files.writeString(dir.resolve("b.csv"), "name,id\nbob,2\n") // swapped
    val df = CsvSource.read(spark,
      Seq(dir.resolve("a.csv").toString, dir.resolve("b.csv").toString),
      contract)
    val rows = df.select("id", "name").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    rows shouldBe Set(("1", "alice"), ("2", "bob")) // bob's id is 2, not "bob"
  }

  test("multi-file scan with IDENTICAL headers uses a single scan") {
    val dir = Files.createTempDirectory("csv-same-")
    Files.writeString(dir.resolve("a.csv"), "id,name\n1,alice\n")
    Files.writeString(dir.resolve("b.csv"), "id,name\n2,bob\n")
    val df = CsvSource.read(spark,
      Seq(dir.resolve("a.csv").toString, dir.resolve("b.csv").toString),
      contract)
    df.count() shouldBe 2
    df.queryExecution.executedPlan.toString
      .split("FileScan").length shouldBe 2 // exactly one scan node
  }

  test("many-file probe: 600 files across two header groups union correctly in seconds") {
    val dir = Files.createTempDirectory("csv-many-")
    (0 until 300).foreach { i =>
      Files.writeString(dir.resolve(f"a$i%03d.csv"), s"id,name\n$i,n$i\n")
      Files.writeString(dir.resolve(f"b$i%03d.csv"), s"name,id\nm$i,${1000 + i}\n")
    }
    val t0 = System.nanoTime()
    val df = CsvSource.read(spark, Seq(dir.toString), contract)
    val n = df.count()
    val secs = (System.nanoTime() - t0) / 1e9
    n shouldBe 600
    df.filter(df("id") === "1042").select("name").collect()
      .head.getString(0) shouldBe "m42" // swapped-header group mapped by name
    // The anti-pattern this probes for is a serial per-file loop: one scan
    // (or worse, one Spark job) per file. Assert it STRUCTURALLY — 600
    // files in two header groups must collapse to exactly two FileScan
    // nodes — so green-ness doesn't depend on machine load. The wall-clock
    // bound is only a generous backstop against a pathological driver-side
    // probe (a serial loop here measures minutes, not seconds).
    df.queryExecution.executedPlan.toString
      .split("FileScan").length shouldBe 3 // exactly two scan nodes
    secs should be < 120.0
  }

  test("extra columns in the file survive to the raw frame") {
    val dir = Files.createTempDirectory("csv-extra-")
    Files.writeString(dir.resolve("a.csv"), "id,name,city\n1,alice,rome\n")
    val df = CsvSource.read(spark, Seq(dir.resolve("a.csv").toString), contract)
    df.columns shouldBe Array("id", "name", "city")
  }

  test("headerless files use the contract's declared order") {
    val dir = Files.createTempDirectory("csv-nohead-")
    Files.writeString(dir.resolve("a.csv"), "1,alice\n")
    val df = CsvSource.read(spark, Seq(dir.resolve("a.csv").toString),
      contract, CsvOptions(header = false))
    df.columns shouldBe Array("id", "name")
    df.collect()(0).getString(0) shouldBe "1"
  }
}
