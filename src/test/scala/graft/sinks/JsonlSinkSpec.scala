package graft.sinks

import graft.SparkSpec
import graft.core.{ContractField, DataContract, Validation}
import graft.sources.JsonlSource
import java.nio.file.Files

class JsonlSinkSpec extends SparkSpec {
  import spark.implicits._

  private val contract = DataContract(name = "t", fields = Seq(
    ContractField("doc_id", "integer", required = true),
    ContractField("lang", "string")))

  test("round-trip: sink output reads back losslessly through JsonlSource") {
    val out = Files.createTempDirectory("jsonl-sink-").toString + "/data"
    val df = Seq((1L, "en"), (2L, null), (3L, "fr")).toDF("doc_id", "lang")
    JsonlSink.write(df, out)
    val back = Validation.coerceToContract(
      JsonlSource.readClean(spark, Seq(out), contract), contract)
    back.collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet shouldBe
      Set((1L, Some("en")), (2L, None), (3L, Some("fr")))
  }

  test("partitioned export: hive layout, partition value normalized, payload pruned") {
    val out = Files.createTempDirectory("jsonl-sink-part-").toString + "/data"
    val df = Seq((1L, "en", "Src A"), (2L, "fr", "src-b"))
      .toDF("doc_id", "lang", "source")
    JsonlSink.write(df, out, partitionCols = Seq("source"))
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    dirs shouldBe Array("source=src-b", "source=src_a")
    // payload carries only non-partition fields
    val firstLine = scala.io.Source.fromFile(
      new java.io.File(out, "source=src_a").listFiles()
        .filter(_.getName.endsWith(".txt")).head).getLines().next()
    firstLine should include("doc_id")
    firstLine should not include "src_a"
  }

  test("gzip codec writes .gz files that still read back") {
    val out = Files.createTempDirectory("jsonl-sink-gz-").toString + "/data"
    JsonlSink.write(Seq((1L, "en")).toDF("doc_id", "lang"), out,
      codec = Some("gzip"))
    new java.io.File(out).listFiles()
      .exists(_.getName.endsWith(".txt.gz")) shouldBe true
    JsonlSource.readClean(spark, Seq(out), contract).count() shouldBe 1
  }
}
