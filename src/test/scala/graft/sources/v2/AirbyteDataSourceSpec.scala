package graft.sources.v2

import graft.SparkSpec
import graft.core.{ContractField, DataContract}
import java.nio.file.Files

class AirbyteDataSourceSpec extends SparkSpec {

  private val contract = DataContract(name = "t", fields = Seq(
    ContractField("id", "integer", required = true),
    ContractField("name", "string")))

  private def protoFile: String = {
    val f = Files.createTempFile("dsv2-", ".jsonl")
    Files.writeString(f, Seq(
      """{"type":"RECORD","record":{"stream":"customers","data":{"id":"1","name":"alice"}}}""",
      """{"type":"RECORD","record":{"stream":"orders","data":{"id":"8","name":"order-row"}}}""",
      """{"type":"RECORD","record":{"stream":"customers","data":{"id":2,"name":"bob"}}}""",
      """{"type":"STATE","state":{"data":{}}}""").mkString("\n"))
    f.toString
  }

  private def read(streams: String) =
    spark.read.format("graft.sources.v2.AirbyteDataSource")
      .schema(contract.rawStructType)
      .option("command", s"cat,$protoFile")
      .option("config", "{}")
      .option("streams", streams)
      .load()

  test("executor-side subprocess read, one partition per stream") {
    val df = read("customers,orders")
    df.rdd.getNumPartitions shouldBe 2
    val rows = df.collect().map(r => (r.getString(0), r.getString(1))).sorted
    rows shouldBe Array(("1", "alice"), ("2", "bob"), ("8", "order-row"))
  }

  test("stream filter: only the named stream's records") {
    read("customers").count() shouldBe 2
    read("orders").count() shouldBe 1
  }

  test("numeric JSON values land as strings (all-string contract)") {
    val ids = read("customers").select("id").collect().map(_.getString(0)).sorted
    ids shouldBe Array("1", "2") // id 2 was a JSON number
  }

  test("coercion composes downstream like the CSV path") {
    val out = graft.core.Validation.coerceToContract(read("customers"), contract)
    out.schema("id").dataType.typeName shouldBe "long"
    out.collect().map(_.getLong(0)).sorted shouldBe Array(1L, 2L)
  }

  test("schema is mandatory (contracts declared, not inferred)") {
    an[Exception] should be thrownBy
      spark.read.format("graft.sources.v2.AirbyteDataSource")
        .option("command", "cat,/dev/null").load()
  }
}
