package graft.streaming

import graft.SparkSpec
import graft.core.{ContractField, DataContract, ValidationMode}
import java.nio.file.Files

class StreamingIngestSpec extends SparkSpec {

  private val contract = DataContract(name = "s", fields = Seq(
    ContractField("id", "integer", required = true),
    ContractField("name", "string")))

  test("AvailableNow stream: validate + partitioned write, exactly-once files") {
    val in = Files.createTempDirectory("stream-in-")
    val out = Files.createTempDirectory("stream-out-").toString + "/data"
    val ckpt = Files.createTempDirectory("stream-ckpt-").toString
    Files.writeString(in.resolve("a.csv"), "id,name\n1,alice\n,broken\n2,bob\n")

    val raw = StreamingIngest.readCsvStream(spark, in.toString, contract)
    raw.isStreaming shouldBe true
    val q = StreamingIngest.ingest(raw, contract, ValidationMode.Strict, out, ckpt)
    q.awaitTermination(60000)

    val back = spark.read.parquet(out)
    back.count() shouldBe 2 // broken row dropped by strict transform
    back.columns should contain("ingest_date")

    // second batch: only the NEW file is processed (checkpoint = I2 skip)
    Files.writeString(in.resolve("b.csv"), "id,name\n3,carol\n")
    val q2 = StreamingIngest.ingest(
      StreamingIngest.readCsvStream(spark, in.toString, contract),
      contract, ValidationMode.Strict, out, ckpt)
    q2.awaitTermination(60000)
    spark.read.parquet(out).count() shouldBe 3 // 2 + 1, a.csv not re-ingested
  }

  test("watermarked windowed event counts over a stream") {
    val in = Files.createTempDirectory("stream-ev-")
    Files.writeString(in.resolve("e.csv"),
      "ts,user,value\n2024-01-01 00:00:10,u1,1.0\n2024-01-01 00:00:50,u1,2.0\n" +
        "2024-01-01 00:01:10,u2,5.0\n")
    val raw = spark.readStream
      .schema("ts timestamp, user string, value double")
      .option("header", "true").csv(in.toString)
    val counts = StreamingIngest.windowedEventCounts(
      raw, "ts", "user", "1 minute", "10 seconds")
    val q = counts.writeStream.format("memory").queryName("wincounts")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    // append mode only emits windows the watermark has closed; the final
    // window stays open, so u1's first window is the one emitted
    val rows = spark.sql("SELECT * FROM wincounts").collect()
    rows.map(r => (r.getString(1), r.getLong(2))) should contain(("u1", 2L))
  }
}
