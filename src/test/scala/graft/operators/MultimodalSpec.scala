package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  import Multimodal._

  private def pngBytes = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
  private def jpgBytes = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 9)

  test("mime sniffing from magic numbers") {
    val df = Seq((1L, pngBytes), (2L, jpgBytes), (3L, Array[Byte](0, 1)))
      .toDF("id", "payload")
    val out = df.select(col("id"), sniffMime(col("payload")).as("m"))
      .as[(Long, String)].collect().toMap
    out(1L) shouldBe "image/png"
    out(2L) shouldBe "image/jpeg"
    out(3L) shouldBe "application/octet-stream"
  }

  test("payload size + sha256 content hash on binary columns") {
    val df = Seq(("x", "hello")).toDF("id", "text")
    val r = assetsFromText(df.withColumn("n", lit(1L)), "n", "text")
      .select(payloadSize(col("payload")), contentHash(col("payload")))
      .collect()(0)
    r.getLong(0) shouldBe 5L
    r.getString(1) shouldBe
      "2cf24dba5fb0a30e26e83b2ac5b9e29e1b161e5c1fa7425e73043362938b9824"
  }

  test("decodeFeatures: batched partition decode, real byte stats") {
    val assets = Seq(
      MediaAsset(1L, "image/png", pngBytes),
      MediaAsset(2L, "video/webm", Array.fill[Byte](100)(7)),
      MediaAsset(3L, "audio/wav", Array.emptyByteArray)).toDS()
    val f = decodeFeatures(assets, FakeDecoder, batchSize = 2)
      .collect().map(x => x.asset_id -> x).toMap
    f(1L).payload_size shouldBe 7
    f(2L).mean_byte shouldBe 7.0
    f(2L).byte_histogram(7) shouldBe 100
    f(2L).n_frames should be > 1 // video gets multi-frame stub
    f(3L).payload_size shouldBe 0
    f(3L).mean_byte shouldBe 0.0
    // determinism: same payload -> same stub dimensions
    val again = decodeFeatures(assets, FakeDecoder).collect()
      .map(x => x.asset_id -> (x.width_px, x.height_px)).toMap
    again(1L) shouldBe ((f(1L).width_px, f(1L).height_px))
  }

  test("frameSample: contiguous chunks cover the payload in order") {
    val df = Seq((1L, "abcdefghij")).toDF("id", "text")
    val assets = assetsFromText(df, "id", "text")
    val frames = frameSample(assets, "payload", "asset_id", 3)
      .select(col("frame_no"), col("frame_payload").cast("string"))
      .as[(Int, String)].collect().sortBy(_._1)
    frames.map(_._2).mkString shouldBe "abcdefghij"
    frames.map(_._1) shouldBe Array(0, 1, 2)
  }
}
