package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column support: opaque `binary` payload
  * + typed metadata, with decode/feature-extract/resize/frame-sample as
  * batched partition-level transforms.
  *
  * The Spark-side plumbing is real and tested — schema, partitioning,
  * batch shape (a `mapPartitions` over row batches, the Scala analog of a
  * pandas-batch UDF: one decoder instance per partition, rows processed
  * in groups). The actual media decode is STUBBED behind [[MediaDecoder]]
  * (this container has no image/audio libraries): [[FakeDecoder]] derives
  * deterministic dimensions from the payload hash and computes REAL
  * byte-level features (histogram, mean), so every downstream stage runs
  * against honest data shapes.
  */
object Multimodal {

  /** Typed metadata carried alongside the opaque payload. */
  final case class MediaMeta(
      mime: String,
      widthPx: Option[Int],
      heightPx: Option[Int],
      durationMs: Option[Long],
      sampleRateHz: Option[Int])

  final case class MediaAsset(asset_id: Long, mime: String, payload: Array[Byte])

  /** Decoded features (per asset). `byteHistogram` is a real 256-bin
    * histogram of the payload; width/height/frames come from the decoder.
    */
  final case class MediaFeatures(
      asset_id: Long,
      mime: String,
      payload_size: Long,
      width_px: Int,
      height_px: Int,
      n_frames: Int,
      mean_byte: Double,
      byte_histogram: Array[Long])

  /** The decode boundary. A production implementation would wrap an image
    * /audio library (e.g. javax.imageio / a JNI codec); the container has
    * none, so the fake below stands in. One instance is created per
    * partition — the place to hold native handles.
    */
  trait MediaDecoder extends Serializable {
    def decode(assetId: Long, mime: String, payload: Array[Byte]): MediaFeatures
  }

  /** Deterministic stand-in decoder: dimensions derived from the payload
    * hash (STUB — a real decoder parses the container format); histogram
    * and mean byte are computed for real.
    *
    * The stub dimensions hash is the first 15 hex digits of the payload's
    * md5 read as a 60-bit integer — chosen (over a JVM hashCode) so the
    * whole feature row is replicable in the SQL oracle:
    * `('0x' || substring(md5(x), 1, 15))::BIGINT`.
    */
  object FakeDecoder extends MediaDecoder {
    private def md5Prefix60(payload: Array[Byte]): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
      // first 15 hex digits = first 7 bytes + high nibble of byte 8
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xFFL); i += 1 }
      (h << 4) | ((d(7) & 0xF0L) >> 4)
    }

    def decode(assetId: Long, mime: String, payload: Array[Byte]): MediaFeatures = {
      val hist = new Array[Long](256)
      var sum = 0L
      var i = 0
      while (i < payload.length) {
        val b = payload(i) & 0xFF
        hist(b) += 1
        sum += b
        i += 1
      }
      // STUB dimensions: a real implementation reads them from the codec.
      val h = md5Prefix60(payload)
      MediaFeatures(
        asset_id = assetId,
        mime = mime,
        payload_size = payload.length.toLong,
        width_px = (64 + h % 1024).toInt,
        height_px = (64 + (h >> 10) % 1024).toInt,
        n_frames = if (mime.startsWith("video/")) (1 + h % 300).toInt else 1,
        mean_byte = if (payload.isEmpty) 0.0 else sum.toDouble / payload.length,
        byte_histogram = hist)
    }
  }

  /** Magic-number mime sniffing as a pure Column expression. */
  def sniffMime(payload: Column): Column = {
    val magic = upper(hex(substring(payload, 1, 4)))
    when(magic.startsWith("89504E47"), "image/png")
      .when(magic.startsWith("FFD8FF"), "image/jpeg")
      .when(magic.startsWith("47494638"), "image/gif")
      .when(magic.startsWith("52494646"), "audio/wav") // RIFF container
      .when(magic.startsWith("1A45DFA3"), "video/webm")
      .otherwise("application/octet-stream")
  }

  def payloadSize(payload: Column): Column = length(payload).cast("long")

  /** Hex sha-256 content address of the payload. */
  def contentHash(payload: Column): Column = sha2(payload, 256)

  /** Batched decode → features. The Scala analog of `mapInPandas`: one
    * decoder per partition, rows pulled in batches of `batchSize` (the
    * batch shape a columnar UDF would see), flat-mapped back out.
    */
  def decodeFeatures(
      assets: Dataset[MediaAsset],
      decoder: MediaDecoder = FakeDecoder,
      batchSize: Int = 64
  ): Dataset[MediaFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map(a => decoder.decode(a.asset_id, a.mime, a.payload))
      }
    }
  }

  /** Deterministic frame sampling: split the payload into `n` contiguous
    * chunks (fake frames — a real codec seeks keyframes) and explode to
    * one row per frame. Pure Column path: schema/partitioning are real.
    */
  def frameSample(df: DataFrame, payloadCol: String, idCol: String, n: Int): DataFrame = {
    val len = length(col(payloadCol))
    val chunk = (len + n - 1).divide(n).cast("int")
    df.select(col(idCol), posexplode(
      transform(sequence(lit(0), lit(n - 1)),
        i => col(payloadCol).substr((i * chunk + lit(1)).cast("int"), chunk))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame_payload")
      .filter(length(col("frame_payload")) > 0)
  }

  /** Build a MediaAsset frame from any table with an id + string column —
    * the deterministic way to exercise binary plumbing on the testdata
    * (payload = UTF-8 bytes of the text).
    */
  def assetsFromText(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      lit("application/octet-stream").as("mime"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** Exact dedup of binary assets by content hash: keep the lowest-id
    * row per distinct payload — the first pass every image/audio corpus
    * runs (identical bytes re-crawled under different URLs). One shuffle
    * on the 32-byte sha256, never on payload bytes; the same
    * fixed-width-key contract as text exact dedup.
    */
  def dedupByContent(df: DataFrame, idCol: String,
      payloadCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(contentHash(col(payloadCol)))
      .orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
