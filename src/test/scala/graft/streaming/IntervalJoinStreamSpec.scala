package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Stream-stream interval join vs the batch operator: same window
  * semantics (left events in [rightTs − window, rightTs], inclusive
  * both ends), bounded state via the derived join watermarks, and the
  * drained two-stream output matches
  * [[graft.operators.RangeJoin.intervalJoin]] on the same rows.
  */
class IntervalJoinStreamSpec extends SparkSpec {
  import spark.implicits._

  test("clicks-before-purchase attribution matches the batch interval join") {
    val clicksDir = Files.createTempDirectory("ij-clicks-")
    val purchasesDir = Files.createTempDirectory("ij-purch-")
    val out = Files.createTempDirectory("ij-out-").toString + "/data"
    val ckpt = Files.createTempDirectory("ij-ckpt-").toString
    Files.writeString(clicksDir.resolve("a.csv"),
      "user_id,click_id,click_ts\n" +
        "1,10,2024-01-01 10:00:00\n" + // exactly 1h before → inclusive
        "1,11,2024-01-01 10:30:00\n" +
        "1,12,2024-01-01 11:30:00\n" + // after the purchase → out
        "2,20,2024-01-01 10:45:00\n")  // other user's window
    Files.writeString(purchasesDir.resolve("b.csv"),
      "user_id,purchase_id,purchase_ts\n" +
        "1,100,2024-01-01 11:00:00\n" +
        "2,200,2024-01-01 11:00:00\n")
    val clicks = spark.readStream
      .schema("user_id long, click_id long, click_ts timestamp")
      .option("header", "true").csv(clicksDir.toString)
    val purchases = spark.readStream
      .schema("user_id long, purchase_id long, purchase_ts timestamp")
      .option("header", "true").csv(purchasesDir.toString)
    val q = StreamingIngest.intervalJoinStream(
        clicks, purchases, Seq("user_id"), "click_ts", "purchase_ts",
        windowBefore = "1 hour", watermarkDelay = "0 seconds")
      .select("user_id", "purchase_id", "click_id")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)

    val got = spark.read.parquet(out)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe Set((1L, 100L, 10L), (1L, 100L, 11L), (2L, 200L, 20L))

    // the batch operator on the same rows agrees (shared semantics pin)
    val HourUs = 3600L * 1000 * 1000
    val bc = spark.read.option("header", "true")
      .schema("user_id long, click_id long, click_ts timestamp")
      .csv(clicksDir.toString)
      .select(col("user_id"), col("click_id"),
        unix_micros(col("click_ts")).as("p"))
    val bp = spark.read.option("header", "true")
      .schema("user_id long, purchase_id long, purchase_ts timestamp")
      .csv(purchasesDir.toString)
      .select(col("user_id"), col("purchase_id"),
        (unix_micros(col("purchase_ts")) - HourUs).as("w_start"),
        unix_micros(col("purchase_ts")).as("w_end"))
    val batch = graft.operators.RangeJoin.intervalJoin(
        bc, bp, Seq("user_id"), "p", "w_start", "w_end", HourUs)
      .select("user_id", "purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    got shouldBe batch
  }

  test("same-named timestamps are rejected") {
    val df = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("user_id", "ts")
    an[IllegalArgumentException] should be thrownBy
      StreamingIngest.intervalJoinStream(df, df, Seq("user_id"),
        "ts", "ts", "1 hour", "0 seconds")
  }
}
