package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.Files

/** Streaming sessionization vs the batch operator: gap-closed sessions
  * emit as soon as the next session's first event arrives; open sessions
  * emit when the EVENT-TIME timeout fires (watermark past end + gap),
  * which also evicts the user's state; and the drained stream's output
  * matches [[graft.operators.Sessionize.sessions]] row-for-row.
  */
class SessionizeStreamSpec extends SparkSpec {
  import spark.implicits._

  private val out = Files.createTempDirectory("sess-out-").toString + "/data"
  private val ckpt = Files.createTempDirectory("sess-ckpt-").toString
  private val in = Files.createTempDirectory("sess-in-")

  private def runStream(): Unit = {
    val raw = spark.readStream
      .schema("user_id long, ts timestamp")
      .option("header", "true").csv(in.toString)
    val q = StreamingIngest.sessionizeStream(raw, "user_id", "ts",
        gapSeconds = 1800, watermarkDelay = "0 seconds")
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
  }

  test("gap-closed sessions emit in-stream; timeouts close the rest; output matches batch") {
    // user 1: two sessions (31-min gap); user 2: one session
    Files.writeString(in.resolve("a.csv"),
      "user_id,ts\n" +
        "1,2024-01-01 10:00:00\n" +
        "1,2024-01-01 10:00:10\n" +
        "1,2024-01-01 10:31:30\n" + // 31m20s after session-1 END → new session
        "2,2024-01-01 10:05:00\n")
    runStream()
    // only user 1's FIRST session has closed (its successor arrived);
    // the others are still open in state
    val first = spark.read.parquet(out)
      .select("user_id", "session_id", "n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    first.toSet shouldBe Set((1L, 0L, 2L))

    // a far-future sentinel advances the watermark past every open
    // session's end + gap → the timeouts emit and evict them
    Files.writeString(in.resolve("b.csv"),
      "user_id,ts\n99,2024-01-01 20:00:00\n")
    runStream()

    val got = spark.read.parquet(out)
      .filter($"user_id" =!= 99)
      .select("user_id", "session_id", "session_start", "session_end",
        "n_events")
      .collect().map(_.toSeq).toSet
    val batch = graft.operators.Sessionize.sessions(
        spark.read.option("header", "true")
          .schema("user_id long, ts timestamp")
          .csv(in.toString)
          .filter($"user_id" =!= 99)
          .selectExpr("user_id", "ts", "monotonically_increasing_id() AS eid"),
        "user_id", "ts", "eid", gapSeconds = 1800)
      .select("user_id", "session_id", "session_start", "session_end",
        "n_events")
      .collect().map(_.toSeq).toSet
    got shouldBe batch
    got.size shouldBe 3 // (1,0) (1,1) (2,0)
  }
}
