package graft.sinks

import graft.SparkSpec
import PartitionTransforms._

class PartitionTransformsSpec extends SparkSpec {
  import spark.implicits._

  test("parse: identity, time transforms, bucket; case-insensitive") {
    parse("ingest_date") shouldBe Identity("ingest_date")
    parse("days(ts)") shouldBe Time("days", "ts")
    parse("HOURS( event_ts )") shouldBe Time("hours", "event_ts")
    parse("years(ts)") shouldBe Time("years", "ts")
    parse("months(ts)") shouldBe Time("months", "ts")
    parse("bucket(16, user_id)") shouldBe Bucket(16, "user_id")
    parse("Bucket( 4 , id )") shouldBe Bucket(4, "id")
  }

  test("derived names are stable and collision-averse") {
    derivedName(Identity("Ingest_Date")) shouldBe "ingest_date"
    derivedName(Time("days", "TS")) shouldBe "ts_day"
    derivedName(Time("months", "ts")) shouldBe "ts_month"
    derivedName(Bucket(8, "Id")) shouldBe "id_bucket"
  }

  test("materialize derives identity columns with correct values") {
    val df = Seq(
      (7L, java.sql.Timestamp.valueOf("2024-05-06 13:45:00"))
    ).toDF("id", "ts")
    val (out, cols) = materialize(df, Seq("days(ts)", "months(ts)",
      "years(ts)", "hours(ts)", "bucket(4, id)", "id"))
    cols shouldBe Seq("ts_day", "ts_month", "ts_year", "ts_hour", "id_bucket", "id")
    val row = out.select("ts_day", "ts_month", "ts_year", "ts_hour", "id_bucket").head
    row.getString(0) shouldBe "2024-05-06"
    row.getString(1) shouldBe "2024-05"
    row.getString(2) shouldBe "2024"
    row.getString(3) shouldBe "2024-05-06-13"
    row.getLong(4) should (be >= 0L and be < 4L)
  }

  test("materialize with identity-only entries is a no-op on the frame") {
    val df = Seq((1L, "x")).toDF("id", "name")
    val (out, cols) = materialize(df, Seq("name"))
    cols shouldBe Seq("name")
    out.columns shouldBe df.columns
  }
}
