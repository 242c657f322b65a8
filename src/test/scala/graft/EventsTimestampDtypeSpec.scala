package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts parquet dtype has already changed under the repo once:
  * the driver regenerated the testdata between rounds 10 and 11 and
  * `timestamp[ns]` (read as long under nanosAsLong) became
  * `timestamp[us]` with no UTC flag (read as TIMESTAMP_NTZ), which
  * silently killed the two queries doing raw epoch arithmetic on the
  * column. This spec pins every events-reading registered query against
  * all three shapes the data has shipped in — int64 nanos, NTZ micros,
  * UTC micros — so the NEXT dtype drift fails a unit test instead of
  * vanishing from the correctness file.
  */
class EventsTimestampDtypeSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  // every registered query that reads the events table; layout_zorder
  // reads it too but doesn't carry the events_ prefix
  private def eventQueries: Seq[String] =
    (SparkEntry.queries.keys.filter(_.startsWith("events_")).toSeq :+
      "layout_zorder").sorted

  private lazy val shapeDirs: Map[String, String] = {
    val raw = spark.read.parquet(s"$base/events.parquet")
    // canonical epoch micros, whatever shape the source currently has
    val us: Column = raw.schema("ts").dataType match {
      case LongType         => expr("ts div 1000")
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
      case _                => unix_micros(col("ts"))
    }
    val canon = raw.withColumn("__us", us)
    val root = java.nio.file.Files.createTempDirectory("events-dtype-").toString
    def write(shape: String, tsCol: Column): String = {
      val dir = s"$root/$shape"
      canon.withColumn("ts", tsCol).drop("__us")
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      dir
    }
    Map(
      "int64_nanos" -> write("int64_nanos", col("__us") * 1000),
      "ntz_micros"  -> write("ntz_micros",
        timestamp_micros(col("__us")).cast(TimestampNTZType)),
      "utc_micros"  -> write("utc_micros", timestamp_micros(col("__us"))))
  }

  test("the three written shapes read back as the dtypes they model") {
    def tsType(dir: String): DataType =
      spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
    tsType(shapeDirs("int64_nanos")) shouldBe LongType
    tsType(shapeDirs("ntz_micros")) shouldBe TimestampNTZType
    tsType(shapeDirs("utc_micros")) shouldBe TimestampType
  }

  test("the events query list is current") {
    eventQueries should contain allOf ("events_sessionize",
      "events_interval_join", "events_asof_join", "events_hopping_window",
      "events_latest_per_user", "events_json_extract", "layout_zorder")
  }

  for (shape <- Seq("int64_nanos", "ntz_micros", "utc_micros")) {
    test(s"every events query analyzes on $shape") {
      val dir = shapeDirs(shape)
      for (name <- eventQueries)
        withClue(s"$name on $shape: ") {
          noException should be thrownBy
            SparkEntry.queries(name)(spark, dir).queryExecution.analyzed
        }
    }

    // the two queries the r11 dtype drift actually killed (epoch
    // arithmetic): run them to completion, and pin that sessionization
    // produces identical sessions on every shape
    test(s"sessionize + interval join execute on $shape") {
      val dir = shapeDirs(shape)
      val sessions = SparkEntry.queries("events_sessionize")(spark, dir)
        .agg(count(lit(1)), sum("n_events"), max("session_id"))
        .collect()(0)
      sessions shouldBe SparkEntry.queries("events_sessionize")(spark, base)
        .agg(count(lit(1)), sum("n_events"), max("session_id"))
        .collect()(0)
      SparkEntry.queries("events_interval_join")(spark, dir).count() shouldBe
        SparkEntry.queries("events_interval_join")(spark, base).count()
    }
  }
}
