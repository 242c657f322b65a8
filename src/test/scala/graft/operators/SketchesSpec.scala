package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** HLL sketches: estimates near truth, and — the property that makes
  * them usable at scale — merging partial sketches gives exactly the
  * same answer as sketching the whole.
  */
class SketchesSpec extends SparkSpec {

  private def events = spark.read
    .parquet("/root/testdata/sf0.001/events.parquet")
    .select(col("event_type"), col("user_id"))

  test("per-type estimates within HLL error of exact distinct counts") {
    val est = Sketches.withEstimate(
        Sketches.distinctSketch(events, "event_type", "user_id"))
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val exact = events.groupBy("event_type")
      .agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, d) =>
      est(t).toDouble shouldBe d.toDouble +- math.max(2.0, d * 0.05)
    }
  }

  test("merge of per-type sketches equals the whole-corpus sketch exactly") {
    val whole = Sketches.withEstimate(
        Sketches.distinctSketch(events.withColumn("all", lit("all")),
          "all", "user_id"))
      .collect()(0).getLong(2)
    val merged = Sketches.withEstimate(
        Sketches.mergeSketches(
          Sketches.distinctSketch(events, "event_type", "user_id")
            .withColumn("all", lit("all")),
          "all"))
      .collect()(0).getLong(2)
    merged shouldBe whole
  }
}
