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

  private def tokens = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select(col("source"),
      explode(split(trim(col("text")), "\\s+")).as("tok"))

  test("top-k sketch: per-source top tokens match exact counts (skewed domain)") {
    // the word-soup vocabulary is small (~40 tokens) vs maxItemsTracked,
    // so the sketch is exact here: counts must MATCH, not approximate
    val est = Sketches.topKEstimate(
        Sketches.topKSketch(tokens, "source", "tok", maxItemsTracked = 256),
        "source", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val exact = tokens.groupBy("source", "tok").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    est.nonEmpty shouldBe true
    est.foreach { case (k, c) => exact(k) shouldBe c }
  }

  test("top-k roll-up: merged per-source sketches equal the whole-corpus sketch") {
    val whole = Sketches.topKEstimate(
        Sketches.topKSketch(tokens.withColumn("all", lit("all")), "all", "tok"),
        "all", k = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    val merged = Sketches.topKEstimate(
        Sketches.mergeTopKSketches(
          Sketches.topKSketch(tokens, "source", "tok")
            .withColumn("all", lit("all")),
          "all"),
        "all", k = 10)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    merged shouldBe whole
  }
}
