package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable distinct-count sketches (Apache DataSketches HLL, built
  * into Spark) — at 100 TB you don't recount distinct users per
  * segment on every query: you keep a small sketch per
  * (segment, day) partition and MERGE them for any roll-up, paying one
  * narrow shuffle of ~1 KB sketches instead of a distinct over raw ids.
  *
  * No DuckDB oracle — sketch bytes are library-specific — so this
  * surface is spec-tested: the merge-of-parts estimate must equal the
  * whole-corpus estimate exactly (same sketch algebra), and estimates
  * must sit within HLL error of truth.
  */
object Sketches {

  /** One HLL sketch per group over `valueCol` (lgConfigK = 12 ≈ 1.6%
    * standard error, ~2 KB per sketch).
    */
  def distinctSketch(df: DataFrame, groupCol: String, valueCol: String,
      lgConfigK: Int = 12): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgConfigK)).as("sketch"))

  /** Merge per-group sketches up to one sketch per coarser group —
    * the roll-up that replaces re-scanning raw data.
    */
  def mergeSketches(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(hll_union_agg(col("sketch")).as("sketch"))

  /** Read the distinct-count estimate off a sketch column. */
  def withEstimate(df: DataFrame): DataFrame =
    df.withColumn("estimate", hll_sketch_estimate(col("sketch")))

  // ---------------------------------------------------------------------
  // Frequent-items (heavy-hitter) sketches — the same partition-and-merge
  // algebra for "top tokens per segment": keep a bounded sketch per fine
  // partition, MERGE for any roll-up, estimate top-k off the merged
  // state. Spark 4's approx_top_k family (DataSketches ItemsSketch
  // underneath) provides accumulate/combine/estimate as native
  // aggregates; these wrappers pin the graft shape: one sketch column
  // named `sketch`, group columns preserved, estimates exploded to
  // (item, count) rows.
  // ---------------------------------------------------------------------

  /** One frequent-items sketch per group over `valueCol`.
    * `maxItemsTracked` bounds sketch memory and the later estimate's k.
    */
  def topKSketch(df: DataFrame, groupCol: String, valueCol: String,
      maxItemsTracked: Int = 1024): DataFrame =
    df.groupBy(col(groupCol))
      .agg(expr(s"approx_top_k_accumulate($valueCol, $maxItemsTracked)")
        .as("sketch"))

  /** Merge per-group top-k sketches up to one per coarser group. */
  def mergeTopKSketches(df: DataFrame, groupCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(expr("approx_top_k_combine(sketch)").as("sketch"))

  /** Explode the k best estimates off a sketch column into
    * (group, item, count) rows.
    */
  def topKEstimate(df: DataFrame, groupCol: String, k: Int): DataFrame =
    df.select(col(groupCol),
        explode(expr(s"approx_top_k_estimate(sketch, $k)")).as("e"))
      .select(col(groupCol), col("e.item").as("item"),
        col("e.count").as("count"))
}
