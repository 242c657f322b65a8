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
}
