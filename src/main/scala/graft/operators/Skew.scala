package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation helpers for hot aggregation/join keys at scale.
  *
  * AQE's skew-join splitting handles most cases automatically; these are
  * for the aggregation-side skew AQE does not touch — e.g. a groupBy
  * where one key holds 30% of a 100 TB table, pinning one reducer.
  */
object Skew {

  /** Two-phase salted aggregation: phase 1 groups on (keys, salt) —
    * spreading each hot key over `saltBuckets` reducers — phase 2 merges
    * the partials per key. The caller supplies MERGEABLE aggregates as
    * (partial, merge) pairs sharing an alias, e.g.
    * {{{
    *   saltedAgg(df, Seq("k"), 32,
    *     sum("v").as("sum_v")   -> sum("sum_v").as("sum_v"),
    *     count(lit(1)).as("n") -> sum("n").as("n"))
    * }}}
    * (avg must be decomposed into sum+count by the caller — it does not
    * merge.)
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltBuckets: Int,
      aggs: (Column, Column)*): DataFrame = {
    require(aggs.nonEmpty, "saltedAgg requires at least one aggregate pair")
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val phase1 = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(aggs.head._1, aggs.tail.map(_._1): _*)
    phase1
      .groupBy(keys.map(col): _*)
      .agg(aggs.head._2, aggs.tail.map(_._2): _*)
  }

  /** Skew-proof exact distinct count: the dedupe phase hash-partitions on
    * the FULL (keys, value) pair — a hot key's values spread across
    * reducers naturally, so no explicit salt column is needed — and only
    * the already-deduplicated pairs hit the per-key count.
    */
  def countDistinctSpread(df: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    df.select((keys.map(col) :+ col(valueCol)): _*)
      .distinct() // Spark partial-aggregates distinct pairs map-side
      .groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as(s"distinct_$valueCol"))

  /** Broadcast-salted join for a skewed fact side: replicate each build-
    * side row `saltBuckets` times with an explicit salt, salt the probe
    * side randomly-but-deterministically, and join on (key, salt). Use
    * when AQE's skew split cannot apply (e.g. bucketed tables).
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      saltBuckets: Int): DataFrame = {
    val saltedProbe = probe.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(saltBuckets)))
    val replicatedBuild = build
      .withColumn("__salt", explode(sequence(lit(0), lit(saltBuckets - 1))))
      .withColumn("__salt", col("__salt").cast("long"))
    saltedProbe.join(replicatedBuild, Seq(key, "__salt")).drop("__salt")
  }
}
