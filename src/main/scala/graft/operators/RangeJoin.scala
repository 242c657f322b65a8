package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval-containment (range) join — attribution windows, IP-range
  * lookups, validity-period joins. Spark plans the naive non-equi form
  * (`p BETWEEN start AND end`) as a broadcast-nested-loop join: every
  * point against every interval.
  *
  * The scalable shape is bucketization: intervals explode into the
  * fixed-width buckets they overlap, points key into their single
  * bucket, and an ordinary equi-join on (keys, bucket) followed by the
  * exact containment filter does the rest. A point lives in exactly one
  * bucket, so no pair can match twice — no dedup pass. Cost scales with
  * true match density plus interval length / bucketWidth blowup; pick
  * `bucketWidth` near the typical interval length so each interval
  * explodes into ~2 buckets.
  *
  * Domain: non-negative longs (epoch micros, IP-as-long, …) — `div`
  * truncation anchors buckets at 0. Both inputs' non-key columns must
  * be disjointly named (rename before calling); `__bk` is reserved.
  */
object RangeJoin {

  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keys: Seq[String],
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val ivb = intervals.withColumn("__bk", explode(sequence(
      expr(s"$startCol div $bucketWidth"), expr(s"$endCol div $bucketWidth"))))
    val ptb = points.withColumn("__bk", expr(s"$pointCol div $bucketWidth"))
    ptb.join(ivb, keys :+ "__bk")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) <= col(endCol))
      .drop("__bk")
  }
}
