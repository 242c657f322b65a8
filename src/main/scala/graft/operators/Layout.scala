package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators for scan pruning at scale.
  *
  * Parquet (and every lakehouse format over it) prunes row groups by
  * min/max statistics; a table range-partitioned and sorted by ONE key
  * prunes that key only. Z-ORDERING interleaves the bits of two keys so
  * rows close in EITHER dimension land close in the one-dimensional
  * sort — after `zorderBy`, a filter on either column (or both) skips
  * most files/row-groups. This is the same layout optimization Delta's
  * `OPTIMIZE ZORDER BY` and Iceberg's `rewrite_data_files(sort_order =>
  * zorder(...))` run; here it is a plain DataFrame transform usable in
  * front of any parquet write.
  *
  * Nearest reference analog: none (the reference writes partition
  * directories only) — a beyond-reference scale extension.
  */
object Layout {

  /** 64-bit Morton (Z-curve) value: the low 32 bits of `a` and `b`
    * interleaved (a on even bit positions, b on odd). A pure literal
    * shift/mask OR-chain — fully codegen'd, no UDF — and replayable in
    * ANSI SQL with the same expression. Inputs are treated as UNSIGNED
    * 32-bit (callers rank or clamp first; [[rankZValue]] does this).
    */
  def zValue(a: Column, b: Column, bitsPer: Int = 32): Column = {
    require(bitsPer >= 1 && bitsPer <= 32, s"bitsPer in [1,32]: $bitsPer")
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bitsPer).map { i =>
      (shiftright(al, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)))
        .bitwiseOR(
          shiftright(bl, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }.reduce(_ bitwiseOR _)
  }

  /** Z-value over per-column RANKS (dense row_number within the frame)
    * rather than raw values — rank-space interleaving is what production
    * Z-ordering does (Delta uses range-partition ids), because raw
    * domains are skewed and unbounded while ranks are uniform in
    * [0, n). Two window sorts (one per column), then the map-side
    * interleave.
    */
  def withRankZValue(df: DataFrame, colA: String, colB: String,
      outCol: String = "z_value"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ra = row_number().over(Window.orderBy(col(colA))).cast("long") - 1
    val rb = row_number().over(Window.orderBy(col(colB))).cast("long") - 1
    df.withColumn("__ra", ra).withColumn("__rb", rb)
      .withColumn(outCol, zValue(col("__ra"), col("__rb")))
      .drop("__ra", "__rb")
  }

  /** The layout action: range-partition by the rows' Z-value and sort
    * within partitions, so a subsequent parquet write yields files whose
    * min/max statistics are TIGHT in both dimensions — filters on either
    * column prune most files. `partitions` sizes the output files.
    *
    * Scale note: rank windows above are single-partition for exactness;
    * at 100 TB swap them for `ntile`/range-bucket ranks (percentile-
    * approximate, map-side after one sample pass) — the interleave and
    * the repartitionByRange stay identical. [[zorderByApprox]] is that
    * path.
    */
  def zorderBy(df: DataFrame, colA: String, colB: String,
      partitions: Int): DataFrame = {
    val z = withRankZValue(df, colA, colB)
    z.repartitionByRange(partitions, col("z_value"))
      .sortWithinPartitions("z_value")
      .drop("z_value")
  }

  /** Bucketed Z-order — the 100 TB path: per-column position comes from
    * `width_bucket` against the column's min/max (ONE tiny aggregate,
    * then map-side binning), so there is no global rank window. Bucket
    * count bounds the interleave resolution; 2^16 buckets per dimension
    * is plenty to make row-group statistics tight. (Equi-width buckets
    * trade a little balance on skewed domains for a sample-free plan;
    * swap the bounds for approxQuantile boundaries if the domain is
    * pathological.)
    */
  def zorderByApprox(df: DataFrame, colA: String, colB: String,
      partitions: Int, buckets: Int = 1 << 16): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(buckets - 1))
    val Array(row) = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double"))
      .collect()
    // width_bucket returns buckets+1 for values equal to the column max,
    // so after the -1 the max rows would need bits+1 bits and wrap to
    // z≈0 in the interleave — clamp them into the top bucket. Null
    // values (and an all-null column, whose min/max are null) bin to
    // bucket 0 so every row keeps a non-null, deterministic z.
    def bucketCol(c: String, i: Int): Column =
      if (row.isNullAt(i) || row.isNullAt(i + 1) ||
          row.getDouble(i) == row.getDouble(i + 1)) lit(0L)
      else coalesce(
        least(
          width_bucket(col(c).cast("double"),
            lit(row.getDouble(i)), lit(row.getDouble(i + 1)), lit(buckets)) - 1,
          lit((buckets - 1).toLong)),
        lit(0L))
    df.withColumn("__za", bucketCol(colA, 0))
      .withColumn("__zb", bucketCol(colB, 2))
      .withColumn("__z", zValue(col("__za"), col("__zb"), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__za", "__zb", "__z")
  }

  /** Quantile-bounded Z-order — [[zorderByApprox]] for PATHOLOGICAL
    * domains. Equi-width buckets degrade under skew: on a log-normal
    * column one outlier stretches the range until most rows share
    * bucket 0, the Z-value carries no information in that dimension, and
    * file min/max statistics stop pruning. Here bucket boundaries are
    * `approxQuantile`s (ONE sample-sketch pass computes both columns'
    * boundaries), so buckets hold ~equal row counts no matter the shape
    * of the domain.
    *
    * Binning against arbitrary boundaries is a literal BINARY-SEARCH
    * `when`-tree (depth log2(buckets)) — a pure Column expression, so it
    * stays map-side and codegen'd like `width_bucket`; no UDF, no join
    * against a boundary table. Nulls (and columns whose sketch comes
    * back empty) bin to bucket 0, as in [[zorderByApprox]].
    */
  def zorderByQuantile(df: DataFrame, colA: String, colB: String,
      partitions: Int, buckets: Int = 256,
      relativeError: Double = 0.001): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val probs = (1 until buckets).map(_.toDouble / buckets).toArray
    val doubled = df
      .withColumn("__qa", col(colA).cast("double"))
      .withColumn("__qb", col(colB).cast("double"))
    val Array(rawA, rawB) =
      doubled.stat.approxQuantile(Array("__qa", "__qb"), probs, relativeError)
    // skewed domains repeat quantile values; distinct-sorted cut points
    // (bucket count adapts downward, the search tree stays balanced)
    def cuts(raw: Array[Double]): Array[Double] = raw.distinct.sorted
    val (ca, cb) = (cuts(rawA), cuts(rawB))
    def bucketCol(c: String, bounds: Array[Double]): Column =
      quantileBucket(col(c), bounds)
    val bits = math.max(1, 32 - Integer.numberOfLeadingZeros(
      math.max(ca.length, cb.length))) // bucket indices go up to cuts.length
    df.withColumn("__za", bucketCol(colA, ca))
      .withColumn("__zb", bucketCol(colB, cb))
      .withColumn("__z", zValue(col("__za"), col("__zb"), bits))
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__za", "__zb", "__z")
  }

  /** Bucket index of `value` against sorted distinct `bounds` — a literal
    * binary-search `when`-tree (depth log2(|bounds|)): pure Column, so it
    * stays map-side and codegen'd; no UDF, no boundary-table join.
    * Returns the count of boundaries <= value.
    *
    * The null guard sits OUTSIDE the search tree: inside it a null value
    * makes every `<` comparison null, so each `when` falls through to its
    * otherwise branch and a null row would land in the TOP bucket — and
    * since the leaves are non-null literals a trailing coalesce never
    * fires. Guarding first sends nulls to bucket 0, matching
    * [[zorderByApprox]].
    */
  private[operators] def quantileBucket(value: Column,
      bounds: Array[Double]): Column = {
    def search(lo: Int, hi: Int): Column = // buckets [lo, hi] remain
      if (lo >= hi) lit(lo.toLong)
      else {
        val mid = (lo + hi) / 2
        when(value.cast("double") < lit(bounds(mid)), search(lo, mid))
          .otherwise(search(mid + 1, hi))
      }
    if (bounds.isEmpty) lit(0L)
    else when(value.cast("double").isNull, lit(0L))
      .otherwise(search(0, bounds.length))
  }
}
