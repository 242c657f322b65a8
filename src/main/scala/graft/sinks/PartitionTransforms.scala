package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Partition-transform specs for target `partitioning` entries.
  *
  * The reference creates Iceberg partition specs with IdentityTransform
  * only (iceberg_committer.py:437-468); time/bucket transforms are the
  * Spark-first extension a 100 TB table actually needs — partitioning raw
  * event tables by `days(ts)` or `bucket(n, id)` is what keeps partition
  * pruning effective without exploding partition counts.
  *
  * Accepted syntax per entry (case-insensitive):
  * {{{
  *   col_name                — identity
  *   years(col) | months(col) | days(col) | hours(col)
  *   bucket(n, col)
  * }}}
  *
  * Two consumers, two renderings:
  *  - V2 catalog path ([[CatalogTableBackend]]): rendered as Spark
  *    `functions.partitioning` transform columns for `partitionedBy` —
  *    the catalog stores the transform itself, values stay raw.
  *  - Parquet-only degradation path: transforms have no Hive-layout
  *    analog, so [[materialize]] derives an identity column per transform
  *    (`ts_day = date(ts)`, `id_bucket = pmod(xxhash64(id), n)`, …) and
  *    the write partitions on that — data still lands partitioned
  *    sensibly instead of failing or silently un-partitioned.
  */
object PartitionTransforms {

  sealed trait Spec { def sourceCol: String }
  final case class Identity(sourceCol: String) extends Spec
  /** unit ∈ years|months|days|hours */
  final case class Time(unit: String, sourceCol: String) extends Spec
  final case class Bucket(n: Int, sourceCol: String) extends Spec

  private val TimeRe = "(?i)^(years|months|days|hours)\\s*\\(\\s*([^()\\s]+)\\s*\\)$".r
  private val BucketRe = "(?i)^bucket\\s*\\(\\s*(\\d+)\\s*,\\s*([^()\\s]+)\\s*\\)$".r

  def parse(entry: String): Spec = entry.trim match {
    case TimeRe(unit, c)  => Time(unit.toLowerCase, c)
    case BucketRe(n, c)   => Bucket(n.toInt, c)
    case plain            => Identity(plain)
  }

  def parseAll(entries: Seq[String]): Seq[Spec] = entries.map(parse)

  /** The V2 `partitionedBy` column for a spec (transform columns from
    * `org.apache.spark.sql.functions.partitioning`).
    */
  def toV2Column(spec: Spec): Column = spec match {
    case Identity(c)      => col(c.toLowerCase)
    case Time("years", c)  => partitioning.years(col(c))
    case Time("months", c) => partitioning.months(col(c))
    case Time("days", c)   => partitioning.days(col(c))
    case Time("hours", c)  => partitioning.hours(col(c))
    case Time(u, c)        =>
      throw new IllegalArgumentException(s"unknown time transform $u($c)")
    case Bucket(n, c)      => partitioning.bucket(lit(n), col(c))
  }

  /** Derived identity column name for the parquet degradation path. */
  def derivedName(spec: Spec): String = spec match {
    case Identity(c)   => c.toLowerCase
    case Time(u, c)    => s"${c.toLowerCase}_${u.stripSuffix("s")}"
    case Bucket(_, c)  => s"${c.toLowerCase}_bucket"
  }

  /** Materialize transform specs as identity columns on `df`; returns the
    * frame plus the (identity) partition column names to use. Identity
    * specs pass through untouched — [[ParquetSink.preparePartitions]]
    * still owns their normalization and `ingest_date` synthesis.
    */
  def materialize(df: DataFrame, entries: Seq[String]): (DataFrame, Seq[String]) = {
    val specs = parseAll(entries)
    val out = specs.foldLeft(df) { (d, spec) =>
      spec match {
        case Identity(_)       => d
        case Time("years", c)  =>
          d.withColumn(derivedName(spec), year(col(c)).cast("string"))
        case Time("months", c) =>
          d.withColumn(derivedName(spec), date_format(col(c), "yyyy-MM"))
        case Time("days", c)   =>
          d.withColumn(derivedName(spec), to_date(col(c)).cast("string"))
        case Time("hours", c)  =>
          d.withColumn(derivedName(spec), date_format(col(c), "yyyy-MM-dd-HH"))
        case Time(u, c)        =>
          throw new IllegalArgumentException(s"unknown time transform $u($c)")
        case Bucket(n, c)      =>
          // NOT Iceberg's murmur3 bucket — this path has no Iceberg table
          // to agree with; any stable modular hash spreads the data
          d.withColumn(derivedName(spec), pmod(xxhash64(col(c)), lit(n)))
      }
    }
    (out, specs.map(derivedName))
  }
}
