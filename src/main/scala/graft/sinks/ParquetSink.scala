package graft.sinks

import graft.core.ValidationMode
import org.apache.spark.sql.{Column, DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import java.util.UUID

/** Partitioned, size-targeted Parquet sink (SURVEY.md §2.4 W1/W2 + M7).
  *
  * Reference semantics preserved:
  *  - Hive-style `col=value/` partition layout with value normalization —
  *    lowercase, ISO dates kept verbatim, everything else lowercased with
  *    `[^a-z0-9_-]` squashed to `_` (parquet_writer.py:88-158,188-199).
  *    Spark's `write.partitionBy` produces the same layout natively; the
  *    normalization is applied to the partition column values pre-write.
  *  - target file size 128–200 MB, default 150
  *    (parquet_writer.py:33-35, config.py:412-414), estimated by writing a
  *    ≤1000-row sample and extrapolating bytes/row
  *    (parquet_writer.py:360-381) → `maxRecordsPerFile`.
  *  - snappy compression + dictionary encoding (parquet_writer.py:424-429);
  *    both are Spark parquet defaults, set explicitly anyway.
  *  - `ingest_date` synthesized as today when it is a partition column but
  *    absent from the data (parquet_writer.py:98-100).
  *
  * Scale note: the write is shuffle-free (dynamic partition write straight
  * from the task outputs). When many small tasks would fragment partitions,
  * callers can pre-`repartition(partitionCols)` — left to the caller since
  * it trades a shuffle for file count.
  */
object ParquetSink {

  val MinTargetMb = 128
  val MaxTargetMb = 200
  val DefaultTargetMb = 150

  private val IsoDate = "^\\d{4}-\\d{2}-\\d{2}$"

  /** Partition-value normalization (parquet_writer.py:134-155): ISO dates
    * kept; other values lowercased and non `[a-z0-9_-]` chars → `_`.
    */
  def normalizePartitionValue(c: Column): Column = {
    val s = c.cast("string")
    when(s.rlike(IsoDate), s)
      .otherwise(regexp_replace(lower(s), "[^a-z0-9_-]", "_"))
  }

  /** Synthesize `ingest_date` (M7) + normalize partition values (W1).
    * Partition column names are lowercased like the reference's path rule.
    */
  def preparePartitions(df: DataFrame, partitionCols: Seq[String]): DataFrame = {
    val withIngest =
      if (partitionCols.exists(_.equalsIgnoreCase("ingest_date")) &&
        !df.columns.exists(_.equalsIgnoreCase("ingest_date")))
        df.withColumn("ingest_date", current_date().cast("string"))
      else df
    partitionCols.foldLeft(withIngest) { (d, pc) =>
      val actual = d.columns.find(_.equalsIgnoreCase(pc)).getOrElse(pc)
      d.withColumn(pc.toLowerCase, normalizePartitionValue(col(actual)))
    }
  }

  /** Estimate rows/file for the size target by sample-write extrapolation,
    * the reference's own trick (parquet_writer.py:360-381). Returns 0
    * (= unlimited) when the frame is empty.
    *
    * The ≤`sampleRows` sample is written to a hidden temp dir on the SAME
    * Hadoop filesystem as `outputPath` and measured through the Hadoop FS
    * API — a driver-local java.nio path would measure 0 bytes on any real
    * cluster (default FS ≠ driver disk) and silently disable the 128–200 MB
    * semantic.
    *
    * CAUTION: this runs two Spark actions on `df`. Never pass a frame
    * carrying an `observe()` whose metrics you still need — the sample
    * actions would satisfy the Observation with partial-scan counts. The
    * job driver passes the un-observed twin of its output plan.
    */
  def estimateMaxRecordsPerFile(df: DataFrame, outputPath: String, targetMb: Int,
      sampleRows: Int = 1000): Long = {
    val clamped = math.max(MinTargetMb, math.min(MaxTargetMb, targetMb))
    val hconf = df.sparkSession.sessionState.newHadoopConf()
    val base = new org.apache.hadoop.fs.Path(outputPath)
    val fs = base.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(
      base.getParent match { case null => base; case p => p },
      s".graft_sizing_${UUID.randomUUID().toString}")
    try {
      df.limit(sampleRows).coalesce(1)
        .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      val parts = fs.listStatus(tmp).filter(_.getPath.getName.endsWith(".parquet"))
      val bytes = parts.map(_.getLen).sum
      // row count from the written files' footers — no extra scan of df
      val n = df.sparkSession.read.parquet(tmp.toString).count()
      if (n == 0) return 0L
      val bytesPerRow = math.max(1L, bytes / n)
      math.max(1L, clamped.toLong * 1024L * 1024L / bytesPerRow)
    } finally {
      try fs.delete(tmp, true) catch { case _: Throwable => () }
    }
  }

  /** Output root `bucket/domain/data_product/table/` (cli.py:695-723). */
  def outputPath(root: String, domain: String, dataProduct: String, table: String): String =
    Seq(root.stripSuffix("/"), domain, dataProduct, table).mkString("/")

  /** Data files under `location` modified at/after `sinceMs` — the
    * files_written / bytes_written completion metrics (reference
    * metrics.py:86-98 `record_writing`). A recursive Hadoop-FS listing
    * (driver-side, proportional to file count, not data); metadata files
    * (`_SUCCESS`, sidecars, hidden dirs) excluded.
    */
  def writtenFiles(spark: org.apache.spark.sql.SparkSession, location: String,
      sinceMs: Long): Seq[(String, Long)] = {
    val base = new org.apache.hadoop.fs.Path(location)
    val fs = base.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(base)) Nil
    else {
      val it = fs.listFiles(base, true)
      val out = Seq.newBuilder[(String, Long)]
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".") &&
          f.getModificationTime >= sinceMs)
          out += f.getPath.toString -> f.getLen
      }
      out.result()
    }
  }

  final case class WriteReport(path: String, partitionCols: Seq[String], maxRecordsPerFile: Long)

  /** Partitioned, size-targeted write. `maxRecordsPerFile`: pass a
    * precomputed estimate (from [[estimateMaxRecordsPerFile]] on an
    * un-observed twin of this plan) or None to estimate here — only safe
    * when `df` carries no Observation.
    */
  def write(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String] = Nil,
      targetMb: Int = DefaultTargetMb,
      mode: SaveMode = SaveMode.Append,
      maxRecordsPerFile: Option[Long] = None,
      coalescePartitions: Boolean = false
  ): WriteReport = {
    val prepared0 = preparePartitions(df, partitionCols)
    // Optional shuffle-for-file-count trade: hash-repartition on the
    // partition columns so each Hive partition is written by few tasks
    // (otherwise every task writes a sliver of every partition — at 1000
    // executors × 1000 partitions that is 1M small files). Off by default
    // because it adds a full shuffle; maxRecordsPerFile still bounds the
    // upper file size either way.
    val prepared =
      if (coalescePartitions && partitionCols.nonEmpty)
        prepared0.repartition(partitionCols.map(c => col(c.toLowerCase)): _*)
      else prepared0
    val maxRecords = maxRecordsPerFile.getOrElse(
      estimateMaxRecordsPerFile(prepared, path, targetMb))
    var w = prepared.write
      .mode(mode)
      .option("compression", "snappy")
      .option("parquet.enable.dictionary", "true")
    if (maxRecords > 0) w = w.option("maxRecordsPerFile", maxRecords.toString)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols.map(_.toLowerCase): _*)
    w.parquet(path)
    WriteReport(path, partitionCols.map(_.toLowerCase), maxRecords)
  }
}
