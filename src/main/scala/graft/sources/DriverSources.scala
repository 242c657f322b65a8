package graft.sources

import graft.core.Coercion
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Driver-side SaaS sources S4/S5 (SURVEY.md §2.1): Google Sheets and
  * Drive-hosted CSVs. The reference fetches these through Google APIs on
  * the driver (google_sheets_extractor.py:219-377,
  * gdrive_csv_extractor.py:158-377); the Spark port keeps that shape —
  * driver-side fetch, then `spark.createDataFrame` / a staged CSV scan —
  * behind tiny API traits so the network client is pluggable and the
  * pipeline logic is testable offline (the Google client libs are not in
  * this environment; DSv2 providers are the documented scale path if a
  * sheet ever outgrows driver memory, which the API's own limits prevent).
  */
object GoogleSheets {

  /** The slice of the Sheets API v4 the extractor needs. */
  trait SheetsApi {
    /** values().get on an A1 range → rows of cell strings. */
    def getValues(spreadsheetId: String, range: String): Seq[Seq[String]]
    /** Drive files().get modifiedTime (ISO) — drives I3 skip. */
    def modifiedTime(spreadsheetId: String): String
    /** values().append — the W8 target direction. */
    def append(spreadsheetId: String, range: String, rows: Seq[Seq[String]]): Unit = ()
  }

  /** google_sheets_extractor.py:257-289: first row = header when
    * has_header, else synthesized column_1..column_N; ragged rows padded
    * with nulls; every cell lands as string then null-markers applied.
    */
  /** Like [[read]] but None when the sheet has no values at all — lets
    * callers drop empty sheets from unions instead of inventing a schema.
    */
  def readOpt(spark: SparkSession, api: SheetsApi, spreadsheetId: String,
      range: String, hasHeader: Boolean = true): Option[DataFrame] = {
    val values = api.getValues(spreadsheetId, range)
    if (values.isEmpty) None
    else Some(fromValues(spark, values, hasHeader))
  }

  def read(spark: SparkSession, api: SheetsApi, spreadsheetId: String,
      range: String, hasHeader: Boolean = true,
      emptySchema: Option[StructType] = None): DataFrame = {
    val values = api.getValues(spreadsheetId, range)
    if (values.isEmpty)
      return spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        emptySchema.getOrElse(StructType(Seq(StructField("column_1", StringType)))))
    fromValues(spark, values, hasHeader)
  }

  private def fromValues(spark: SparkSession, values: Seq[Seq[String]],
      hasHeader: Boolean): DataFrame = {
    val (header, rows) =
      if (hasHeader) (values.head.map(_.trim), values.tail)
      else ((1 to values.map(_.length).max).map(i => s"column_$i"), values)
    val width = header.length
    val padded = rows.map { r =>
      val cells = r.take(width).map(c => c: Any) ++
        Seq.fill(math.max(0, width - r.length))(null: Any)
      org.apache.spark.sql.Row(cells: _*)
    }
    val schema = StructType(header.map(h => StructField(h, StringType, nullable = true)))
    val df = spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(padded).asJava, schema)
    df.select(df.columns.map(c => Coercion.nullifyMarkers(col(c)).as(c)): _*)
  }

  /** W8 target: driver-side append (small data by construction —
    * registry caps sheets use; mirrors iceberg_to_google_sheets.yaml).
    */
  def write(df: DataFrame, api: SheetsApi, spreadsheetId: String, range: String,
      includeHeader: Boolean = true): Long = {
    val cols = df.columns.toSeq
    val rows = df.collect().map(r =>
      cols.indices.map(i => if (r.isNullAt(i)) "" else String.valueOf(r.get(i)))).toSeq
    val all = if (includeHeader) cols +: rows else rows
    api.append(spreadsheetId, range, all)
    rows.length.toLong
  }
}

object GDriveCsv {

  final case class DriveFile(id: String, name: String, modifiedTime: String)

  /** The slice of the Drive API v3 the extractor needs. */
  trait DriveApi {
    /** files().list with mimeType='text/csv' + folder/query filters. */
    def listCsvFiles(folderId: Option[String], query: Option[String]): Seq[DriveFile]
    /** files().get_media download → local staging path. */
    def download(fileId: String, dest: java.nio.file.Path): Unit
  }

  /** gdrive_csv_extractor.py:158-377: list → per-file modified-time skip
    * (I2, via the shared state store) → download to a staging dir → the
    * S1 CSV scan. Returns (frame, processedFileIds) so the caller can
    * update state after a successful run.
    */
  def read(spark: SparkSession, api: DriveApi, contract: graft.core.DataContract,
      folderId: Option[String] = None, query: Option[String] = None,
      state: Option[graft.state.StateStore] = None,
      opts: CsvOptions = CsvOptions()): (DataFrame, Seq[DriveFile]) = {
    val files = api.listCsvFiles(folderId, query)
    // one state read for the whole listing (per-file shouldSkipFile would
    // re-fetch the state doc per file)
    val todo = state match {
      case Some(st) =>
        val todoIds = st.filterUnmodifiedFileEntries(
          files.map(f => f.id -> f.modifiedTime))._1.map(_._1).toSet
        files.filter(f => todoIds.contains(f.id))
      case None => files
    }
    if (todo.isEmpty) {
      (spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        contract.rawStructType), Nil)
    } else {
      val staging = java.nio.file.Files.createTempDirectory("graft-gdrive-")
      val paths = todo.map { f =>
        // prefix with the Drive id: Drive folders allow duplicate names,
        // and same-named files must not overwrite each other in staging
        val dest = staging.resolve(s"${f.id}_${f.name}")
        api.download(f.id, dest)
        dest.toString
      }
      (CsvSource.read(spark, paths, contract, opts), todo)
    }
  }
}
