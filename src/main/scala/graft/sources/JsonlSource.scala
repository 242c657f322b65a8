package graft.sources

import graft.core.DataContract
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL (newline-delimited JSON) source — beyond-reference.
  *
  * The reference has no JSONL connector (its file formats are CSV and
  * parquet, src/dativo_ingest/connectors/csv_extractor.py + cli.py), but
  * JSONL is the dominant interchange format for LLM training corpora, so
  * an engine aimed at that workload needs a first-class scan. Design
  * mirrors [[CsvSource]] deliberately: every contract field lands as a
  * STRING (JSON numbers/booleans arrive as their literal text, nested
  * objects/arrays as their raw JSON substring), and typing is the
  * separate T1 coercion pass — one validation pipeline for every file
  * source.
  *
  * Implementation: a line-splittable TEXT scan + `from_json`, not
  * `spark.read.json`. Same Jackson parse, but two wins:
  *  - the native JSON source forbids any plan whose referenced columns
  *    are only the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
  *    which an innocent `readClean(...).count()` becomes after column
  *    pruning. With from_json the corrupt field is an ordinary struct
  *    member, no restriction.
  *  - schema is always supplied, never inferred: inference is a full
  *    extra pass before the real scan (2× the read at 100 TB), and a
  *    supplied schema pins pruning — unreferenced JSON keys are parsed
  *    past, never materialized.
  *
  * Scale notes: one JSON document per line is the ONLY splittable JSON
  * shape (a multiline JSON file is a single task no matter its size);
  * 100 TB of JSONL splits into line-aligned tasks for free. Corpora are
  * UTF-8 JSONL by convention; the text scan reads UTF-8.
  *
  * Corrupt lines are CAPTURED, not dropped: PERMISSIVE parse lands the
  * raw line in `corruptCol` with every contract field null, so the
  * T2/T4 validation machinery can count, sample, and gate on them like
  * any other invalid record. DROPMALFORMED would silently change row
  * counts — the one thing an ingest gate must never do. Whitespace-only
  * lines are skipped (the native reader's behavior), not corrupt.
  */
final case class JsonlOptions(
    /** Column that receives the raw text of unparseable lines. */
    corruptCol: String = "_corrupt_record"
)

object JsonlSource {

  /** All-string scan of one-JSON-object-per-line files against a
    * contract. Output columns: the contract fields (StringType) plus
    * `opts.corruptCol` (null for clean rows, the raw line for corrupt
    * ones). JSON `null` is a real null — JSONL has typed nulls, so the
    * CSV null-marker list does not apply.
    */
  /** The line→row parse as a pure Column transform over a `value`
    * column — ONE code path shared by the batch scan and the streaming
    * twin ([[graft.streaming.StreamingIngest.readJsonlStream]]), so the
    * two can never drift.
    */
  def parseLines(lines: DataFrame, contract: DataContract,
      opts: JsonlOptions = JsonlOptions()): DataFrame = {
    val schema = StructType(
      contract.fields.map(f => StructField(f.name, StringType, nullable = true)) :+
        StructField(opts.corruptCol, StringType, nullable = true))
    lines
      .filter(trim(col("value")) =!= "")
      .select(from_json(col("value"), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> opts.corruptCol)).as("__j"))
      .select(col("__j.*"))
  }

  def read(
      spark: SparkSession,
      paths: Seq[String],
      contract: DataContract,
      opts: JsonlOptions = JsonlOptions()
  ): DataFrame =
    parseLines(spark.read.text(paths: _*), contract, opts)

  /** The clean rows only, corrupt column dropped — the shape T1 coercion
    * takes when the job's error policy already consumed the corrupt rows.
    */
  def readClean(
      spark: SparkSession,
      paths: Seq[String],
      contract: DataContract,
      opts: JsonlOptions = JsonlOptions()
  ): DataFrame = {
    val df = read(spark, paths, contract, opts)
    df.filter(col(opts.corruptCol).isNull).drop(opts.corruptCol)
  }
}
