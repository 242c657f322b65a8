package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exit-code contract (reference: src/dativo_ingest/cli.py:1123-1129):
  * 0 = success, 1 = partial (warn-mode errors), 2 = failure / no valid rows.
  */
object ExitCodes {
  val Success = 0
  val Partial = 1
  val Failure = 2
}

/** Result of validating one batch DataFrame. `data` is the validated
  * (possibly filtered/projected) frame; the error metrics are collected on
  * the SAME pass via `observe()` — no second scan of the source
  * (the reference counts errors record-by-record in the same loop,
  * schema_validator.py:145-172; a second `.filter().count()` action would
  * rescan 100 TB, so we refuse to do that).
  */
final case class ValidationResult(
    data: DataFrame,
    observationName: String,
    requiredFields: Seq[String]
)

/** Validation operators T1–T5 (SURVEY.md §2.2), re-expressed as declarative
  * DataFrame transforms so Catalyst can pipeline scan→coerce→filter→write
  * in one whole-stage-codegen pass.
  *
  * Reference semantics:
  *  - required-field check: src/dativo_ingest/schema_validator.py:58-143
  *  - strict drops invalid records; job fails if any dropped
  *    (cli.py:971-983)
  *  - warn keeps records untouched, counts errors (:117-127)
  *  - projection: strict writes only declared fields; warn unions extra
  *    observed columns typed as string (parquet_writer.py:200-353)
  *  - error summary: counts by error type and field
  *    (schema_validator.py:265-302)
  */
object Validation {

  /** Coerce every contract field (T1) from a raw (typically all-string)
    * frame. Missing declared columns materialize as typed NULLs — the
    * reference treats an absent key like a null value
    * (schema_validator.py:77-86).
    */
  def coerceToContract(raw: DataFrame, contract: DataContract): DataFrame = {
    val present = raw.columns.toSet
    val cols = contract.fields.map { f =>
      if (present.contains(f.name)) Coercion.coerce(col(f.name), f.odcsType).as(f.name)
      else lit(null).cast(f.sparkType).as(f.name)
    }
    raw.select(cols: _*)
  }

  /** Predicate: every required field present and non-null (T2). */
  def requiredPredicate(contract: DataContract, df: DataFrame): Column = {
    val present = df.columns.toSet
    val checks = contract.requiredFields.map { f =>
      if (present.contains(f.name)) col(f.name).isNotNull else lit(false)
    }
    if (checks.isEmpty) lit(true) else checks.reduce(_ && _)
  }

  /** Strict-mode projection: only declared schema fields, declared order
    * (parquet_writer.py:287-353).
    */
  def projectStrict(df: DataFrame, contract: DataContract): DataFrame = {
    val present = df.columns.toSet
    df.select(contract.fieldNames.filter(present.contains).map(col): _*)
  }

  /** Warn-mode projection: declared fields + any extra observed columns
    * appended as strings (parquet_writer.py:200-285).
    */
  def projectWarn(df: DataFrame, contract: DataContract): DataFrame = {
    val declared = contract.fieldNames
    val extras = df.columns.filterNot(declared.contains).sorted
    df.select(declared.filter(df.columns.contains).map(col) ++
      extras.map(c => col(c).cast(StringType).as(c)): _*)
  }

  /** Error-summary aggregate expressions (T4): one count per
    * (error_type, field), computed in the same job via observe().
    */
  private def errorMetrics(raw: DataFrame, contract: DataContract): Seq[Column] = {
    val present = raw.columns.toSet
    val missing = contract.requiredFields.map { f =>
      val cond =
        if (present.contains(f.name)) col(f.name).isNull else lit(true)
      sum(when(cond, 1L).otherwise(0L)).as(s"missing_required:${f.name}")
    }
    val mismatch = contract.fields.filter(f => present.contains(f.name)).flatMap { f =>
      if (f.odcsType.trim.toLowerCase == "string") None
      else Some(sum(when(Coercion.coercionError(col(f.name), f.odcsType), 1L).otherwise(0L))
        .as(s"type_mismatch:${f.name}"))
    }
    (count(lit(1)).as("records") +: (missing ++ mismatch))
  }

  /** Full T1–T3 validate+coerce pass over a raw frame.
    *
    * Strict: coerce → drop records with null required fields → declared
    * projection. Warn: coerce, keep everything, declared ++ extras
    * projection. Error counts ride along via observe() on the raw frame so
    * the source is scanned exactly once.
    */
  def validate(
      raw: DataFrame,
      contract: DataContract,
      mode: ValidationMode,
      observationName: String = "validation"
  ): ValidationResult = {
    val observed = raw.observe(observationName, errorMetrics(raw, contract).head,
      errorMetrics(raw, contract).tail: _*)
    val coerced = coerceToContract(observed, contract)
    val out = mode match {
      case ValidationMode.Strict =>
        projectStrict(coerced.filter(requiredPredicate(contract, coerced)), contract)
      case ValidationMode.Warn =>
        // warn keeps the coerced values; extra raw columns appended as string
        val extras = raw.columns.filterNot(contract.fieldNames.contains).sorted
        val withExtras = extras.foldLeft(coerced) { (d, c) =>
          d.withColumn(c, observed(c).cast(StringType))
        }
        withExtras
    }
    ValidationResult(out, observationName, contract.requiredFields.map(_.name))
  }

  /** Map observed metrics → exit code per the reference contract
    * (cli.py:960-983, :1123-1129): strict + any error ⇒ 2; zero valid
    * records ⇒ 2; warn + any error ⇒ 1; else 0.
    */
  def exitCode(
      mode: ValidationMode,
      metrics: Map[String, Long],
      validRecords: Long
  ): Int = {
    val errors = metrics.collect {
      case (k, v) if k != "records" && v > 0 => v
    }.sum
    if (validRecords == 0L) ExitCodes.Failure
    else if (errors > 0L) mode match {
      case ValidationMode.Strict => ExitCodes.Failure
      case ValidationMode.Warn   => ExitCodes.Partial
    }
    else ExitCodes.Success
  }
}
