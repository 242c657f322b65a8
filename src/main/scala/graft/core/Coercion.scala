package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-coercion operator (SURVEY.md §2.2 T1).
  *
  * Re-expresses the reference's per-record Python coercion
  * (src/dativo_ingest/schema_validator.py:174-263) as codegen-friendly
  * Spark Column expressions — no UDFs, so every cast stays inside
  * whole-stage codegen and is vectorizable at 100 TB.
  *
  * Semantics preserved exactly (golden-tested in CoercionSpec):
  *  - integer: ints pass, numeric strings parsed, floats truncated toward
  *    zero (schema_validator.py:197-209; Python `int(float)` truncates and
  *    Spark's double→long cast matches).
  *  - float: numerics widen, strings parsed (:212-220).
  *  - boolean: "true/1/yes/on" → T, "false/0/no/off" → F case-insensitive;
  *    numeric → (v != 0) (:223-235).
  *  - timestamp/datetime/date: the reference accepts 7 strptime formats
  *    (:245-253): ISO with 'T' or ' ', optional .%f fraction, optional 'Z'
  *    or %z offset, bare date. Spark's string→timestamp cast accepts all of
  *    them (flexible ISO parser), so one cast covers the whole list.
  *  - unknown type: passthrough as string (:262-263).
  *
  * A coercion failure yields NULL (the caller counts those as
  * `type_mismatch` errors, see Validation).
  */
object Coercion {

  /** Boolean token sets (schema_validator.py:223-235). */
  val TrueTokens: Seq[String] = Seq("true", "1", "yes", "on")
  val FalseTokens: Seq[String] = Seq("false", "0", "no", "off")

  /** The reference's accepted timestamp formats
    * (schema_validator.py:245-253), kept for documentation/tests; the
    * Spark implementation relies on the built-in flexible cast that
    * accepts a superset of exactly these shapes.
    */
  val TimestampFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy-MM-dd'T'HH:mm:ssXXX"
  )

  /** CSV null markers (csv_extractor.py: nulls = "", NULL, null, None). */
  val NullMarkers: Seq[String] = Seq("", "NULL", "null", "None")

  /** Replace the reference's CSV null markers with real NULLs. */
  def nullifyMarkers(c: Column): Column =
    when(c.isin(NullMarkers: _*), lit(null).cast(StringType)).otherwise(c)

  def toInteger(c: Column): Column = {
    val t = trim(c.cast(StringType))
    when(t.rlike("^[+-]?\\d+$"), t.cast(LongType))
      .otherwise(t.cast(DoubleType).cast(LongType)) // truncates toward zero
  }

  def toDouble(c: Column): Column = trim(c.cast(StringType)).cast(DoubleType)

  def toBoolean(c: Column): Column = {
    val t = lower(trim(c.cast(StringType)))
    when(t.isin(TrueTokens: _*), lit(true))
      .when(t.isin(FalseTokens: _*), lit(false))
      // numeric → value != 0 (schema_validator.py:231-233)
      .when(t.rlike("^[+-]?\\d+(\\.\\d+)?$"), t.cast(DoubleType) =!= 0.0)
      .otherwise(lit(null).cast(BooleanType))
  }

  def toTimestampCol(c: Column): Column =
    trim(c.cast(StringType)).cast(TimestampType)

  def toDateCol(c: Column): Column =
    // Same parser as timestamp (schema_validator.py:238), narrowed to date.
    toTimestampCol(c).cast(DateType)

  /** Coerce a column to an ODCS logical type. Unknown types pass through
    * as string (schema_validator.py:262-263, parquet_writer.py:69-71).
    */
  def coerce(c: Column, odcsType: String): Column =
    odcsType.trim.toLowerCase match {
      case "string"                   => c.cast(StringType)
      case "integer" | "int" | "long" => toInteger(c)
      case "float" | "double"         => toDouble(c)
      case "boolean" | "bool"         => toBoolean(c)
      case "timestamp" | "datetime"   => toTimestampCol(c)
      case "date"                     => toDateCol(c)
      case _                          => c.cast(StringType)
    }

  /** True when coercing `c` to `odcsType` would fail (non-null input became
    * null output) — the `type_mismatch` predicate used for error counting.
    */
  def coercionError(c: Column, odcsType: String): Column =
    c.isNotNull && coerce(c, odcsType).isNull
}
