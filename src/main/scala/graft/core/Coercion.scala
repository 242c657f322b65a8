package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Type-coercion operator (SURVEY.md §2.2 T1).
  *
  * Re-expresses the reference's per-record Python coercion
  * (src/dativo_ingest/schema_validator.py:174-263) as codegen-friendly
  * Spark Column expressions — no UDFs, so every cast stays inside
  * whole-stage codegen and is vectorizable at 100 TB. ANSI-safe: all
  * fallible conversions go through `try_cast`/`try_to_timestamp`, so the
  * library behaves identically with `spark.sql.ansi.enabled` on or off.
  *
  * The reference dispatches on the *runtime Python type* of each value
  * (isinstance checks), so the coercion is source-type aware: a string
  * `"12.5"` fails integer coercion (`int("12.5")` raises) while a float
  * value `12.5` truncates to `12` (`int(12.5)`). We mirror that by
  * dispatching on the column's Spark DataType:
  *
  *  - integer (schema_validator.py:197-209): int passes; string parsed
  *    strictly as an integer literal (`int(s)` — whitespace stripped, no
  *    fraction, no exponent); float truncated toward zero; bool → 0/1
  *    (Python bool is an int); anything else → error.
  *  - float (:212-220): int/float/bool widen; strings via `float(s)`
  *    (whitespace stripped, fraction/exponent ok); else error.
  *  - boolean (:223-235): bool passes; string must be one of the 8 tokens
  *    "true/1/yes/on/false/0/no/off" case-insensitively, NOT trimmed
  *    (Python does `value.lower()` with no strip); numeric value →
  *    `bool(v)` i.e. v != 0; else error.
  *  - timestamp/datetime/date (:238-260): datetime passes; string must
  *    match one of the 7 strptime formats below, NOT trimmed; else error.
  *  - string (:193-195): `str(value)` — never fails.
  *  - unknown type (:262-263): passthrough.
  *
  * A coercion failure yields NULL in the coerced output (the caller
  * counts those as `type_mismatch` errors, see Validation).
  */
object Coercion {

  /** Boolean token sets (schema_validator.py:223-235). */
  val TrueTokens: Seq[String] = Seq("true", "1", "yes", "on")
  val FalseTokens: Seq[String] = Seq("false", "0", "no", "off")

  /** The reference's 7 accepted strptime formats
    * (schema_validator.py:245-253) translated to Spark datetime patterns.
    * Spark parses `SSSSSS` fractions greedily (1–6 digits), matching
    * Python's `%f`. `%z` accepts both `+01:00` and `+0100` (and `Z`), so
    * it maps to two Spark patterns (XXX with colon, xx without).
    */
  val TimestampFormats: Seq[String] = Seq(
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss'Z'",
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd",
    "yyyy-MM-dd'T'HH:mm:ssXXX",
    "yyyy-MM-dd'T'HH:mm:ssxx"
  )

  /** Shape guard per format, aligned with [[TimestampFormats]]: a NECESSARY
    * condition for the format to parse (never accepts less than the
    * parser), checked with a codegen'd `rlike` before `try_to_timestamp`.
    * Why: `try_to_timestamp` reports failure via an internally-caught Java
    * exception (~tens of µs each); an unguarded 8-format coalesce pays up
    * to 8 exceptions per non-matching row, which made timestamp coercion
    * ~50× slower than the scan it sits on. The guard makes the non-match
    * path a regex reject. Semantics unchanged: residual in-shape failures
    * (month 13) still fall through try_to_timestamp to NULL.
    */
  private[graft] val TimestampFormatGuards: Seq[String] = Seq(
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$",
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{1,6}$",
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}Z$",
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}\\.\\d{1,6}Z$",
    "^\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}$",
    "^\\d{4}-\\d{2}-\\d{2}$",
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}(Z|[+-]\\d{2}:\\d{2})$",
    "^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}[+-]\\d{4}$"
  )

  /** CSV null markers (csv_extractor.py: nulls = "", NULL, null, None). */
  val NullMarkers: Seq[String] = Seq("", "NULL", "null", "None")

  /** Replace the reference's CSV null markers with real NULLs. */
  def nullifyMarkers(c: Column): Column =
    when(c.isin(NullMarkers: _*), lit(null).cast(StringType)).otherwise(c)

  /** Python `int(str)`: optional sign, digits only, surrounding whitespace
    * tolerated. (We ignore Python's underscore-separator quirk "1_0".)
    */
  private val IntLiteral = "^[+-]?\\d+$"

  private def isStringy(dt: DataType): Boolean = dt.isInstanceOf[StringType]
  private def isNumeric(dt: DataType): Boolean = dt.isInstanceOf[NumericType]
  private def nullOf(dt: DataType): Column = lit(null).cast(dt)

  def toInteger(c: Column, src: DataType): Column = src match {
    case ByteType | ShortType | IntegerType | LongType => c.cast(LongType)
    case BooleanType => c.cast(LongType) // Python: isinstance(True, int)
    // try_cast: truncates toward zero like int(float); NULL (not an ANSI
    // error) on overflow/NaN/Infinity, which the reference only hits at
    // parquet-write time anyway.
    case _: NumericType  => c.try_cast(LongType)
    case s if isStringy(s) =>
      val t = trim(c)
      when(t.rlike(IntLiteral), t.try_cast(LongType)).otherwise(nullOf(LongType))
    case _ => nullOf(LongType) // TypeError in the reference
  }

  def toDouble(c: Column, src: DataType): Column = src match {
    case _: NumericType | BooleanType => c.cast(DoubleType)
    case s if isStringy(s)            => trim(c).try_cast(DoubleType)
    case _                            => nullOf(DoubleType)
  }

  def toBoolean(c: Column, src: DataType): Column = src match {
    case BooleanType => c
    case _: NumericType =>
      c.cast(DoubleType) =!= 0.0 // bool(v) (schema_validator.py:231-233)
    case s if isStringy(s) =>
      val t = lower(c) // deliberately NOT trimmed — Python does value.lower()
      when(t.isin(TrueTokens: _*), lit(true))
        .when(t.isin(FalseTokens: _*), lit(false))
        .otherwise(nullOf(BooleanType))
    case _ => nullOf(BooleanType)
  }

  def toTimestampCol(c: Column, src: DataType): Column = src match {
    case TimestampType => c
    case DateType      => c.cast(TimestampType) // datetime.combine(d, time.min)
    case s if isStringy(s) =>
      // CASE dispatch over the exact format list — NOT Spark's flexible
      // cast, which accepts a superset the reference rejects. The shape
      // index comes from ONE TimestampShape kernel scan (the previous
      // guarded coalesce ran up to 8 rlike evaluations per value; the
      // kernel is the same first-match guard order as one char scan,
      // spec-pinned against the TimestampFormatGuards regexes), and the
      // CASE runs only the matching branch's parse. Residual in-shape
      // failures (month 13) still fall through try_to_timestamp to NULL.
      val idx = graft.functions.TimestampShape(c)
      TimestampFormats.zipWithIndex.map { case (f, i) =>
        when(idx === lit(i), try_to_timestamp(c, lit(f)))
      }.reduceRight(_ otherwise _) // nested CASE; no-match falls to null
    case _ => nullOf(TimestampType)
  }

  def toDateCol(c: Column, src: DataType): Column =
    // Same parser as timestamp (schema_validator.py:238). Documented
    // divergence: the reference's "date" keeps the full datetime (its
    // parquet writer widens date→timestamp[us]); Spark-native DateType
    // truncates the time-of-day instead.
    toTimestampCol(c, src).cast(DateType)

  /** Coerce a column of Spark type `src` to an ODCS logical type.
    * Unknown ODCS types pass through (schema_validator.py:262-263); they
    * land as string downstream (parquet_writer.py:69-71).
    */
  def coerce(c: Column, odcsType: String, src: DataType): Column =
    odcsType.trim.toLowerCase match {
      case "string"                   => c.cast(StringType) // str() never fails
      case "integer" | "int" | "long" => toInteger(c, src)
      case "float" | "double"         => toDouble(c, src)
      case "boolean" | "bool"         => toBoolean(c, src)
      case "timestamp" | "datetime"   => toTimestampCol(c, src)
      case "date"                     => toDateCol(c, src)
      case _                          => c.cast(StringType)
    }

  /** True when coercing `c` (of Spark type `src`) to `odcsType` would
    * raise in the reference (non-null input, null coerced output) — the
    * `type_mismatch` predicate used for error counting and strict-mode
    * record invalidation.
    */
  def coercionError(c: Column, odcsType: String, src: DataType): Column =
    odcsType.trim.toLowerCase match {
      case "string" => lit(false) // str(value) never fails
      case t @ ("integer" | "int" | "long" | "float" | "double" | "boolean" |
          "bool" | "timestamp" | "datetime" | "date") =>
        c.isNotNull && coerce(c, t, src).isNull
      case _ => lit(false) // unknown type: passthrough never fails
    }
}
