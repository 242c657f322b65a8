package graft.core

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Golden table mirroring the reference's coercion semantics cell-by-cell
  * (src/dativo_ingest/schema_validator.py:174-263), including the reject
  * cases the reference raises on ("12.5"→error, "2"→error for boolean,
  * "2021"→error for timestamp).
  */
class CoercionSpec extends SparkSpec {
  import spark.implicits._

  private def coerceOne[T](value: Any, src: DataType, odcsType: String): Any = {
    val df = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(value)),
      StructType(Seq(StructField("v", src, nullable = true))))
    df.select(Coercion.coerce(col("v"), odcsType, src).as("out"))
      .collect()(0).get(0)
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  // ---- integer ----------------------------------------------------------
  val intFromString = Seq(
    "12" -> 12L, " 12 " -> 12L, "+12" -> 12L, "-3" -> -3L,
    "12.5" -> null, "12.0" -> null, "abc" -> null, "1e3" -> null,
    "" -> null, "1-URGENT" -> null)
  for ((in, out) <- intFromString)
    test(s"integer from string '$in' -> $out") {
      coerceOne(in, StringType, "integer") shouldBe out
    }
  test("integer from double truncates toward zero") {
    coerceOne(12.7, DoubleType, "integer") shouldBe 12L
    coerceOne(-12.7, DoubleType, "integer") shouldBe -12L
  }
  test("integer from int/long passes") {
    coerceOne(7, IntegerType, "integer") shouldBe 7L
    coerceOne(7L, LongType, "integer") shouldBe 7L
  }
  test("integer from boolean = Python int(True)") {
    coerceOne(true, BooleanType, "integer") shouldBe 1L
  }

  // ---- float/double -----------------------------------------------------
  test("double from string parses like float()") {
    coerceOne("12.5", StringType, "double") shouldBe 12.5
    coerceOne(" 12.5 ", StringType, "double") shouldBe 12.5
    coerceOne("1e3", StringType, "double") shouldBe 1000.0
    coerceOne("-.5", StringType, "double") shouldBe -0.5
    Option(coerceOne("abc", StringType, "double")) shouldBe None
  }
  test("double from numerics widens") {
    coerceOne(3, IntegerType, "float") shouldBe 3.0
    coerceOne(3L, LongType, "double") shouldBe 3.0
  }

  // ---- boolean ----------------------------------------------------------
  val boolFromString = Seq(
    "true" -> true, "TRUE" -> true, "1" -> true, "yes" -> true, "on" -> true,
    "false" -> false, "0" -> false, "no" -> false, "off" -> false,
    "2" -> null, " true" -> null, "maybe" -> null, "10" -> null)
  for ((in, out) <- boolFromString)
    test(s"boolean from string '$in' -> $out") {
      coerceOne(in, StringType, "boolean") shouldBe out
    }
  test("boolean from numeric value = bool(v)") {
    coerceOne(0L, LongType, "boolean") shouldBe false
    coerceOne(2L, LongType, "boolean") shouldBe true
    coerceOne(0.5, DoubleType, "boolean") shouldBe true
    coerceOne(0.0, DoubleType, "boolean") shouldBe false
  }

  // ---- timestamp --------------------------------------------------------
  val tsAccept = Seq(
    "2021-01-01T10:30:00" -> ts("2021-01-01 10:30:00"),
    "2021-01-01T10:30:00.5" -> ts("2021-01-01 10:30:00.5"),
    "2021-01-01T10:30:00.123456" -> ts("2021-01-01 10:30:00.123456"),
    "2021-01-01T10:30:00Z" -> ts("2021-01-01 10:30:00"),
    "2021-01-01T10:30:00.5Z" -> ts("2021-01-01 10:30:00.5"),
    "2021-01-01 10:30:00" -> ts("2021-01-01 10:30:00"),
    "2021-01-01" -> ts("2021-01-01 00:00:00"),
    "2021-01-01T10:30:00+01:00" -> ts("2021-01-01 09:30:00"),
    "2021-01-01T10:30:00+0100" -> ts("2021-01-01 09:30:00"))
  for ((in, out) <- tsAccept)
    test(s"timestamp accepts '$in'") {
      coerceOne(in, StringType, "timestamp") shouldBe out
    }
  val tsReject = Seq("2021", "2021/01/01", "2021-01-01 10:30:00.5",
    " 2021-01-01", "01-01-2021", "2021-01-01T10:30")
  for (in <- tsReject)
    test(s"timestamp rejects '$in'") {
      Option(coerceOne(in, StringType, "timestamp")) shouldBe None
    }
  test("timestamp passthrough / date widening") {
    coerceOne(ts("2021-05-01 01:02:03"), TimestampType, "timestamp") shouldBe
      ts("2021-05-01 01:02:03")
    coerceOne(java.sql.Date.valueOf("2021-05-01"), DateType, "timestamp") shouldBe
      ts("2021-05-01 00:00:00")
  }
  test("date narrows to DateType") {
    coerceOne("2021-05-01T10:30:00", StringType, "date") shouldBe
      java.sql.Date.valueOf("2021-05-01")
  }

  // ---- string / unknown -------------------------------------------------
  test("string never fails") {
    coerceOne(12L, LongType, "string") shouldBe "12"
    coerceOne(true, BooleanType, "string") shouldBe "true"
  }
  test("unknown type passes through as string") {
    coerceOne("x", StringType, "geo_point") shouldBe "x"
  }

  // ---- coercionError ----------------------------------------------------
  test("coercionError flags reference reject cases only") {
    val df = Seq(("12", "12.5", "true", "2021-01-01", "2021")).toDF("a", "b", "c", "d", "e")
    val row = df.select(
      Coercion.coercionError(col("a"), "integer", StringType).as("a"),
      Coercion.coercionError(col("b"), "integer", StringType).as("b"),
      Coercion.coercionError(col("c"), "boolean", StringType).as("c"),
      Coercion.coercionError(col("d"), "timestamp", StringType).as("d"),
      Coercion.coercionError(col("e"), "timestamp", StringType).as("e")
    ).collect()(0)
    row.getBoolean(0) shouldBe false
    row.getBoolean(1) shouldBe true
    row.getBoolean(2) shouldBe false
    row.getBoolean(3) shouldBe false
    row.getBoolean(4) shouldBe true
  }

  test("nullifyMarkers maps the 4 CSV markers to NULL") {
    val df = Seq("", "NULL", "null", "None", "x").toDF("v")
    val out = df.select(Coercion.nullifyMarkers(col("v")).as("v"))
      .collect().map(_.get(0))
    out should contain theSameElementsAs Seq(null, null, null, null, "x")
  }

  test("TimestampShape kernel equals first-matching guard regex") {
    // the kernel is the dispatch half of toTimestampCol: its index must
    // agree with the original rlike guard chain on every shape, near-miss,
    // and the Java-regex trailing-newline quirk (where guard-pass +
    // parse-fail and kernel-reject are both null — asserted via the full
    // coercion below, not the raw index)
    val samples = Seq(
      "2024-01-15T10:30:00", "2024-01-15T10:30:00.5",
      "2024-01-15T10:30:00.123456", "2024-01-15T10:30:00Z",
      "2024-01-15T10:30:00.123Z", "2024-01-15 10:30:00", "2024-01-15",
      "2024-01-15T10:30:00+01:00", "2024-01-15T10:30:00-05:30",
      "2024-01-15T10:30:00+0100", "2024-13-45T99:99:99", // in-shape garbage
      "2024-1-15T10:30:00", "24-01-15", "2024/01/15", "hello",
      "2024-01-15T10:30:00.1234567", // 7 fraction digits: no shape
      "2024-01-15T10:30:00.123+01:00", // fraction+offset: no shape
      " 2024-01-15T10:30:00", "2024-01-15T10:30:00 ", ""
    )
    val guards = Coercion.TimestampFormatGuards.map(_.r)
    for (s <- samples) {
      val expected = guards.indexWhere(_.findFirstIn(s).isDefined)
      withClue(s"'$s': ") {
        graft.functions.TimestampShape.shapeIndex(
          org.apache.spark.unsafe.types.UTF8String.fromString(s)
        ) shouldBe expected
      }
    }
    // newline-quirk strings: the END RESULT must stay null on both paths
    val quirky = Seq("2024-01-15\n", "2024-01-15T10:30:00\n")
    val out = quirky.toDF("v")
      .select(Coercion.toTimestampCol(col("v"),
        org.apache.spark.sql.types.StringType).as("t"))
      .collect().map(_.get(0))
    out shouldBe Array(null, null)
  }
}
