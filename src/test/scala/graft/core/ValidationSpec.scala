package graft.core

import graft.SparkSpec
import org.apache.spark.sql.Observation
import org.apache.spark.sql.types._

/** T1–T5 semantics against the reference's validate_record
  * (schema_validator.py:58-143) and warn-mode union writer
  * (parquet_writer.py:200-285).
  */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private val contract = DataContract(
    name = "spec",
    fields = Seq(
      ContractField("id", "integer", required = true),
      ContractField("name", "string", required = true),
      ContractField("score", "double"),
      ContractField("active", "boolean")))

  // raw all-string frame like a CSV landing: one clean row, one null-required,
  // one type_mismatch on an optional field, one mismatch on required-adjacent
  private def raw = Seq(
    ("1", "alice", "9.5", "true"),      // valid
    (null, "bob", "1.0", "false"),      // missing required id
    ("3", "carol", "bad", "yes"),       // type_mismatch on optional score
    ("4", null, "2.0", "2")             // missing name + bad boolean
  ).toDF("id", "name", "score", "active")

  test("strict drops records with ANY error, incl. optional-field mismatch") {
    val res = Validation.validate(raw, contract, ValidationMode.Strict, "v1")
    val rows = res.data.collect()
    rows.map(_.getLong(0)) shouldBe Array(1L)
    res.data.columns shouldBe Array("id", "name", "score", "active")
    res.data.schema("id").dataType shouldBe LongType
    res.data.schema("score").dataType shouldBe DoubleType
  }

  test("warn keeps all records; failed coercion becomes typed NULL") {
    val res = Validation.validate(raw, contract, ValidationMode.Warn, "v2")
    val rows = res.data.orderBy("id").collect()
    rows.length shouldBe 4
    val carol = rows.find(r => !r.isNullAt(1) && r.getString(1) == "carol").get
    carol.isNullAt(2) shouldBe true // "bad" double -> typed NULL (documented divergence)
  }

  test("warn appends extra columns as strings in one select, sorted") {
    val withExtras = raw
      .withColumn("zcol", org.apache.spark.sql.functions.lit(7))
      .withColumn("acol", org.apache.spark.sql.functions.lit(true))
    val res = Validation.validate(withExtras, contract, ValidationMode.Warn, "v3")
    res.data.columns shouldBe Array("id", "name", "score", "active", "acol", "zcol")
    res.data.schema("acol").dataType shouldBe StringType
    res.data.schema("zcol").dataType shouldBe StringType
    res.data.count() shouldBe 4
  }

  test("observe() metrics count errors by (type, field) in a single pass") {
    val obs = Observation("v4")
    val metrics = Validation.errorMetrics(raw, contract)
    val observed = raw.observe(obs, metrics.head, metrics.tail: _*)
    observed.count() shouldBe 4
    val m = obs.get.map { case (k, v) => k -> v.asInstanceOf[Long] }
    m("records") shouldBe 4L
    m("missing_required:id") shouldBe 1L
    m("missing_required:name") shouldBe 1L
    m("type_mismatch:score") shouldBe 1L
    m("type_mismatch:active") shouldBe 1L
  }

  test("missing declared column materializes as typed NULL") {
    val df = Seq(("1", "x")).toDF("id", "name")
    val out = Validation.coerceToContract(df, contract)
    out.columns shouldBe Array("id", "name", "score", "active")
    out.collect()(0).isNullAt(2) shouldBe true
  }

  test("exit codes: warn+errors beats zero-valid (cli.py ordering)") {
    import ValidationMode._
    val errs = Map("records" -> 4L, "type_mismatch:score" -> 1L)
    val clean = Map("records" -> 4L, "type_mismatch:score" -> 0L)
    Validation.exitCode(Warn, errs, 0L) shouldBe ExitCodes.Partial
    Validation.exitCode(Warn, errs, 4L) shouldBe ExitCodes.Partial
    Validation.exitCode(Strict, errs, 3L) shouldBe ExitCodes.Failure
    Validation.exitCode(Strict, clean, 0L) shouldBe ExitCodes.Failure
    Validation.exitCode(Strict, clean, 4L) shouldBe ExitCodes.Success
    Validation.exitCode(Warn, clean, 4L) shouldBe ExitCodes.Success
  }
}
