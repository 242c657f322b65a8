package graft

import graft.config.AssetLoader
import graft.core.{Validation, ValidationMode}
import org.apache.spark.sql.GraftExpressionBridge
import org.apache.spark.sql.functions._

/** Pin: every WholeStageCodegen span of the composed ingest+curation
  * plan COMPILES. Spark demotes a span whose generated code fails
  * Janino (one method past the JVM's 64 KB limit) to interpreted
  * execution with only a log line — a silent multi-× slowdown of the
  * hottest scan stage at 100 TB. The failure mode this guards: alias
  * substitution inlining the extract→normalize regex chain into every
  * downstream quality predicate (~7 copies in one generated method)
  * when the curation barrier is missing.
  */
class CodegenCompileSpec extends SparkSpec {

  private def contract = AssetLoader.fromMap(Map(
    "asset" -> Map(
      "name" -> "docs", "version" -> "1.0",
      "schema" -> Seq(
        Map("name" -> "doc_id", "type" -> "integer", "required" -> true),
        Map("name" -> "text", "type" -> "string", "required" -> true),
        Map("name" -> "lang", "type" -> "string", "required" -> false),
        Map("name" -> "source", "type" -> "string", "required" -> false),
        Map("name" -> "n_chars", "type" -> "integer", "required" -> false)))))

  test("composed validate→curate plan: every codegen span compiles") {
    // AQE hides spans behind AdaptiveSparkPlanExec until runtime; the
    // initial-plan spans are what this pin must check
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val raw = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select(col("doc_id").cast("string"), col("text"),
          col("lang"), col("source"), col("n_chars").cast("string"))
      val validated = Validation.transform(raw, contract, ValidationMode.Strict)
      val curated = JobRunner.applyCuration(validated, Map("curation" -> Map(
        "id_field" -> "doc_id", "text_field" -> "text",
        "extract" -> "html", "normalize" -> "nfc",
        "quality_filter" -> Seq("gopher", "entropy"),
        "dedupe" -> "near",
        "sample" -> "bernoulli", "sample_fraction" -> "0.8")))
      val spans = GraftExpressionBridge.compileSpans(curated)
      spans should not be empty
      val bad = spans.filter(_._3.isDefined)
      withClue(bad.map(b => s"${b._1} (${b._2} chars): ${b._3.get}")
          .mkString("\n")) {
        bad shouldBe empty
      }
      // and no span's source is anywhere near the pathological size the
      // inlined-chain bug produced (382 KB for one Project)
      all(spans.map(_._2)) should be < 200000
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
