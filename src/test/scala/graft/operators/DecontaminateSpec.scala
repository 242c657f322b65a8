package graft.operators

import graft.SparkSpec

/** Decontamination: hand-checked hit counts, short-doc handling, the
  * drop variant, and the broadcast plan shape (the corpus must never be
  * the shuffled side of the shingle join).
  */
class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  // bench doc 100 has shingles {"a b c", "b c d"}; bench doc 101 is too
  // short to shingle at n=3.
  private def bench = Seq(
    (100L, "a b c d"),
    (101L, "x y")
  ).toDF("doc_id", "text")

  private def corpus = Seq(
    (1L, "a b c q r s"),     // shares "a b c" -> 1 hit
    (2L, "z a b c d w"),     // shares "a b c" and "b c d" -> 2 hits
    (3L, "p q r s t"),       // no overlap
    (4L, "x y")              // too short to shingle -> 0 hits, still reported
  ).toDF("doc_id", "text")

  test("contaminationReport: distinct shared-shingle counts, all rows kept") {
    val out = Decontaminate.contaminationReport(corpus, bench, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    out shouldBe Map(
      1L -> ((1L, true)),
      2L -> ((2L, true)),
      3L -> ((0L, false)),
      4L -> ((0L, false)))
  }

  test("benchmarkLeakageReport: per-example corpus-doc and shingle counts") {
    val out = Decontaminate.benchmarkLeakageReport(corpus, bench, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    // bench 100: corpus docs 1 and 2 share with it (2 docs); its leaked
    // shingles are {"a b c", "b c d"} (2). bench 101: too short → clean.
    out shouldBe Map(
      100L -> ((2L, 2L, true)),
      101L -> ((0L, 0L, false)))
    // plan: benchmark side broadcast, corpus never shuffled pre-join
    val p = Decontaminate.benchmarkLeakageReport(corpus, bench, "doc_id", "text")
      .queryExecution.sparkPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("dropContaminated keeps only clean docs; maxHits loosens the cut") {
    Decontaminate.dropContaminated(corpus, bench, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(3L, 4L)
    Decontaminate.dropContaminated(corpus, bench, "doc_id", "text", maxHits = 1L)
      .select("doc_id").collect().map(_.getLong(0)).toSet shouldBe Set(1L, 3L, 4L)
  }

  test("plan: benchmark shingles are the broadcast build side") {
    val p = Decontaminate.contaminationReport(corpus, bench, "doc_id", "text")
      .queryExecution.sparkPlan.toString // initial plan: the hint itself, pre-AQE
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }

  test("embedding decontamination drops benchmark-similar vectors only") {
    import spark.implicits._
    val bmk = Seq((100L, Array(1.0f, 0.0f, 0.0f, 0.0f))).toDF("id", "v")
    val corp = Seq(
      (1L, Array(0.99f, 0.05f, 0.0f, 0.0f)),  // ≈ benchmark → dropped
      (2L, Array(0.0f, 1.0f, 0.0f, 0.0f)),    // orthogonal → kept
      (3L, Array(1.0f, 0.0f, 0.0f, 0.0f)),    // identical → dropped
      (4L, Array(-1.0f, 0.0f, 0.0f, 0.0f))    // opposite → kept
    ).toDF("id", "v")
    val out = Decontaminate.dropNearBenchmarkEmbeddings(
      corp, bmk, "id", "v", threshold = 0.9, planes = 2, tables = 4, dim = 4)
    out.select("id").as[Long].collect().sorted shouldBe Array(2L, 4L)
    // plan: benchmark side broadcast, no cartesian
    val p = out.queryExecution.sparkPlan.toString
    p should include("BroadcastHashJoin")
    p should not include "CartesianProduct"
  }
}
