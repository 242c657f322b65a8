package graft.operators

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val weights = Map("the" -> 0.8, "data" -> 1.2, "click" -> -2.0)

  // the exact double formula scoreDocs computes, replayed on the driver
  private def logit(sumMicros: Long, n: Long, biasMicros: Long): Double =
    sumMicros.toDouble / (n.toDouble * 1e6) + biasMicros.toDouble / 1e6

  private val docs = Seq(
    (1L, "The Data data click"), // (.8 + 1.2 + 1.2 − 2.0)/4 − 0.2
    (2L, "zebra qux"),           // OOV-only: 0/2 − 0.2
    (3L, "   "),                 // zero tokens: unscorable, no row
    (4L, "data")                 // 1.2 − 0.2
  ).toDF("doc_id", "text")

  test("scoreDocs: hand-computed logits, OOV weighs 0, zero-token doc unscorable") {
    val m = QualityModel.fromMap(spark, weights, -0.2)
    val out = QualityModel.scoreDocs(docs, m, "doc_id", "text")
      .select("doc_id", "n_tokens", "sum_micros", "logit")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    out.map(_._1) shouldBe Array(1L, 2L, 4L) // doc 3 unscorable
    val byId = out.map(r => r._1 -> r).toMap
    byId(1L) shouldBe ((1L, 4L, 1200000L, logit(1200000L, 4L, -200000L)))
    byId(2L) shouldBe ((2L, 2L, 0L, logit(0L, 2L, -200000L)))
    byId(4L) shouldBe ((4L, 1L, 1200000L, logit(1200000L, 1L, -200000L)))
  }

  test("filterByScore: schema-preserving threshold gate; unscorable docs drop") {
    val m = QualityModel.fromMap(spark, weights, -0.2)
    val kept = QualityModel.filterByScore(docs, m, "doc_id", "text",
      minLogit = 0.0)
    kept.columns shouldBe docs.columns
    // doc 1 logit ≈ 0.1, doc 4 = 1.0 survive; doc 2 (−0.2) below, doc 3
    // unscorable — a gate that passes unscorable text is not a gate
    kept.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 4L)
    // permissive threshold still never resurrects the unscorable doc
    QualityModel.filterByScore(docs, m, "doc_id", "text", minLogit = -10.0)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 2L, 4L)
  }

  test("persisted model: stored scoring bit-identical; missing store errors") {
    val m = QualityModel.fromMap(spark, weights, -0.2)
    val store = java.nio.file.Files
      .createTempDirectory("qmodel-").toString + "/model"
    QualityModel.saveModel(m, store)
    def rows(model: LinearModel) =
      QualityModel.scoreDocs(docs, model, "doc_id", "text")
        .select("doc_id", "n_tokens", "sum_micros", "logit")
        .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    // micro longs + tokens round-trip parquet exactly → identical bits
    rows(QualityModel.loadModel(spark, store)) shouldBe rows(m)
    val missing = the[IllegalArgumentException] thrownBy
      QualityModel.loadModel(spark, store + "_missing")
    missing.getMessage should include("missing store is an error")
  }

  test("loadModel: sidecar binds the store to its exact weights — mutated content refuses") {
    val m = QualityModel.fromMap(spark, weights, -0.2)
    val store = java.nio.file.Files
      .createTempDirectory("qmodel-tamper-").toString + "/model"
    QualityModel.saveModel(m, store)
    // overwrite the weight table behind the sidecar with a same-schema
    // but different-content table: the recomputed fingerprint must
    // mismatch the stamped one, so load refuses instead of silently
    // scoring under the wrong fit
    Seq(("rogue", 999999L)).toDF("token", "w_micros")
      .write.mode("overwrite").parquet(s"$store/weights")
    val e = the[IllegalArgumentException] thrownBy
      QualityModel.loadModel(spark, store)
    e.getMessage should (include("weights_fp") or include("n_weights"))
    // ODD replication (every row 3×) — invisible to an XOR fold
    // (h ⊕ h ⊕ h = h) but it corrupts scoring (in-vocab tokens join 3×,
    // OOV once), so the multiplicity-sensitive fingerprint must refuse
    val storeR = java.nio.file.Files
      .createTempDirectory("qmodel-repl-").toString + "/model"
    QualityModel.saveModel(m, storeR)
    val dup = weights.toSeq
      .map { case (t, wgt) => (t, math.floor(wgt * 1e6 + 0.5).toLong) }
    (dup ++ dup).toDF("token", "w_micros")
      .write.mode("append").parquet(s"$storeR/weights")
    val eR = the[IllegalArgumentException] thrownBy
      QualityModel.loadModel(spark, storeR)
    eR.getMessage should (include("weights_fp") or include("n_weights"))
    // a LEGACY sidecar (the interim XOR-era form: no n_weights key)
    // on a healthy store must migrate — restamp under the new
    // fingerprint — not refuse every store saved by the prior version
    val storeL = java.nio.file.Files
      .createTempDirectory("qmodel-legacy-").toString + "/model"
    QualityModel.saveModel(m, storeL)
    graft.core.StoreMeta.overwrite(spark, storeL, "quality_model",
      Map("bias_micros" -> -200000L, "weights_fp" -> 12345L))
    QualityModel.scoreDocs(docs, QualityModel.loadModel(spark, storeL),
      "doc_id", "text").count() shouldBe 3
    val restamped = graft.core.StoreMeta.read(spark, storeL).get
    restamped.keySet should contain("n_weights")
    // the migration is GATED: a sidecar of any OTHER family at the
    // path (also lacking n_weights) is a foreign store, not a legacy
    // quality model — it must refuse, never be restamped
    val storeF = java.nio.file.Files
      .createTempDirectory("qmodel-foreign-").toString + "/model"
    QualityModel.saveModel(m, storeF)
    graft.core.StoreMeta.overwrite(spark, storeF, "ivf",
      Map("num_lists" -> 16))
    val eF = the[IllegalArgumentException] thrownBy
      QualityModel.loadModel(spark, storeF)
    eF.getMessage should include("family")
    graft.core.StoreMeta.read(spark, storeF)
      .get("family") shouldBe "ivf" // NOT re-certified
    // ...and a legacy quality_model sidecar whose bias DISAGREES with
    // _meta is drifted content, not a healthy legacy store — refuse
    val storeD = java.nio.file.Files
      .createTempDirectory("qmodel-drift-").toString + "/model"
    QualityModel.saveModel(m, storeD)
    graft.core.StoreMeta.overwrite(spark, storeD, "quality_model",
      Map("bias_micros" -> 999999L, "weights_fp" -> 12345L))
    val eD = the[IllegalArgumentException] thrownBy
      QualityModel.loadModel(spark, storeD)
    eD.getMessage should (include("bias_micros") or include("n_weights"))
    // an empty _meta directory (partially-written store) also refuses
    val store2 = java.nio.file.Files
      .createTempDirectory("qmodel-empty-").toString + "/model"
    QualityModel.saveModel(m, store2)
    val metaSchema = spark.read.parquet(s"$store2/_meta").schema
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], metaSchema)
      .write.mode("overwrite").parquet(s"$store2/_meta")
    val e2 = the[IllegalArgumentException] thrownBy
      QualityModel.loadModel(spark, store2)
    e2.getMessage should include("empty _meta")
  }
}
