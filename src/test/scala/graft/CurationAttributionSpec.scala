package graft

import org.apache.spark.sql.execution.QueryExecution
import org.scalatest.matchers.should.Matchers

/** Per-stage plan attribution for the curation chain
  * ([[JobRunner.withCurationAttribution]]) — the near-dup attribution
  * pattern applied to `curation_pipeline`'s stages: when the composed
  * entry's cost or scale curve moves, the observed row volumes say
  * which stage moved, from one run. Exact planted counts; the default
  * (attribution OFF) plan is asserted observer-free.
  */
class CurationAttributionSpec extends SparkSpec with Matchers {
  import spark.implicits._

  // 10 gopher-passing docs (40 distinct 4-6 char words each), 2 exact
  // dups of doc 0, 3 junk docs (one word repeated — top-word fraction
  // 1.0 fails gopher, entropy 0 fails the entropy floor)
  private def docs = {
    val base = (0L until 10L).map(i =>
      (i, (0 until 40).map(j => s"w${i}x$j").mkString(" ")))
    val dups = Seq((100L, base(0)._2), (101L, base(0)._2))
    val junk = (200L until 203L).map(i =>
      (i, Seq.fill(35)(s"junk$i").mkString(" ")))
    (base ++ dups ++ junk).toDF("doc_id", "text")
  }

  private val curation: Map[String, Any] = Map("curation" -> Map(
    "id_field" -> "doc_id", "text_field" -> "text",
    "dedupe" -> "exact",
    "quality_filter" -> Seq("gopher", "entropy"),
    "sample" -> "bernoulli", "sample_fraction" -> "1.0"))

  test("withCurationAttribution: per-stage row counts land in observedMetrics with exact planted values") {
    val metrics = new scala.collection.concurrent.TrieMap[String, Long]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, row) =>
          metrics.updateWith(k)(o =>
            Some(math.max(o.getOrElse(0L), row.getLong(0))))
        }
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val kept =
      try JobRunner.withCurationAttribution {
        val n = JobRunner.applyCuration(docs, curation).count()
        val want = Set("graft.curation.input", "graft.curation.dedupe",
          "graft.curation.quality_0_gopher+entropy",
          "graft.curation.sample")
        val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
        while (!want.subsetOf(metrics.keySet) &&
            System.nanoTime() < deadline) Thread.sleep(50)
        n
      } finally spark.listenerManager.unregister(listener)
    kept shouldBe 10L // fraction 1.0 keeps every quality survivor
    metrics("graft.curation.input") shouldBe 15L
    metrics("graft.curation.dedupe") shouldBe 13L // 2 exact dups gone
    // adjacent gopher+entropy fused into ONE gate (and one counter)
    metrics("graft.curation.quality_0_gopher+entropy") shouldBe 10L
    metrics("graft.curation.sample") shouldBe 10L
    graft.core.CacheScope.releaseAll()
  }

  test("attribution OFF (default): the curation plan carries no CollectMetrics") {
    val plan = JobRunner.applyCuration(docs, curation)
      .queryExecution.analyzed
    plan.collect {
      case m: org.apache.spark.sql.catalyst.plans.logical.CollectMetrics => m
    } shouldBe empty
    graft.core.CacheScope.releaseAll()
  }
}
