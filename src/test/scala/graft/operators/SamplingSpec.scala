package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sampling: reproducibility, partition-layout stability,
  * stratum caps, and plan shape (Bernoulli must not shuffle).
  */
class SamplingSpec extends SparkSpec {

  private def docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")
    .select("doc_id", "lang")

  test("bernoulli: deterministic, repartition-stable, roughly the asked fraction") {
    val a = Sampling.bernoulliSample(docs, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.bernoulliSample(docs.repartition(17), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    b shouldBe a // layout-independent — rand()-based sampling is not
    val n = docs.count().toDouble
    a.size.toDouble / n shouldBe 0.3 +- 0.1
    // nested: a smaller fraction is a subset of a larger one
    val small = Sampling.bernoulliSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    small.subsetOf(a) shouldBe true
    Sampling.bernoulliSample(docs, "doc_id", 1.0).count() shouldBe n.toLong
    Sampling.bernoulliSample(docs, "doc_id", 0.0).count() shouldBe 0L
  }

  test("bernoulli: pure filter, no Exchange in the plan") {
    val p = Sampling.bernoulliSample(docs, "doc_id", 0.5)
      .queryExecution.executedPlan.toString
    p should not include "Exchange"
  }

  test("mixture: per-stratum fractions, consistent with bernoulli, no Exchange") {
    val src = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "source")
    val m = Sampling.mixtureSample(src, "source", "doc_id",
      Map("src0" -> 1.0, "src1" -> 0.3), defaultFraction = 0.0)
    val got = m.collect().map(r => r.getLong(0) -> r.getString(1))
    // default 0.0 drops every unlisted stratum
    got.map(_._2).toSet should contain only ("src0", "src1")
    // each listed stratum equals the plain bernoulli draw at its fraction
    val src0 = src.filter(col("source") === "src0")
    got.filter(_._2 == "src0").map(_._1).toSet shouldBe
      Sampling.bernoulliSample(src0, "doc_id", 1.0)
        .collect().map(_.getLong(0)).toSet
    val src1 = src.filter(col("source") === "src1")
    got.filter(_._2 == "src1").map(_._1).toSet shouldBe
      Sampling.bernoulliSample(src1, "doc_id", 0.3)
        .collect().map(_.getLong(0)).toSet
    // still a pure map-side filter
    m.queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("stratified: exactly n per stratum (or the whole stratum), deterministic") {
    val s = Sampling.stratifiedSample(docs, "lang", "doc_id", 20)
    val counts = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts.foreach { case (lang, c) => c shouldBe math.min(20L, full(lang)) }
    val again = Sampling.stratifiedSample(docs.repartition(7), "lang", "doc_id", 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    again shouldBe s.select("doc_id").collect().map(_.getLong(0)).toSet
  }

  test("assignSplits: disjoint, exhaustive, layout-stable, boundary = bernoulli") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(docs, "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // exhaustive: every row labeled with a declared split
    a.size shouldBe docs.count()
    a.values.toSet shouldBe Set("train", "val", "test")
    // layout-stable
    val b = Sampling.assignSplits(docs.repartition(13), "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    b shouldBe a
    // the train boundary IS the 0.8 bernoulli draw (same key, same
    // threshold) — the property that makes splits composable with the
    // other sampling ops
    val bern = Sampling.bernoulliSample(docs, "doc_id", 0.8)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    a.filter(_._2 == "train").keySet shouldBe bern
  }

  test("assignSplits: no shuffle; bad fractions rejected") {
    val plan = Sampling.assignSplits(docs, "doc_id",
      Seq("a" -> 0.5, "b" -> 0.5)).queryExecution.executedPlan.toString
    plan should not include "Exchange"
    an[IllegalArgumentException] should be thrownBy
      Sampling.assignSplits(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    an[IllegalArgumentException] should be thrownBy
      Sampling.assignSplits(docs, "doc_id", Seq.empty)
    // single split: everything lands in it
    Sampling.assignSplits(docs, "doc_id", Seq("all" -> 1.0))
      .select("split").distinct().collect().map(_.getString(0)) shouldBe
      Array("all")
  }

  test("upsample: whole epochs exact, fractional epoch a seeded subset, shuffle-free") {
    val n = docs.count()
    // rate 2.0: exactly two copies of every row, copy_idx 0 and 1
    val two = Sampling.upsample(docs, "doc_id", rate = 2.0, seed = 11)
    two.count() shouldBe 2 * n
    two.groupBy("doc_id").count().filter(col("count") =!= 2).count() shouldBe 0
    two.select("copy_idx").distinct().collect()
      .map(_.getLong(0)).sorted shouldBe Array(0L, 1L)
    // rate 2.3: between 2n and 3n rows; every doc has 2 or 3 copies;
    // rerun is identical (deterministic draw)
    val up = Sampling.upsample(docs, "doc_id", rate = 2.3, seed = 11)
    val cnt = up.count()
    cnt should be > (2 * n)
    cnt should be < (3 * n)
    up.groupBy("doc_id").count()
      .filter(col("count") < 2 || col("count") > 3).count() shouldBe 0
    Sampling.upsample(docs, "doc_id", rate = 2.3, seed = 11)
      .count() shouldBe cnt
    // a different seed picks a different third-copy subset
    val other = Sampling.upsample(docs, "doc_id", rate = 2.3, seed = 12)
      .filter(col("copy_idx") === 2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val mine = up.filter(col("copy_idx") === 2).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    other should not be mine
    // rate < 1 degenerates to a Bernoulli sample with copy_idx 0
    val frac = Sampling.upsample(docs, "doc_id", rate = 0.5, seed = 11)
    frac.select("copy_idx").distinct().collect()
      .map(_.getLong(0)) shouldBe Array(0L)
    frac.count() should be < n
    // pure codegen: no Exchange anywhere in the plan
    Sampling.upsample(docs, "doc_id", rate = 2.3, seed = 11)
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("deterministicShuffle: reproducible order, seed-independent, layout-stable") {
    def order(df: org.apache.spark.sql.DataFrame, seed: Long): Seq[Long] =
      Sampling.deterministicShuffle(df, "doc_id", seed, partitions = 4)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
    val o1 = order(docs, seed = 7)
    o1 shouldBe order(docs, seed = 7)                 // rerun → identical
    o1 shouldBe order(docs.repartition(13), seed = 7) // layout-independent
    o1 should not be order(docs, seed = 8)            // new seed → new order
    o1.sorted shouldBe docs.select("doc_id")          // a permutation
      .collect().map(_.getLong(0)).toSeq.sorted
    // and it actually shuffles: not the id order
    o1 should not be o1.sorted
  }
}
