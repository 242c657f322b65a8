package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bloom-prefiltered incremental exact dedup: the sketch must be
  * result-invisible (prefilter only — false positives removed by the
  * exact check), mergeable for store maintenance, and bootstrap-safe on
  * an empty corpus.
  */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "zeta eta"),
    (4L, "Alpha  Beta   GAMMA"), // normalizes equal to doc 1
    (5L, "theta iota"), (6L, "kappa lambda"), (7L, "mu nu xi"))
    .toDF("doc_id", "text")

  private def fps(d: org.apache.spark.sql.DataFrame) =
    d.select(Dedup.fingerprint(col("text")).as("fp"))

  test("bloom path equals the plain incremental path") {
    val corpus = docs.filter($"doc_id" <= 3)
    val batch = docs.filter($"doc_id" >= 4)
    val sketch = Dedup.buildFingerprintBloom(fps(corpus), 1000)
    val got = Dedup.dropDuplicatesIncrementalBloom(
      batch, "doc_id", "text", fps(corpus), sketch).collect().toSet
    val want = Dedup.dropDuplicatesIncremental(
      batch, "doc_id", "text", fps(corpus)).collect().toSet
    got shouldBe want
    // doc 4 is a normalized copy of corpus doc 1 and must be gone
    got.map(_.getLong(0)) shouldBe Set(5L, 6L, 7L)
  }

  test("forced false positives are removed by the exact verify") {
    // a sketch sized for 1 item at 50% fpp saturates instantly: nearly
    // every batch row goes bloom-positive, and the result must STILL be
    // exact — this is the test that the verify leg actually runs
    val corpus = docs.filter($"doc_id" <= 3)
    val batch = docs.filter($"doc_id" >= 4)
    val tiny = Dedup.buildFingerprintBloom(fps(corpus), 1, fpp = 0.5)
    val got = Dedup.dropDuplicatesIncrementalBloom(
      batch, "doc_id", "text", fps(corpus), tiny).collect().toSet
    got shouldBe Dedup.dropDuplicatesIncremental(
      batch, "doc_id", "text", fps(corpus)).collect().toSet
  }

  test("empty corpus bootstraps to a valid empty sketch") {
    val empty = fps(docs).filter(lit(false))
    val sketch = Dedup.buildFingerprintBloom(empty, 1000)
    val got = Dedup.dropDuplicatesIncrementalBloom(
      docs, "doc_id", "text", empty, sketch).collect().toSet
    // nothing in the corpus: only the in-batch keep-min applies (doc 4
    // duplicates doc 1)
    got.map(_.getLong(0)) shouldBe Set(1L, 2L, 3L, 5L, 6L, 7L)
  }

  test("merged batch sketch behaves like a rebuilt store sketch") {
    val day1 = docs.filter($"doc_id" <= 3)
    val day2 = docs.filter($"doc_id" === 5L || $"doc_id" === 6L)
    val merged = Dedup.mergeFingerprintBloom(
      Dedup.buildFingerprintBloom(fps(day1), 1000),
      Dedup.buildFingerprintBloom(fps(day2), 1000))
    val store = fps(day1).union(fps(day2))
    val batch = docs // all 7: 1..6-equivalents are dups, 7 is new
    val got = Dedup.dropDuplicatesIncrementalBloom(
      batch, "doc_id", "text", store, merged).collect().toSet
    got.map(_.getLong(0)) shouldBe Set(7L)
  }

  test("incompatible sizings fail loudly on merge") {
    val a = Dedup.buildFingerprintBloom(fps(docs), 1000)
    val b = Dedup.buildFingerprintBloom(fps(docs), 50000)
    an[Exception] should be thrownBy Dedup.mergeFingerprintBloom(a, b)
  }

  test("the store side of the candidate joins never exchanges") {
    val corpus = docs.filter($"doc_id" <= 3)
    val batch = docs.filter($"doc_id" >= 4)
    val sketch = Dedup.buildFingerprintBloom(fps(corpus), 1000)
    val plan = Dedup.dropDuplicatesIncrementalBloom(
      batch, "doc_id", "text", fps(corpus), sketch)
      .queryExecution.executedPlan.toString
    // candidates broadcast under the guard; a sort-merge join would mean
    // the corpus got shuffled on fp — exactly what the sketch exists to
    // avoid
    plan should not include "SortMergeJoin"
    plan should include("BroadcastHashJoin")
  }
}
