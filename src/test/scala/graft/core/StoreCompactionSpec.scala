package graft.core

import graft.SparkSpec
import graft.operators.Dedup
import java.nio.file.Files

class StoreCompactionSpec extends SparkSpec {
  import spark.implicits._

  test("flat store compaction: fewer files, identical rows, sidecars preserved") {
    val p = Files.createTempDirectory("compact-").toString + "/fps"
    // ten daily appends → many small files
    for (day <- 1 to 10) {
      val batch = (1 to 20)
        .map(i => (day * 100L + i, s"doc $day $i text"))
        .toDF("id", "text")
      Dedup.appendFingerprints(batch, "text", p)
    }
    val rowsBefore = spark.read.parquet(p).collect().map(_.getString(0)).sorted
    val metaBefore = StoreMeta.read(spark, p)
    metaBefore should not be empty
    val (before, after) = StoreCompaction.compactFlatStore(spark, p)
    before should be > after
    after shouldBe 1 // tiny store → one target-sized file
    // row multiset unchanged
    spark.read.parquet(p).collect().map(_.getString(0)).sorted shouldBe rowsBefore
    // sidecar survived the swap, still refuses a mismatched convention
    StoreMeta.read(spark, p) shouldBe metaBefore
    Dedup.readFingerprints(spark, p).count() shouldBe rowsBefore.length.toLong
  }

  test("compaction of a missing store refuses; empty store is a no-op") {
    an[IllegalArgumentException] should be thrownBy
      StoreCompaction.compactFlatStore(spark, "/tmp/does-not-exist-" +
        System.nanoTime())
    val p = Files.createTempDirectory("compact-empty-").toString
    StoreCompaction.compactFlatStore(spark, p) shouldBe ((0, 0))
  }

  test("band-key store round-trips probe-identically through compaction") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally different words live here right now friends")
    ).toDF("id", "text")
    val p = Files.createTempDirectory("compact-bk-").toString + "/bands"
    Dedup.appendBandKeys(docs, "id", "text", p)
    Dedup.appendBandKeys(
      docs.select((col("id") + 10).as("id"), col("text")), "id", "text", p)
    val probeBefore = Dedup.readBandKeys(spark, p).collect().toSet
    StoreCompaction.compactFlatStore(spark, p)
    Dedup.readBandKeys(spark, p).collect().toSet shouldBe probeBefore
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
