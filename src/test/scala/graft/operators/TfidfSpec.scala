package graft.operators

import graft.SparkSpec

class TfidfSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "alpha beta gamma delta"),
    (2L, "alpha beta gamma delta"), // exact dup of 1
    (3L, "epsilon zeta eta theta"),
    (4L, "alpha epsilon")
  ).toDF("doc_id", "text")

  test("vectors: one row per (doc, bucket), w = tf * idf, idf from doc frequency") {
    val v = Tfidf.hashedVectors(docs, "doc_id", "text", buckets = 64)
    v.groupBy("id", "bucket").count().filter($"count" > 1).count() shouldBe 0
    // duplicate docs get identical vectors
    val v1 = v.filter($"id" === 1L).select("bucket", "tf", "w").collect().toSet
    val v2 = v.filter($"id" === 2L).select("bucket", "tf", "w").collect().toSet
    v1 shouldBe v2
    // a token in 3 of 4 docs has smaller idf than one in a single doc:
    // w/tf for alpha's bucket < w/tf for zeta's bucket
    val idf = Tfidf.idfMilli(docs, "doc_id", "text", 64)
    idf.values.min should be < idf.values.max
    // every w is tf * some idf entry
    v.collect().foreach { r =>
      val tf = r.getAs[Long]("tf"); val w = r.getAs[Long]("w")
      val b = r.getAs[Long]("bucket")
      w shouldBe tf * idf(b)
    }
  }

  test("cosine pairs: exact duplicates found with cos = 1, disjoint docs absent") {
    val p = Tfidf.cosinePairs(docs, "doc_id", "text",
      buckets = 64, maxTokenDf = 10, tauNum = 4, tauDen = 5)
    val rows = p.collect().map(r =>
      (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dot"), r.getAs[Long]("n2_a"), r.getAs[Long]("n2_b")))
    val dup = rows.find(t => t._1 == 1L && t._2 == 2L)
    dup.isDefined shouldBe true
    // identical vectors: dot = n2a = n2b (cos exactly 1)
    val (_, _, dot, n2a, n2b) = dup.get
    dot shouldBe n2a
    dot shouldBe n2b
    // docs 1 and 3 share no token: never even a candidate
    rows.exists(t => t._1 == 1L && t._2 == 3L) shouldBe false
  }

  test("cosine threshold is exact-integer: a sub-threshold overlap pair is dropped") {
    // docs sharing one of four tokens have cos well under 0.8
    val p = Tfidf.cosinePairs(docs, "doc_id", "text",
      buckets = 64, maxTokenDf = 10, tauNum = 4, tauDen = 5)
    p.filter($"id_a" === 1L && $"id_b" === 4L).count() shouldBe 0
    // but at a low threshold (cos >= 0.1) the same pair appears
    val loose = Tfidf.cosinePairs(docs, "doc_id", "text",
      buckets = 64, maxTokenDf = 10, tauNum = 1, tauDen = 10)
    loose.filter($"id_a" === 1L && $"id_b" === 4L).count() shouldBe 1
  }

  test("idf store round-trips bit-for-bit; stored fit ≡ in-flight vectors") {
    val store = java.nio.file.Files.createTempDirectory("tfidf-idf-")
      .resolve("idf").toString
    Tfidf.saveIdf(docs, "doc_id", "text", store)
    val loaded = Tfidf.loadIdf(spark, store)
    loaded shouldBe Tfidf.idfMilli(docs, "doc_id", "text", 64)
    val inFlight = Tfidf.hashedVectors(docs, "doc_id", "text").collect().toSet
    Tfidf.hashedVectorsWithIdf(docs, "doc_id", "text", loaded, 64)
      .collect().toSet shouldBe inFlight
  }

  test("incremental: corpus hits drop, within-batch clusters collapse, fresh rows survive") {
    val store = java.nio.file.Files.createTempDirectory("tfidf-inc-")
      .resolve("store").toString
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six")
    ).toDF("doc_id", "text")
    Tfidf.saveStore(corpus, "doc_id", "text", store, maxTokenDf = 10)
    val batch = Seq(
      (10L, "alpha beta gamma delta epsilon zeta"), // = corpus 1 → hit
      (11L, "fresh content nobody has ever written"),
      (12L, "fresh content nobody has ever written"), // batch dup of 11
      (13L, "utterly unrelated standalone sentence")
    ).toDF("doc_id", "text")
    Tfidf.dropNearCorpusTfidf(batch, "doc_id", "text", store,
      maxTokenDf = 10)
      .select("doc_id").as[Long].collect().sorted shouldBe Array(11L, 13L)
  }

  test("stop-token cap drops candidates that share only hot tokens") {
    // 'common' appears in every doc (df=5 > cap=3): pairs sharing only it
    // are never candidates
    val d = Seq(
      (1L, "common unique1"), (2L, "common unique2"), (3L, "common unique3"),
      (4L, "common unique4"), (5L, "common unique5")
    ).toDF("doc_id", "text")
    Tfidf.cosinePairs(d, "doc_id", "text", buckets = 64,
      maxTokenDf = 3, tauNum = 1, tauDen = 100).count() shouldBe 0
  }

  test("weight cap: w clamps at wCap(B) so norms/dots can never wrap BIGINT") {
    // an adversarial fit whose idf dwarfs the cap (a real fit can reach
    // w ~1e9 only via multi-million-token documents — too slow for a
    // unit test; the clamp point is identical)
    val hugeIdf = Map(Tfidf.UnseenKey -> Long.MaxValue / 4)
    val v = Tfidf.hashedVectorsWithIdf(docs, "doc_id", "text", hugeIdf, 64)
    val cap = Tfidf.wCap(64)
    v.select("w").collect().foreach(_.getLong(0) shouldBe cap)
    // Σw² stays positive and ≤ Long.Max — the silent-wrap failure mode
    // (negative norms → wrong dedup decisions) is impossible
    Tfidf.squaredNorms(v).collect().foreach { r =>
      r.getAs[Long]("n2") should be > 0L
    }
    // cap math: B·wCap² ≤ Long.Max (squared norm) and the Cauchy–Schwarz
    // bound keeps every dot ≤ Long.Max
    BigInt(64) * BigInt(cap) * BigInt(cap) should be <= BigInt(Long.MaxValue)
    // ordinary weights are far below the cap and pass through unclamped
    val normal = Tfidf.hashedVectors(docs, "doc_id", "text", buckets = 64)
    normal.select("w").collect().foreach(_.getLong(0) should be < cap)
  }
}
