package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Config-driven index builds ([[BuildIndex]]): the YAML verb must
  * produce stores that a SEPARATE process can probe from the persisted
  * training sidecars alone — no re-derivation from the corpus — with
  * results bit-identical to the in-memory build it replaces.
  */
class BuildIndexSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int) = (0L until n.toLong).map { i =>
    (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j * 1.13).toFloat))
  }.toDF("vec_id", "embedding")

  private def writeCfg(lines: String*): String = {
    val p = java.nio.file.Files.createTempFile("index-", ".yaml")
    java.nio.file.Files.write(p, lines.mkString("\n").getBytes("UTF-8"))
    p.toString
  }

  test("ivfsq + raw twin: built stores probe bit-identically to in-memory two-stage, from sidecars alone") {
    val data = vecs(120)
    val inPath = java.nio.file.Files
      .createTempDirectory("bidx-in-").toString + "/emb"
    data.write.parquet(inPath)
    val store = java.nio.file.Files
      .createTempDirectory("bidx-ivfsq-").toString + "/idx"
    val rawStore = java.nio.file.Files
      .createTempDirectory("bidx-raw-").toString + "/idx"
    val cfg = writeCfg(
      s"input: $inPath",
      "id_field: vec_id",
      "vector_field: embedding",
      "kind: ivfsq",
      s"store: $store",
      s"raw_store: $rawStore",
      "num_lists: 4",
      "dim: 8")
    val r = BuildIndex.run(spark, cfg)
    r.rows shouldBe 120
    r.rawStore shouldBe Some(rawStore)
    // probe FROM THE SIDECARS ONLY — what a separate process has
    val cents = Similarity.readCentroids(spark, store)
    val (mins, maxs) = Similarity.readSqTrainParams(spark, store)
    val queries = data.filter($"vec_id" < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "dist")
        .as[(Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._3))
    rows(Similarity.ivfSqRerankTopKFromStores(spark, store, rawStore,
      queries, "vec_id", "embedding", k = 3, centroids = cents,
      nprobe = 2, mins = mins, maxs = maxs, factor = 3)) shouldBe
      rows(Similarity.ivfSqRerankTopK(data, queries, "vec_id",
        "embedding", k = 3,
        centroids = Similarity.seedCentroids(data, "vec_id", "embedding", 4),
        nprobe = 2,
        mins = Similarity.trainSqParams(data, "embedding", 8)._1,
        maxs = Similarity.trainSqParams(data, "embedding", 8)._2,
        factor = 3))
  }

  test("ivfpq with training: persisted codebook is the TRAINED one the store encodes with") {
    val data = vecs(100)
    val inPath = java.nio.file.Files
      .createTempDirectory("bidx-in2-").toString + "/emb"
    data.write.parquet(inPath)
    val store = java.nio.file.Files
      .createTempDirectory("bidx-ivfpq-").toString + "/idx"
    val cfg = writeCfg(
      s"input: $inPath",
      "id_field: vec_id",
      "vector_field: embedding",
      "kind: ivfpq",
      s"store: $store",
      "num_lists: 4",
      "pq_m: 2", "pq_codes: 4", "pq_dsub: 4",
      "train_iterations: 2")
    BuildIndex.run(spark, cfg)
    val (cb, m, numCodes, dsub) = Similarity.readPqCodebook(spark, store)
    (m, numCodes, dsub) shouldBe ((2, 4, 4))
    // the persisted codebook must equal the distributed trainer's
    // output (bit-exact doubles through parquet), NOT the seed
    val seed = Similarity.seedPqCodebooks(data, "vec_id", "embedding",
      m = 2, k = 4, dsub = 4)
    val trained = Similarity.refinePqCodebooksDistributed(data, "vec_id",
      "embedding", seed, m = 2, numCodes = 4, dsub = 4, iterations = 2)
    cb shouldBe trained
    cb should not be seed
    // and the probe from sidecars matches the in-memory trained probe
    val cents = Similarity.readCentroids(spark, store)
    val queries = data.filter($"vec_id" < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank", "adc")
        .as[(Long, Long, Long, Double)].collect().sortBy(t => (t._1, t._3))
    rows(Similarity.ivfPqTopKFromStore(spark, store, queries, "vec_id",
      "embedding", k = 3, centroids = cents, nprobe = 2, codebook = cb,
      m = m, numCodes = numCodes, dsub = dsub)) shouldBe
      rows(Similarity.ivfPqTopK(data, queries, "vec_id", "embedding",
        k = 3, centroids = cents, nprobe = 2, codebook = trained,
        m = 2, numCodes = 4, dsub = 4))
  }

  test("sq + lsh kinds build probe-able stores; unknown kind refuses") {
    val data = vecs(60)
    val inPath = java.nio.file.Files
      .createTempDirectory("bidx-in3-").toString + "/emb"
    data.write.parquet(inPath)
    val sqStore = java.nio.file.Files
      .createTempDirectory("bidx-sq-").toString + "/idx"
    BuildIndex.run(spark, writeCfg(
      s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
      "kind: sq", s"store: $sqStore", "dim: 8"))
    val (mins, maxs) = Similarity.readSqTrainParams(spark, sqStore)
    Similarity.sqTopKFromStore(spark, sqStore,
      data.filter($"vec_id" < 2), "vec_id", "embedding", k = 3,
      mins = mins, maxs = maxs).count() shouldBe 6
    val lshStore = java.nio.file.Files
      .createTempDirectory("bidx-lsh-").toString + "/idx"
    BuildIndex.run(spark, writeCfg(
      s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
      "kind: lsh", s"store: $lshStore", "planes: 3", "dim: 8"))
    Similarity.lshTopKFromStore(spark, lshStore,
      data.filter($"vec_id" < 2), "vec_id", "embedding", k = 3,
      planes = 3, dim = 8).count() should be > 0L
    val e = the[IllegalArgumentException] thrownBy
      BuildIndex.run(spark, writeCfg(
        s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
        "kind: nope", s"store: $sqStore"))
    e.getMessage should include("unknown index kind")
  }

  test("misconfiguration refuses up front: wrong dim, raw_store on a non-twin kind") {
    val data = vecs(40) // uniformly 8-dim
    val inPath = java.nio.file.Files
      .createTempDirectory("bidx-in4-").toString + "/emb"
    data.write.parquet(inPath)
    val store = java.nio.file.Files
      .createTempDirectory("bidx-bad-").toString + "/idx"
    // omitted dim defaults to 64: on an 8-dim corpus kind: binary would
    // silently write an EMPTY store — must refuse naming the real dim
    val e1 = the[IllegalArgumentException] thrownBy
      BuildIndex.run(spark, writeCfg(
        s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
        "kind: binary", s"store: $store"))
    e1.getMessage should include("set dim: 8")
    // a too-SMALL dim on a uniform corpus would silently
    // prefix-truncate every vector — same refusal
    val e2 = the[IllegalArgumentException] thrownBy
      BuildIndex.run(spark, writeCfg(
        s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
        "kind: sq", s"store: $store", "dim: 4"))
    e2.getMessage should include("set dim: 8")
    // raw_store with a kind that has no refine twin would be silently
    // ignored and surface hours later as a missing path — refuse
    val e3 = the[IllegalArgumentException] thrownBy
      BuildIndex.run(spark, writeCfg(
        s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
        "kind: ivf", s"store: $store", "raw_store: /tmp/nope",
        "num_lists: 4"))
    e3.getMessage should include("raw_store is only supported")
    // fractional numeric config is a typo, not a request for
    // truncation — num_lists: 4.7 must fail, not build a 4-list index
    val e4 = the[IllegalArgumentException] thrownBy
      BuildIndex.run(spark, writeCfg(
        s"input: $inPath", "id_field: vec_id", "vector_field: embedding",
        "kind: ivf", s"store: $store", "num_lists: 4.7"))
    e4.getMessage should include("num_lists must be an integer")
  }
}
