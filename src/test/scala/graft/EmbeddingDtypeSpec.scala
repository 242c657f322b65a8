package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Same failure class as the events TIMESTAMP_NTZ regen (which silently
  * killed two queries for two rounds): if the testdata — or a user's
  * table — ships `embedding` as array<double> instead of array<float>,
  * every ANN query must still run. The native kernels (VecDot,
  * HyperplaneBits, PqKernels) accept both element types; the historical
  * gap was the three driver-side index-build collect sites reading rows
  * with getSeq[Float]. Float → double widening is exact, so every
  * result must be IDENTICAL across the two encodings — pinned here for
  * the three queries that exercise all driver-side vector reads
  * (seed centroids, k-means refine, PQ codebooks).
  */
class EmbeddingDtypeSpec extends SparkSpec {

  private val base = "/root/testdata/sf0.001"

  private lazy val doubleDir: String = {
    val root = java.nio.file.Files.createTempDirectory("emb-dtype-").toString
    spark.read.parquet(s"$base/embeddings.parquet")
      .withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$root/embeddings.parquet")
    root
  }

  private def annQueries: Seq[String] =
    SparkEntry.queries.keys.filter(_.startsWith("ann_")).toSeq.sorted

  test("the double-cast copy reads back as array<double>") {
    spark.read.parquet(s"$doubleDir/embeddings.parquet")
      .schema("embedding").dataType shouldBe ArrayType(DoubleType, true)
    annQueries should contain allOf ("ann_brute_topk", "ann_ivf_refined_topk",
      "ann_ivfpq_topk", "ann_neardup_incremental", "ann_cosine_neardup_capped")
  }

  test("every ann query analyzes on array<double> embeddings") {
    for (name <- annQueries)
      withClue(s"$name on array<double>: ") {
        noException should be thrownBy
          SparkEntry.queries(name)(spark, doubleDir).queryExecution.analyzed
      }
  }

  // ann_brute_topk: pure-kernel path; ann_ivf_refined_topk: seedCentroids
  // + kmeansRefine collects; ann_ivfpq_topk: seedPqCodebooks collect —
  // together they cover every driver-side vector read
  for (name <- Seq("ann_brute_topk", "ann_ivf_refined_topk", "ann_ivfpq_topk")) {
    test(s"$name is value-identical on float and double embeddings") {
      val f = SparkEntry.queries(name)(spark, base).collect().toSet
      val d = SparkEntry.queries(name)(spark, doubleDir).collect().toSet
      d shouldBe f
    }
  }
}
