package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: synthesize an N× PERFORMANCE-probe corpus from a driver
  * testdata directory — `Test/runMain graft.tools.ScaleUp <inDir>
  * <outDir> <factor>`. NOT a correctness input (the oracle gates run
  * only on the driver's own parquet): the point is one measured
  * sf0.1-vs-sf1 datapoint per expensive bench family, so SCALE.md's
  * shuffle stories become curves instead of stories.
  *
  * Scaling model — a LARGER corpus, not a replicated one:
  *  - `documents`: each replica r > 0 prefixes every token with `r<r>`,
  *    so replicas share no vocabulary. Token-level operators (BM25,
  *    TF-IDF, minhash shingles) see 10× the docs and 10× the vocab with
  *    the per-replica df distribution preserved — naive duplication
  *    would instead make every doc a 10-way near-dup and measure an
  *    artificial all-pairs explosion, not scale.
  *  - `embeddings`: each replica circularly ROTATES the vector by r
  *    positions — norm and coordinate distribution preserved, rotated
  *    vs original cosine ≈ random, so replicas are not artificial
  *    near-dup pairs.
  *  - ids offset by r × (max id + 1); `region` copied verbatim for the
  *    bench's warm-up/sentinel probe.
  */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <inDir> <outDir> <factor>")
    val Array(inDir, outDir, factorS) = args
    val factor = factorS.toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val reps = spark.range(factor).select(col("id").cast("int").as("repl"))

    val docs = spark.read.parquet(s"$inDir/documents.parquet")
    val maxDoc = docs.agg(max("doc_id")).head().getLong(0) + 1
    docs.crossJoin(broadcast(reps))
      .select(
        (col("doc_id") + col("repl").cast("long") * maxDoc).as("doc_id"),
        when(col("repl") === 0, col("text")).otherwise(
          array_join(transform(split(col("text"), " "),
            t => concat(lit("r"), col("repl").cast("string"), t)), " "))
          .as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = spark.read.parquet(s"$inDir/embeddings.parquet")
    val maxVec = emb.agg(max("vec_id")).head().getLong(0) + 1
    emb.crossJoin(broadcast(reps))
      .select(
        (col("vec_id") + col("repl").cast("long") * maxVec).as("vec_id"),
        when(col("repl") === 0, col("embedding")).otherwise(
          concat(
            slice(col("embedding"), col("repl") + 1,
              size(col("embedding")) - col("repl")),
            slice(col("embedding"), lit(1), col("repl"))))
          .as("embedding"),
        col("label"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    spark.read.parquet(s"$inDir/region.parquet")
      .write.mode("overwrite").parquet(s"$outDir/region.parquet")
    System.err.println(s"[scaleup] wrote ${factor}x corpus to $outDir")
    spark.stop()
  }
}
