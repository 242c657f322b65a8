package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Hashed TF-IDF document vectors — in-engine sparse embeddings, no
  * external model.
  *
  * The ANN/semantic family ([[Similarity]]) assumes an embedding column
  * already exists; real corpora often have none. Feature-hashed TF-IDF
  * (Weinberger et al. 2009, "Feature Hashing for Large Scale Multitask
  * Learning") is the classical model-free vectorizer: token → one of B
  * hash buckets, weight = tf · idf. Everything here is exact-integer so
  * the correctness gate hash-compares whole rows:
  *
  *  - idf is quantized to MILLI-nats (×1e3, half-up) and embedded as a
  *    B-entry literal CASE — the fit is B longs, never a join. Milli (not
  *    the micro used for scalar scores) keeps downstream products in
  *    range: w ≤ tf·idf_milli ~ 1e6, so n2 = Σw² ≤ B·1e12 and dot ≤ same
  *    stay comfortably inside BIGINT, and only dot² (the threshold test)
  *    needs 38-digit decimals.
  *  - cosine(a,b) ≥ num/den is tested as den²·dot² ≥ num²·n2a·n2b over
  *    exact integers — no sqrt, no float, engine-identical.
  *
  * Scale shape: fit = one token pass partial-aggregated to ≤ B rows
  * collected driver-side (64 longs, not data) + one row count; score =
  * one explode + ONE narrow (id, bucket) shuffle; candidate pairs reuse
  * the df-capped postings join of [[Dedup.ngramJaccardPairs]] (cost
  * Σ_token df², never all-pairs); verification joins the B-row-bounded
  * vectors, shuffling 24-byte rows keyed by id.
  */
object Tfidf {

  /** The same tokenizer every text operator here uses (DSIR, LM, vocab):
    * lower, trim, split on runs of whitespace, drop empties.
    */
  private def tokens(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        explode(split(lower(trim(col(textCol))), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")

  /** Feature bucket of a token: md5-60 % buckets — the oracle-replayable
    * hash shared with [[Sampling.dsirBucket]].
    */
  def bucketOf(token: Column, buckets: Int): Column =
    Dedup.md5Hash60(token) % buckets

  /** Milli-nat quantization, explicit half-up (round()/Math.round disagree
    * on negative halves; idf here is never negative, but the convention is
    * repo-wide).
    */
  def milliNats(x: Double): Long = math.floor(x * 1e3 + 0.5).toLong

  /** Fitted idf table: bucket → milli-nat idf = ln(N+1) − ln(df_b+1),
    * df_b = #docs with ≥1 token in bucket b. At most `buckets` entries,
    * computed from two partial-aggregated passes and collected — the fit
    * IS this array, like [[Sampling.importanceRatios]].
    */
  def idfMilli(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int): Map[Long, Long] = {
    val n = docs.count()
    tokens(docs, idCol, textCol)
      .select(col("id"), bucketOf(col("tok"), buckets).as("b"))
      .distinct()
      .groupBy("b").agg(count(lit(1)).as("df"))
      .collect()
      .map { r =>
        val b = r.getLong(0)
        // left-assoc a − b, matching the oracle's ln(N+1) − ln(df+1)
        b -> milliNats(math.log(n + 1.0) - math.log(r.getLong(1) + 1.0))
      }.toMap
  }

  private def idfLiteral(idf: Map[Long, Long], b: Column): Column =
    idf.toSeq.sortBy(_._1).foldLeft(lit(0L)) { case (acc, (bk, w)) =>
      when(b === lit(bk), lit(w)).otherwise(acc)
    }

  /** Sparse hashed TF-IDF vectors: (id, bucket, tf, w) with
    * w = tf · idf_milli(bucket). One explode + one (id, bucket) shuffle;
    * the idf is a literal CASE, map-side.
    */
  def hashedVectors(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64): DataFrame =
    hashedVectorsWithIdf(docs, idCol, textCol,
      idfMilli(docs, idCol, textCol, buckets), buckets)

  /** Vectorize against a FIXED fit — the fit-once/score-forever split
    * every store here follows (re-fitting per batch lets idf drift with
    * the batch mix, making vectors from different days incomparable).
    */
  def hashedVectorsWithIdf(docs: DataFrame, idCol: String, textCol: String,
      idf: Map[Long, Long], buckets: Int): DataFrame =
    tokens(docs, idCol, textCol)
      .select(col("id"), bucketOf(col("tok"), buckets).as("bucket"))
      .groupBy("id", "bucket").agg(count(lit(1)).as("tf"))
      .withColumn("w", col("tf") * idfLiteral(idf, col("bucket")))

  /** Persist the fit (overwrite: the table IS the fit, ≤ `buckets`
    * rows). Longs round-trip parquet exactly, so stored ≡ in-flight
    * bit-for-bit.
    */
  def saveIdf(docs: DataFrame, idCol: String, textCol: String,
      storePath: String, buckets: Int = 64): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    idfMilli(docs, idCol, textCol, buckets).toSeq.sortBy(_._1)
      .toDF("bucket", "idf").coalesce(1)
      .write.mode("overwrite").parquet(storePath)
  }

  def loadIdf(spark: org.apache.spark.sql.SparkSession,
      storePath: String): Map[Long, Long] =
    spark.read.parquet(storePath).select("bucket", "idf").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Squared L2 norms of the vectors: (id, n2). */
  def squaredNorms(vectors: DataFrame): DataFrame =
    vectors.groupBy("id").agg(sum(col("w") * col("w")).as("n2"))

  /** Cosine near-duplicate pairs over the hashed vectors,
    * cos(a,b) ≥ tauNum/tauDen, exact-integer test.
    *
    * Candidates: docs sharing a token with 2 ≤ df ≤ maxTokenDf — the
    * rare-term blocking of the postings family. RECALL TRADE (same as
    * ngramJaccardPairs): a pair sharing ONLY stop-tokens is never
    * examined; at near-dup thresholds genuine duplicates share rare
    * tokens too. Cost is Σ_token df² ≤ maxTokenDf · Σ df, linear in the
    * corpus for fixed cap.
    */
  def cosinePairs(docs: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64, maxTokenDf: Int = 20,
      tauNum: Int = 4, tauDen: Int = 5): DataFrame = {
    val toks = tokens(docs, idCol, textCol).distinct()
      .select(col("id"), xxhash64(col("tok")).as("t"))
    val keep = toks.groupBy("t").agg(count(lit(1)).as("df"))
      .filter(col("df").between(2, maxTokenDf))
      .select("t")
    // hot tokens are dropped via broadcast semi-join (the kept-token set
    // is df-capped small per key; broadcast keeps the postings join the
    // only wide exchange)
    val posted = toks.join(broadcast(keep), Seq("t"))
    val cands = posted.select(col("t"), col("id").as("id_a"))
      .join(posted.select(col("t"), col("id").as("id_b")), Seq("t"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()

    val vecs = hashedVectors(docs, idCol, textCol, buckets)
    val n2 = squaredNorms(vecs)
    val dots = cands
      .join(vecs.select(col("id").as("id_a"), col("bucket"), col("w").as("w_a")), Seq("id_a"))
      .join(vecs.select(col("id").as("id_b"), col("bucket"), col("w").as("w_b")), Seq("id_b", "bucket"))
      .groupBy("id_a", "id_b").agg(sum(col("w_a") * col("w_b")).as("dot"))
    val dec = DecimalType(38, 0)
    dots
      .join(n2.select(col("id").as("id_a"), col("n2").as("n2_a")), Seq("id_a"))
      .join(n2.select(col("id").as("id_b"), col("n2").as("n2_b")), Seq("id_b"))
      .filter(col("dot") > 0 &&
        lit(tauDen.toLong * tauDen) * col("dot").cast(dec) * col("dot").cast(dec) >=
          lit(tauNum.toLong * tauNum) * col("n2_a").cast(dec) * col("n2_b").cast(dec))
      .select("id_a", "id_b", "dot", "n2_a", "n2_b")
  }

  /** Near-duplicate REMOVAL over the TF-IDF cosine pairs: transitive
    * clusters collapse to their min-id survivor — the model-free twin of
    * [[Dedup.dropNearDuplicates]] (MinHash) and
    * [[Similarity.dropNearDuplicateEmbeddings]] (embeddings) for corpora
    * that have neither shingle budgets nor an embedding column. Shares
    * the size-adaptive connected-components + loser anti-join tail, so
    * the 100 TB fallbacks (distributed CC, shuffle anti-join past the
    * broadcast ceiling) come for free.
    */
  def dropNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      buckets: Int = 64, maxTokenDf: Int = 50,
      tauNum: Int = 4, tauDen: Int = 5): DataFrame = {
    val pairs = cosinePairs(df, idCol, textCol, buckets, maxTokenDf,
      tauNum, tauDen).select("id_a", "id_b")
    Dedup.dropClusterLosers(df, idCol, pairs, Dedup.broadcastMaxPairs)
  }
}
