package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** N-gram language-model scoring for corpus quality filtering — the
  * CCNet recipe (Wenzek et al. 2020): score every document under a
  * reference language model and filter/bucket by per-token log
  * probability. Real CCNet uses a KenLM 5-gram; the distributed
  * re-expression here is a Stupid-Backoff bigram model (Brants et al.
  * 2007 — the backoff score was DESIGNED for distributed map-reduce
  * fitting, which is exactly what a Spark groupBy is):
  *
  *   S(w2 | w1) = count(w1 w2) / count(w1 ·)          if seen
  *              = 0.4 · (count(w2) + 1) / (T + V)     otherwise
  *
  * (the unseen branch adds add-one smoothing over the unigram table so
  * out-of-vocabulary tokens score finitely; T = total fit tokens, V =
  * fit vocabulary size).
  *
  * Determinism follows the DSIR/BM25 idiom: the model tables store
  * exact integer COUNTS (never floats, so the persisted store
  * round-trips bit-for-bit), each bigram's log score quantizes to
  * micro-nats (floor(ln(·)·1e6 + 0.5)) with the double arithmetic
  * association pinned to the SQL oracle's, and the per-document score
  * is an order-independent BIGINT sum.
  *
  * Scale shape (the 100 TB story):
  *  - FIT is two narrow shuffles over fixed-width token keys (bigram
  *    counts, then context counts) — partial aggregation everywhere,
  *    document text never shuffles; the only driver-side data is two
  *    longs (T, V).
  *  - the model is DATA, not a literal: vocabulary is unbounded, so
  *    scoring joins the batch's distinct (doc, w1, w2) rows against the
  *    count tables on token keys — a key-partitioned shuffle join whose
  *    left side is bounded by the batch, with the unigram side only
  *    consulted for bigram misses.
  *  - SCORE of a batch is one explode + one (doc, w1, w2) aggregate +
  *    the model joins + one narrow per-doc aggregate. Fit once, score
  *    every future batch against the frozen fit (a per-batch re-fit
  *    would let the reference LM drift with the batch mix — same
  *    argument as the DSIR ratio store).
  *
  * Nearest reference analog: none (SURVEY.md §2.6 scale-extension
  * surface) — this is the perplexity-quality leg a training-data
  * pipeline runs between langid and dedup.
  */
object LanguageModel {

  /** Stupid-Backoff discount α (Brants et al. 2007 use 0.4). */
  val DefaultBackoff: Double = 0.4

  /** A fitted bigram LM: exact count tables plus the two corpus
    * scalars. `bigrams` is (w1, w2, cb, c1) with the context count
    * denormalized in; `unigrams` is (w, cu).
    */
  final case class BigramModel(bigrams: DataFrame, unigrams: DataFrame,
      totalTokens: Long, vocabSize: Long)

  /** Shared whitespace tokenization (identical to DSIR / BM25 and the
    * oracle's `list_filter(string_split_regex(trim(lower(text)),
    * '\s+'), t -> t <> '')`), kept as an ARRAY so bigrams can pair
    * adjacent positions without a positional self-join.
    */
  /** Per-document distinct adjacent bigram counts: (id, w1, w2, n),
    * fully MAP-SIDE — one [[graft.functions.BigramTfs]] kernel call per
    * row (same tokenizer as the former filter(split(...)) + transform;
    * sub-2-token docs yield no rows). The former per-occurrence explode
    * paid a corpus-wide groupBy(id, w1, w2) exchange in the scorer;
    * the kernel pre-aggregates within the document, which is all that
    * grouping ever mixed.
    */
  def bigramCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
        explode(graft.functions.BigramTfs(col(textCol))).as("__p"))
      .select(col(idCol), col("__p.w1").as("w1"), col("__p.w2").as("w2"),
        col("__p.n").as("n"))

  /** Fit the model on a corpus: bigram counts, context counts
    * (denormalized onto the bigram row), unigram counts, and the (T, V)
    * scalars — the scalars are the only driver-side collect (one row,
    * two longs). Both count aggregates consume the per-document
    * pre-aggregated kernel rows (sum of within-doc counts ≡ the former
    * per-occurrence count), so the exchanges carry one row per distinct
    * (doc, gram), never one per occurrence.
    */
  def fitBigramModel(corpus: DataFrame, idCol: String, textCol: String): BigramModel = {
    val cb = bigramCounts(corpus, idCol, textCol)
      .groupBy("w1", "w2").agg(sum("n").as("cb"))
    val c1 = cb.groupBy("w1").agg(sum("cb").as("c1"))
    val bigrams = cb.join(c1, "w1").select("w1", "w2", "cb", "c1")
    val unigrams = corpus
      .select(explode(graft.functions.TokenTfLen(col(textCol))
        .getField("tfs")).as("__t"))
      .groupBy(col("__t.tok").as("w")).agg(sum(col("__t.tf")).as("cu"))
    val r = unigrams
      .agg(coalesce(sum("cu"), lit(0L)).cast("long"), count(lit(1)).cast("long"))
      .collect()(0)
    BigramModel(bigrams, unigrams, r.getLong(0), r.getLong(1))
  }

  /** Score a batch under a fitted model. Output: one row per document
    * with at least one bigram — (id, n_bigrams, lognat_sum,
    * avg_lognat), where `lognat_sum` is the exact BIGINT micro-nat sum
    * of per-bigram log scores and `avg_lognat` is the ONE double
    * division at the end (higher = more in-distribution; CCNet filters
    * on exactly this per-token average).
    */
  def scoreBigrams(batch: DataFrame, model: BigramModel, idCol: String,
      textCol: String, backoff: Double = DefaultBackoff): DataFrame = {
    val denom = (model.totalTokens + model.vocabSize).toDouble
    // per-doc (w1, w2, n) is map-side (kernel) — the former
    // groupBy(id, w1, w2) exchange is gone; only the model joins and
    // the final per-doc rollup shuffle
    val bgn = bigramCounts(batch, idCol, textCol)
    // association pinned to the oracle: ln(cb/c1); ln((α·(cu+1))/(T+V))
    val lp = when(col("cb").isNotNull,
        floor(log(col("cb").cast("double") / col("c1").cast("double"))
          * lit(1e6) + lit(0.5)))
      .otherwise(
        floor(log(lit(backoff) * (coalesce(col("cu"), lit(0L)) + lit(1L)).cast("double")
          / lit(denom)) * lit(1e6) + lit(0.5)))
      .cast("long")
    bgn
      .join(model.bigrams, Seq("w1", "w2"), "left")
      .join(model.unigrams.withColumnRenamed("w", "w2"), Seq("w2"), "left")
      .withColumn("__lp", lp)
      .groupBy(col(idCol))
      .agg(sum("n").cast("long").as("n_bigrams"),
        sum(col("n") * col("__lp")).cast("long").as("lognat_sum"))
      .withColumn("avg_lognat",
        col("lognat_sum").cast("double") / col("n_bigrams").cast("double"))
  }

  /** Fit + score in one call (the in-flight form — both paths go
    * through [[scoreBigrams]], so store and in-flight are one code
    * path).
    */
  def scoreAgainstCorpus(corpus: DataFrame, batch: DataFrame, idCol: String,
      textCol: String, backoff: Double = DefaultBackoff): DataFrame =
    scoreBigrams(batch, fitBigramModel(corpus, idCol, textCol),
      idCol, textCol, backoff)

  /** Schema-preserving CCNet-style filter: keep rows whose per-bigram
    * average log score under `model` is at least `minAvgLognat`,
    * given in NATS per bigram (e.g. -12.0 ≈ perplexity e^12; the
    * comparison scales it to the micro-nat average internally).
    * Documents too short to score (< 2
    * tokens) drop: an LM filter that passes unscorable text waves
    * through exactly the fragments the quality gate exists to catch.
    * One semi-join on the id — the input row survives untouched.
    */
  def filterByScore(df: DataFrame, model: BigramModel, idCol: String,
      textCol: String, minAvgLognat: Double,
      backoff: Double = DefaultBackoff): DataFrame = {
    val keep = scoreBigrams(df, model, idCol, textCol, backoff)
      .filter(col("avg_lognat") >= minAvgLognat * 1e6)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** CCNet's final step: split each stratum (CCNet uses language) into
    * `k` equal RANK buckets of the LM score — bucket 0 = head (most
    * in-distribution), k−1 = tail. Rank buckets, not value thresholds:
    * CCNet's head/middle/tail are corpus terciles by construction, and
    * rank arithmetic keeps the bucket assignment integer-exact
    * cross-engine (the score only ever ORDERS, never divides).
    *
    * Input is a scored frame ([[scoreBigrams]] output joined with the
    * stratum column); output (id, stratum, rank, bucket) — all BIGINTs.
    * One narrow window shuffle on the stratum key: at corpus scale the
    * shuffle carries (id, stratum, score) rows, never text. A stratum
    * is a language — tens of partitions, each potentially huge; for a
    * skew-free formulation at 100 TB the rank window is the same shape
    * as the stratified sampler's (bounded state per key, no global
    * sort).
    */
  def rankBuckets(scored: DataFrame, stratumCol: String, idCol: String,
      k: Int = 3, scoreCol: String = "avg_lognat"): DataFrame = {
    require(k > 0, s"bucket count must be positive: $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(stratumCol).orderBy(col(scoreCol).desc, col(idCol))
    val wn = org.apache.spark.sql.expressions.Window.partitionBy(stratumCol)
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("__n", count(lit(1)).over(wn))
      .withColumn("bucket",
        floor(((col("rank") - 1) * k).cast("double") / col("__n").cast("double"))
          .cast("long"))
      .select(col(idCol), col(stratumCol), col("rank"), col("bucket"))
  }

  // ------------------------------------------------------- persisted model

  /** Persist a fitted model (overwrite — the store IS the fit, not an
    * append log; same contract as the DSIR ratio store). Counts are
    * longs and tokens strings, so the round trip is value-exact.
    */
  def saveModel(model: BigramModel, storePath: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$storePath/bigrams")
    model.unigrams.write.mode("overwrite").parquet(s"$storePath/unigrams")
    model.bigrams.sparkSession.range(1)
      .select(lit(model.totalTokens).as("total_tokens"),
        lit(model.vocabSize).as("vocab_size"))
      .write.mode("overwrite").parquet(s"$storePath/_meta")
  }

  /** Load a persisted model. A MISSING store is an error, not a
    * bootstrap — scoring against an absent fit has no semantics.
    *
    * If the store has pending count DELTAS ([[appendModelCounts]]),
    * they merge at load: counts are exactly additive, so base + deltas
    * re-aggregated is bit-identical to a joint fit over all the
    * corpora. The merged path pays one extra (w1, w2) aggregate per
    * load — run [[compactModel]] to fold deltas into the base and
    * restore the zero-merge fast path.
    */
  def loadModel(spark: SparkSession, storePath: String): BigramModel = {
    val meta = spark.read.parquet(s"$storePath/_meta").collect()(0)
    val base = BigramModel(
      spark.read.parquet(s"$storePath/bigrams"),
      spark.read.parquet(s"$storePath/unigrams"),
      meta.getAs[Long]("total_tokens"), meta.getAs[Long]("vocab_size"))
    if (!deltasExist(spark, storePath)) base
    else {
      val cb = base.bigrams.select("w1", "w2", "cb")
        .unionByName(spark.read.parquet(s"$storePath/deltas/bigrams"))
        .groupBy("w1", "w2").agg(sum("cb").as("cb"))
      val c1 = cb.groupBy("w1").agg(sum("cb").as("c1"))
      val unigrams = base.unigrams
        .unionByName(spark.read.parquet(s"$storePath/deltas/unigrams"))
        .groupBy("w").agg(sum("cu").as("cu"))
      val r = unigrams
        .agg(coalesce(sum("cu"), lit(0L)).cast("long"), count(lit(1)).cast("long"))
        .collect()(0)
      BigramModel(cb.join(c1, "w1").select("w1", "w2", "cb", "c1"),
        unigrams, r.getLong(0), r.getLong(1))
    }
  }

  /** Append one corpus batch's RAW counts as a delta — no read, list,
    * or rewrite of existing store data (the append-only shape a
    * long-running ingester needs; the dedup stores' contract). The
    * denormalized context count c1 and the (T, V) scalars are NOT
    * stored in deltas — they are global aggregates that would go stale
    * on the next append, so [[loadModel]] recomputes them over the
    * merged counts. Keep the reference fit FROZEN (the DSIR-store
    * argument) unless the model is meant to track the ingested corpus
    * itself — appending batch text to a reference LM drifts the very
    * distribution the quality gate filters against.
    */
  def appendModelCounts(corpus: DataFrame, idCol: String, textCol: String,
      storePath: String): Unit = {
    bigramCounts(corpus, idCol, textCol)
      .groupBy("w1", "w2").agg(sum("n").as("cb"))
      .write.mode("append").parquet(s"$storePath/deltas/bigrams")
    corpus
      .select(explode(graft.functions.TokenTfLen(col(textCol))
        .getField("tfs")).as("__t"))
      .groupBy(col("__t.tok").as("w")).agg(sum(col("__t.tf")).as("cu"))
      .write.mode("append").parquet(s"$storePath/deltas/unigrams")
  }

  /** Fold pending deltas into the base tables and remove them, via a
    * temp-dir swap (the base cannot be overwritten while the merged
    * plan still reads it). After compaction [[loadModel]] is back on
    * the zero-merge path; scores are unchanged (counts are counts).
    */
  def compactModel(spark: SparkSession, storePath: String): Unit = {
    if (!deltasExist(spark, storePath)) return
    val merged = loadModel(spark, storePath)
    val tmp = s"$storePath/_compact_tmp"
    saveModel(merged, tmp) // materializes FROM the old files into tmp
    val fs = new org.apache.hadoop.fs.Path(storePath)
      .getFileSystem(spark.sessionState.newHadoopConf())
    for (d <- Seq("bigrams", "unigrams", "_meta", "deltas"))
      fs.delete(new org.apache.hadoop.fs.Path(s"$storePath/$d"), true)
    for (d <- Seq("bigrams", "unigrams", "_meta"))
      fs.rename(new org.apache.hadoop.fs.Path(s"$tmp/$d"),
        new org.apache.hadoop.fs.Path(s"$storePath/$d"))
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  private def deltasExist(spark: SparkSession, storePath: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$storePath/deltas/bigrams")
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }
}
