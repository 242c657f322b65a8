package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data curation — subsampling and
  * data mixing at corpus scale need samples that are (a) reproducible
  * run-to-run and engine-to-engine, (b) stable under re-partitioning,
  * and (c) cheap. `rand()`-based sampling is none of these (seeded rand
  * is partition-layout dependent), so everything here keys off the
  * 60-bit md5 prefix of the row id ([[Dedup.md5Hash60]]):
  *
  *  - Bernoulli: a pure codegen'd filter — NO shuffle, no state; at
  *    100 TB it runs entirely map-side at scan speed.
  *  - Stratified top-n: one window shuffle on the stratum key; rows are
  *    ranked in hash order, so the per-stratum sample is a uniform
  *    without-replacement draw, again reproducible.
  *
  * Both are exactly replayable in ANSI/DuckDB SQL, so the correctness
  * gate checks the sampled SETS, not just counts.
  *
  * Nearest reference analog: none (SURVEY.md §2.6) — BASELINE
  * scale-extension surface alongside Dedup/Similarity.
  */
object Sampling {

  /** The sample key: uniform on [0, 2^60) for distinct ids. */
  def sampleKey(id: Column): Column = Dedup.md5Hash60(id.cast("string"))

  private val Space: Double = math.pow(2.0, 60)

  /** The inclusion threshold for a fraction, as the exact long literal
    * both the Spark filter and the SQL oracle embed.
    */
  def thresholdFor(fraction: Double): Long = {
    require(fraction >= 0.0 && fraction <= 1.0, s"fraction out of [0,1]: $fraction")
    if (fraction >= 1.0) Long.MaxValue else (fraction * Space).toLong
  }

  /** Deterministic Bernoulli sample: keep a row iff its hash falls in
    * the first `fraction` of the key space. Shuffle-free.
    */
  def bernoulliSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.filter(sampleKey(col(idCol)) < lit(thresholdFor(fraction)))

  /** Weighted mixture sampling: one deterministic Bernoulli draw with a
    * per-stratum fraction — the data-mixing primitive (e.g. keep 100% of
    * code, 30% of web crawl) done in a single pass. The per-row threshold
    * is a chained CASE of literals on the stratum column, so the whole
    * operator stays a pure codegen'd filter: NO shuffle, no join against
    * a fraction table, map-side at scan speed at 100 TB. Strata absent
    * from `fractions` (including a null stratum) fall back to
    * `defaultFraction`.
    */
  def mixtureSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      fractions: Map[String, Double],
      defaultFraction: Double = 0.0): DataFrame = {
    val dflt = lit(thresholdFor(defaultFraction))
    val threshold = fractions.toSeq.sortBy(_._1)
      .foldLeft(Option.empty[Column]) { case (acc, (stratum, f)) =>
        val branch = col(strataCol) === lit(stratum)
        Some(acc match {
          case None    => when(branch, lit(thresholdFor(f)))
          case Some(c) => c.when(branch, lit(thresholdFor(f)))
        })
      }
      .map(_.otherwise(dflt)).getOrElse(dflt)
    df.filter(sampleKey(col(idCol)) < threshold)
  }

  /** Deterministic fractional UPSAMPLING: emit each row
    * floor(rate) + Bernoulli(frac(rate)) times, with a 0-based
    * `copy_idx` — the data-mixing primitive [[mixtureSample]] cannot
    * express (mixture weights > 1, e.g. "repeat wiki 2.3 epochs" from
    * the Llama/GPT-3 mixture recipes). The fractional epoch is the same
    * seeded md5 draw as every sampler here, so reruns and engines agree
    * on WHICH rows get the extra copy.
    *
    * Scale shape: a literal-bounded `sequence` explode — pure codegen,
    * NO shuffle, output rows ≈ rate × input written at scan speed. The
    * copy index matters downstream: a later [[deterministicShuffle]]
    * keyed on (id, copy_idx) scatters the copies across the epoch
    * instead of training on them back-to-back.
    */
  def upsample(df: DataFrame, idCol: String, rate: Double,
      seed: Long): DataFrame = {
    require(rate >= 0.0, s"rate must be >= 0: $rate")
    val whole = math.floor(rate).toLong
    val frac = rate - whole
    val copies = lit(whole) +
      when(shuffleKey(col(idCol), seed) < lit(thresholdFor(frac)), 1L)
        .otherwise(0L)
    df.withColumn("__n", copies)
      .filter(col("__n") > 0)
      .withColumn("copy_idx", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n")
  }

  /** Deterministic train/val/test split assignment: label every row
    * with the first split whose CUMULATIVE hash threshold its sample
    * key falls under — the standard leakage-safe dataset partition: a
    * row always lands in the same split regardless of partition layout,
    * engine, or rerun, and the splits are disjoint and exhaustive by
    * construction (the last split absorbs the float-rounding tail).
    * Pure codegen'd projection — NO shuffle, scan-speed at 100 TB — and
    * exactly replayable in SQL from the same literal thresholds.
    */
  /** The cumulative split-boundary thresholds, as the EXACT long
    * literals both the Spark projection and a SQL oracle must embed —
    * shared so the double accumulation (0.8 + 0.1 is not 0.9 in
    * binary floating point) rounds identically on both sides. The last
    * split has no threshold: it absorbs the remainder.
    */
  def splitThresholds(splits: Seq[(String, Double)]): Seq[Long] = {
    require(splits.nonEmpty, "need at least one split")
    require(splits.forall(_._2 >= 0.0), "split fractions must be >= 0")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) <= 1e-9,
      s"split fractions must sum to 1, got $total")
    splits.map(_._2).scanLeft(0.0)(_ + _).tail.init.map(thresholdFor)
  }

  def assignSplits(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    val thresholds = splitThresholds(splits) // validates before .init below
    val key = sampleKey(col(idCol))
    val labeled = splits.init.zip(thresholds)
      .foldLeft(Option.empty[Column]) {
        case (acc, ((name, _), t)) =>
          val cond = key < lit(t)
          Some(acc match {
            case None    => when(cond, lit(name))
            case Some(c) => c.when(cond, lit(name))
          })
      }
    val splitCol = labeled
      .map(_.otherwise(lit(splits.last._1)))
      .getOrElse(lit(splits.last._1))
    df.withColumn("split", splitCol)
  }

  /** Deterministic stratified sample: the first `n` rows of each stratum
    * in (hash, id) order — a uniform without-replacement draw per
    * stratum.
    *
    * Scale shape: a naive single window would shuffle the WHOLE table and
    * sort a billion-row stratum to keep `n` rows. Instead each input
    * partition is first pruned to a local per-stratum top-n on the sample
    * key (a bounded heap in `mapPartitions` — per-partition imperative
    * state is the one place that API earns its keep), so at most
    * `numPartitions × n` rows per stratum reach the exact window. The
    * prune keeps a strict SUPERSET of the global top-n: a row is dropped
    * only when ≥ n rows of the same stratum in the same partition have a
    * strictly smaller key — such a row can never rank ≤ n globally,
    * whatever the id tiebreak says. Key ties at the boundary are kept, so
    * the final `row_number` window (same (hash, id) order) returns the
    * identical result to the naive formulation.
    */
  /** Corpus-mix report: per-source document/token/char totals plus each
    * source's share of the corpus token budget — the numbers a data-mix
    * design starts from. One partial-aggregated shuffle on the source
    * key. `tokenizer` picks the counting unit: whitespace words stay the
    * default (and the DuckDB-oracle path); a [[BpeTokenizer]] sizes the
    * mix in real tokenizer tokens, which is what the training run
    * actually consumes.
    */
  def corpusMixReport(
      df: DataFrame,
      sourceCol: String,
      textCol: String,
      tokenizer: Tokenizer = WhitespaceTokenizer): DataFrame = {
    val s = df
      .groupBy(sourceCol)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(size(tokenizer.tokenize(col(textCol))).cast("long")).as("n_tokens"),
        sum(length(col(textCol)).cast("long")).as("n_chars"))
    s.withColumn("token_frac",
      col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(Window.partitionBy()).cast("double"))
  }

  def stratifiedSample(
      df: DataFrame,
      strataCol: String,
      idCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.{Encoders, Row}
    val keyed = df.withColumn("__k", sampleKey(col(idCol)))
    val schema = keyed.schema
    val strataIdx = schema.fieldIndex(strataCol)
    val keyIdx = schema.fieldIndex("__k")
    val pruned = keyed.mapPartitions { rows =>
      // per-stratum max-heap of the n smallest keys seen in this partition;
      // null keys sort first (Spark's asc nulls-first), modeled as MinValue
      def keyOf(r: Row): Long =
        if (r.isNullAt(keyIdx)) Long.MinValue else r.getLong(keyIdx)
      val heaps = scala.collection.mutable.HashMap
        .empty[Any, scala.collection.mutable.PriorityQueue[Long]]
      rows.filter { r => // stateful lazy filter: rows stream, never buffer
        val k = keyOf(r)
        val heap = heaps.getOrElseUpdate(r.get(strataIdx),
          scala.collection.mutable.PriorityQueue.empty[Long])
        if (heap.size < n) { heap.enqueue(k); true }
        else if (k < heap.head) { heap.dequeue(); heap.enqueue(k); true }
        else k == heap.head // boundary ties kept → superset stays exact
      }
    }(Encoders.row(schema))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("__k"), col(idCol))
    pruned.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__rn", "__k")
  }

  /** Deterministic pseudo-random shuffle key: where a row lands in the
    * training order, as a pure function of (id, seed). Training-data
    * prep needs the corpus order randomized (dedup/curation leave it
    * clustered by source) but REPRODUCIBLE — rerunning the pipeline must
    * produce the identical epoch order, and changing the seed must
    * produce an independent one. `rand()` is partition-layout dependent;
    * this is not.
    */
  def shuffleKey(id: Column, seed: Long): Column =
    Dedup.md5Hash60(concat(id.cast("string"), lit(":"), lit(seed.toString)))

  /** The shuffle action: range-partition + sort by the deterministic
    * key, so a subsequent write materializes the corpus in seeded
    * pseudo-random order with `partitions` roughly equal output files.
    * One range shuffle — the cost any global reorder necessarily pays.
    */
  def deterministicShuffle(df: DataFrame, idCol: String, seed: Long,
      partitions: Int): DataFrame =
    df.withColumn("__sk", shuffleKey(col(idCol), seed))
      .repartitionByRange(partitions, col("__sk"))
      .sortWithinPartitions("__sk")
      .drop("__sk")

  // ---------------------------------------------------------------------
  // DSIR importance resampling (Xie et al. 2023, "Data Selection for
  // Language Models via Importance Resampling"): score every raw document
  // by how target-like its hashed-unigram distribution is, then draw a
  // Gumbel top-k — the standard recipe for carving a domain-matched
  // subset out of a web-scale corpus.
  //
  // Cross-engine determinism is the design driver: per-bucket log ratios
  // are computed ONCE (driver-side, from exact integer counts), quantized
  // to micro-nats (×1e6, half-up), and embedded as a literal array — so
  // the per-document score is an exact INTEGER sum (order-independent,
  // overflow-free: |micro-ratio| < ~2e7, docs are < 1e5 tokens) and the
  // oracle replays it bit-for-bit. The Gumbel perturbation is a pure
  // function of (id, seed) through the same md5 key as every sampler
  // here, quantized the same way.
  //
  // Scale shape: two token passes (fit: two B-row aggregates collected
  // driver-side — B longs, not data; score: one explode + one narrow
  // (id, long) shuffle) and a bounded-heap top-k
  // (TakeOrderedAndProject) — no global sort, nothing wide.
  // ---------------------------------------------------------------------

  /** Hashed-unigram feature bucket of a token ([0, buckets)). */
  def dsirBucket(token: Column, buckets: Int): Column =
    Dedup.md5Hash60(token) % buckets

  /** Micro-nat quantization: floor(x·1e6 + 0.5) — explicit half-up in
    * BOTH engines (Math.round and SQL round() disagree on negative
    * halves).
    */
  def microNats(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong

  /** Per-document (bucket, tf) rows, fully MAP-SIDE via the shared
    * [[graft.functions.TfidfBucketTfs]] kernel (same md5-60 feature
    * hash as [[dsirBucket]], md5 run once per DISTINCT token per doc) —
    * replaces the per-token explode + per-occurrence md5. Every
    * consumer aggregates Σtf, which equals the former per-token-row
    * count exactly.
    */
  private def bucketTfs(df: DataFrame, idCol: String, textCol: String,
      buckets: Int): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.TfidfBucketTfs(col(textCol), buckets))
        .as("__bt"))

  /** Per-document importance score: `score` = Σ over the document's
    * tokens of the quantized log p_target/p_raw of the token's bucket
    * (Laplace-smoothed), in micro-nats, plus the token count. Buckets
    * never seen in `raw` get ratio 0 — they are unreachable from the
    * scoring pass by construction (every scored token IS a raw token).
    */
  def importanceWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 64): DataFrame =
    importanceWeightsFromStore(raw,
      importanceRatios(raw, target, idCol, textCol, buckets),
      idCol, textCol, buckets)

  /** The fitted ratio table behind [[importanceWeights]] as data:
    * (bucket, micro-nat weight) for every bucket seen in `raw` —
    * `buckets` rows at most. Persist it once
    * ([[saveImportanceRatios]]) and score any future batch against the
    * SAME fitted distributions without re-reading either corpus — the
    * fit-once/score-forever split every incremental store here follows
    * (a re-fit on each batch would let the reference distributions
    * drift with the batch mix).
    */
  def importanceRatios(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 64): DataFrame = {
    val spark = raw.sparkSession
    import spark.implicits._
    def counts(t: DataFrame): Map[Long, Long] =
      bucketTfs(t, idCol, textCol, buckets)
        .groupBy(col("__bt.bucket").as("__b"))
        .agg(sum(col("__bt.tf")).as("c")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cq = counts(raw)
    val ct = counts(target)
    val nq = cq.values.sum
    val nt = ct.values.sum
    cq.toSeq.sortBy(_._1).map { case (b, cqB) =>
      // evaluation order pinned to the oracle's left-assoc a-b-c+d
      b -> microNats(math.log(ct.getOrElse(b, 0L) + 1.0) -
        math.log(nt + buckets.toDouble) -
        math.log(cqB + 1.0) + math.log(nq + buckets.toDouble))
    }.toDF("bucket", "weight")
  }

  /** Fit and persist the ratio table (overwrite: the table IS the fit,
    * not an append log).
    */
  def saveImportanceRatios(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, storePath: String, buckets: Int = 64): Unit =
    importanceRatios(raw, target, idCol, textCol, buckets)
      .write.mode("overwrite").parquet(storePath)

  /** Read a persisted ratio table. Unlike the dedup stores, a MISSING
    * store is an ERROR, not a bootstrap — scoring against an absent fit
    * has no meaningful semantics.
    */
  def readImportanceRatios(spark: org.apache.spark.sql.SparkSession,
      storePath: String): DataFrame =
    spark.read.parquet(storePath)

  /** Score a batch against a persisted fit: the ratio table (≤ buckets
    * rows) collects driver-side and rides as the same literal array the
    * in-flight path builds — map-side scoring, one narrow (id, long)
    * shuffle, the reference corpora never touched.
    */
  def importanceWeightsFromStore(batch: DataFrame, ratios: DataFrame,
      idCol: String, textCol: String, buckets: Int = 64): DataFrame = {
    val iw = {
      val m = ratios.select(col("bucket"), col("weight")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      (0 until buckets).map(b => m.getOrElse(b.toLong, 0L))
    }
    val iwArr = array(iw.map(lit(_)): _*)
    bucketTfs(batch, idCol, textCol, buckets)
      .groupBy(col(idCol))
      .agg(sum(col("__bt.tf")).cast("long").as("n_tokens"),
        sum(col("__bt.tf") *
          element_at(iwArr, (col("__bt.bucket") + 1).cast("int"))).as("score"))
  }

  /** Gumbel top-k selection over the importance scores: keep the `k`
    * documents with the highest `score + Gumbel(id, seed)` (quantized to
    * micro-nats), ties broken by id. The Gumbel key makes the draw a
    * weighted sample WITHOUT replacement under the softmax of the
    * scores — re-running selects the identical set, a new seed an
    * independent one. Plans as TakeOrderedAndProject: bounded per-task
    * heaps, no global sort.
    */
  def importanceResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 64, seed: Long = 42L): DataFrame = {
    val scored = importanceWeights(raw, target, idCol, textCol, buckets)
    // u ∈ (0,1) exactly representable: (60-bit key + 0.5) / 2^60 — the
    // +0.5 keeps u off 0, the power-of-two division is exact
    val u = (shuffleKey(col(idCol), seed) + lit(0.5)) / lit(Space)
    val gumbel = floor(-log(-log(u)) * lit(1e6) + lit(0.5))
    scored
      .withColumn("gscore", col("score") + gumbel)
      .orderBy(col("gscore").desc, col(idCol))
      .limit(k)
  }
}
