package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — the train/test hygiene pass every LLM
  * data pipeline runs before training: find corpus documents that share
  * word n-grams with a held-out evaluation set, so they can be dropped
  * (or down-weighted) to avoid leaking test data into the train mix.
  *
  * Scale shape (corpus = 100 TB, benchmark = thousands of docs, i.e.
  * wildly asymmetric by construction):
  *  - the benchmark side is shingled, dedup'd, and BROADCAST — the only
  *    full pass over the corpus is one broadcast hash join on the
  *    exploded shingles, entirely map-side; the corpus text/shingles are
  *    never shuffled.
  *  - only matching (doc, shingle) rows survive into the per-doc count,
  *    so the single shuffle is bounded by the contamination volume, not
  *    the corpus.
  * Shingles join on their strings (not an 8-byte hash) so the DuckDB
  * oracle replays the operator exactly; the join build side is the tiny
  * benchmark set, so the string width costs CPU, not network.
  *
  * Nearest reference analog: none (SURVEY.md §2.6) — scale-extension
  * surface alongside [[Dedup]]/[[Sampling]].
  */
object Decontaminate {

  /** Per-document contamination report for `corpus` against `bench`:
    * `(id, n_hits, contaminated)` where `n_hits` counts the DISTINCT
    * shingles shared with ANY benchmark document. Every corpus row
    * appears (docs too short to shingle report 0 hits).
    */
  def contaminationReport(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3): DataFrame = {
    val benchSh = bench
      .select(explode(Dedup.wordShingles(col(textCol), shingleN)).as("g"))
      .distinct()
    val corpusSh = corpus.select(
      col(idCol), explode(Dedup.wordShingles(col(textCol), shingleN)).as("g"))
    // wordShingles is per-doc distinct, so count(*) here = distinct hits
    val hits = corpusSh.join(broadcast(benchSh), "g")
      .groupBy(idCol).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_hits").isNotNull.as("contaminated"))
  }

  /** The train-mix cut: corpus rows with fewer than `maxHits` shared
    * shingles (default: none at all). Same plan as the report plus one
    * map-side filter.
    */
  def dropContaminated(
      corpus: DataFrame,
      bench: DataFrame,
      idCol: String,
      textCol: String,
      shingleN: Int = 3,
      maxHits: Long = 0L): DataFrame =
    corpus.join(
      contaminationReport(corpus, bench, idCol, textCol, shingleN)
        .filter(col("n_hits") > maxHits)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}
