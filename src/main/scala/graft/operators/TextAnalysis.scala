package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality signals, stopword-based language identification, and content
  * fingerprinting. Pure Column expressions (codegen-friendly, no UDFs);
  * every output is deterministic so the DuckDB oracle can replicate it.
  */
object TextAnalysis {

  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword segment count: word runs + isolated non-word chars
    * (the usual pre-tokenizer regex `\w+|[^\w\s]`).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\w+|[^\\w\\s]"), lit(0))).cast("long")

  /** Mean token length (characters per token). The numerator — the sum of
    * token lengths — is computed as `length(text with all whitespace
    * removed)`: split on `\s+` partitions the string into tokens and
    * separators, so the two are identical, and the length arithmetic
    * stays in whole-stage codegen where the equivalent
    * `aggregate(transform(...))` HOF is interpreted per token.
    */
  def meanTokenLen(text: Column): Column = {
    val lt = lower(trim(text))
    length(regexp_replace(lt, "\\s+", "")).cast("double") /
      size(split(lt, "\\s+")).cast("double")
  }

  /** Ratio of punctuation characters (ASCII punct class). NULL for empty
    * text: a 0/0 here is an ANSI DIVIDE_BY_ZERO that would kill a whole
    * job on one empty document (real corpora have them); consumers
    * treat the null as "rule does not apply" via coalesce.
    */
  def punctRatio(text: Column): Column = {
    val len = length(text).cast("double")
    (length(text) - length(regexp_replace(text, "[\\p{Punct}]", "")))
      .cast("double") / when(len > 0, len)
  }

  /** Per-language stopword lists (tiny, classic top-10 function words). */
  val Stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "in", "den", "von", "zu", "das", "mit", "sich"),
    "en" -> Seq("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "ser", "se", "no"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "en", "un", "du", "une"),
    "zh" -> Seq("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"))

  /** Count of tokens found in a stopword list — a native codegen'd kernel
    * ([[graft.functions.StopwordCounts]]); the HOF `filter` + `isin`
    * formulation it replaced was interpreted per token with a linear
    * word-list scan per token.
    */
  def stopwordCount(text: Column, words: Seq[String]): Column =
    graft.functions.StopwordCounts(text, Seq(words)).getItem(0)

  /** Stopword ratio against the union of all lists (a generic fluency
    * signal).
    */
  def stopwordRatio(text: Column): Column = {
    val all = Stopwords.flatMap(_._2).distinct
    val tc = tokenCount(text).cast("double")
    // null (not ANSI 0/0) on tokenless text, same contract as punctRatio
    stopwordCount(text, all).cast("double") / when(tc > 0, tc)
  }

  /** Winner-takes-all over (lang, score) columns; ties broken by the
    * given order (language code ascending).
    */
  def detectFromScores(scores: Seq[(String, Column)]): Column =
    scores.foldRight(lit(scores.last._1)) { case ((lang, s), elseCol) =>
      val isMax = scores.filter(_._1 != lang)
        .map { case (_, o) => s >= o }
        .reduce(_ && _)
      when(isMax, lit(lang)).otherwise(elseCol)
    }

  /** Stopword-scoring language ID. ONE [[graft.functions.StopwordCounts]]
    * kernel call tokenizes each row once and scores all five lists; the
    * score columns are element extractions and the argmax a second
    * projection — so tokenization runs once per row, not once per
    * language or comparison.
    */
  def withDetectedLanguage(df: DataFrame, textCol: String,
      outCol: String = "detected_lang"): DataFrame = {
    val counts = df.withColumn("__sw",
      graft.functions.StopwordCounts(col(textCol), Stopwords.map(_._2)))
    val scored = Stopwords.zipWithIndex.foldLeft(counts) {
      case (d, ((lang, _), i)) => d.withColumn(s"s_$lang", col("__sw").getItem(i))
    }
    scored.withColumn(outCol,
        detectFromScores(Stopwords.map { case (l, _) => l -> col(s"s_$l") }))
      .drop("__sw")
  }

  /** Quality-signal bundle, one column each.
    *
    * NOTE for pipeline authors: each signal references `textCol`
    * independently, so if the column is an EXPENSIVE derived expression
    * (an html-extract/normalize regex chain), Catalyst's alias
    * substitution can inline that chain once per signal — recomputing
    * it ~6× per row and, past ~10 KB of generated code per copy,
    * busting the JVM's 64 KB method limit (Spark then silently runs
    * the stage interpreted). Materialize the derived text first
    * (persist / write) before stacking signal consumers — the curation
    * block does this automatically (JobRunner.applyCuration's rewrite
    * barrier, pinned by CodegenCompileSpec).
    */
  def withQualitySignals(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("token_count", tokenCount(c))
      .withColumn("char_count", length(c).cast("long"))
      .withColumn("mean_token_len", meanTokenLen(c))
      .withColumn("punct_ratio", punctRatio(c))
      .withColumn("stopword_ratio", stopwordRatio(c))
  }

  /** 128-bit content fingerprint (md5 of whitespace-normalized lowercase
    * text) — same definition as Dedup.fingerprint.
    */
  def fingerprint(text: Column): Column = Dedup.fingerprint(text)

  /** Canonical text cleanup before fingerprinting/shingling: Unicode
    * NFC (native kernel — composed and decomposed forms of the same
    * grapheme must fingerprint identically), CRLF/CR → LF, control
    * characters stripped (C0 except tab/newline, plus DEL), horizontal
    * whitespace collapsed, ends trimmed. Every step is codegen'd
    * (kernel + regexp_replace) — map-side, shuffle-free, scan-speed at
    * 100 TB — and each regex is in the Java∩RE2 subset so DuckDB
    * replays the whole chain byte-for-byte (`nfc_normalize` and
    * java.text.Normalizer both implement UAX #15).
    */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(
      graft.functions.NfcNormalize(text),
      "\\r\\n?", "\n"),
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[ \\t]+", " "))

  /** Kept lines of a document under the C4 line rules (Raffel et al.
    * 2020 §2.2), joined by `\n` — native codegen'd kernel, one static
    * call per row ([[graft.functions.C4KeepLines]]).
    */
  def c4KeepLines(text: Column, minWords: Int = 3): Column =
    graft.functions.C4KeepLines(text, minWords)

  /** Full C4 document cleanup: line-level filtering (terminal
    * punctuation, `minWords`, no `javascript`) plus the document-level
    * cuts — fewer than `minLines` surviving lines, "lorem ipsum"
    * anywhere (case-insensitive), or a curly brace (code markers are
    * judged on the ORIGINAL text, like C4, so a brace on a dropped line
    * still kills the page). Survivors keep (id, kept_lines, cleaned
    * text). Map-side filter + projection: NO shuffle at any scale —
    * the whole pass runs at scan speed over 100 TB.
    */
  private def c4DocKeep(cleanCol: Column, origCol: Column, minLines: Int): Column =
    cleanCol =!= "" &&
      size(split(cleanCol, "\n")) >= minLines &&
      !contains(lower(origCol), lit("lorem ipsum")) &&
      !contains(origCol, lit("{"))

  def c4LineFilter(df: DataFrame, idCol: String, textCol: String,
      minWords: Int = 3, minLines: Int = 3): DataFrame =
    df.withColumn("__c4_clean", c4KeepLines(col(textCol), minWords))
      .filter(c4DocKeep(col("__c4_clean"), col(textCol), minLines))
      .select(col(idCol),
        size(split(col("__c4_clean"), "\n")).cast("long").as("kept_lines"),
        col("__c4_clean").as(textCol))

  /** FineWeb-style line-structure signals (Penedo et al. 2024 §3.1 —
    * the filters FineWeb adds on top of the C4/Gopher families judge
    * LINE composition, not word composition): per document over its
    * non-empty space-trimmed lines,
    *  - `n_lines` — line count,
    *  - `ellipsis_line_frac` — lines ending in `...` (truncated
    *    previews / "read more" stubs),
    *  - `bullet_line_frac` — lines starting with `-` or `*`
    *    (list-dominated pages),
    *  - `dup_line_char_frac` — fraction of line CHARACTER mass on
    *    lines occurring more than once in the document (nav chrome,
    *    repeated footers).
    * Shape: one explode + two-level aggregation — (doc, line) then
    * doc — so everything partial-aggregates; only (id, line-hash
    * width) rows shuffle, and each fraction is ONE double division of
    * exact integer sums (cross-engine deterministic, same as the
    * packing-efficiency rollup). Docs with no non-empty lines have no
    * row (nothing to judge).
    */
  def lineSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val lines = df
      .select(col(idCol), explode(split(col(textCol), "\n")).as("__l"))
      .select(col(idCol), trim(col("__l")).as("__l"))
      .filter(col("__l") =!= "")
    val perLine = lines.groupBy(col(idCol), col("__l"))
      .agg(count(lit(1)).as("__cnt"))
    val chars = length(col("__l")) * col("__cnt")
    perLine.groupBy(col(idCol)).agg(
      sum(col("__cnt")).cast("long").as("n_lines"),
      (sum(when(col("__l").endsWith("..."), col("__cnt")).otherwise(0L)) /
        sum(col("__cnt"))).as("ellipsis_line_frac"),
      (sum(when(col("__l").startsWith("-") || col("__l").startsWith("*"),
        col("__cnt")).otherwise(0L)) /
        sum(col("__cnt"))).as("bullet_line_frac"),
      (sum(when(col("__cnt") >= 2, chars).otherwise(0L)) /
        sum(chars)).as("dup_line_char_frac"))
  }

  /** Schema-preserving C4 cleanup for the in-job `curation:` block:
    * same rules as [[c4LineFilter]], but failing documents are dropped
    * and survivors keep EVERY original column with `textCol` rewritten
    * to the kept lines — a sink row must still match the asset
    * contract. Map-side filter + projection, shuffle-free.
    */
  def c4QualityFilterRows(df: DataFrame, textCol: String,
      minWords: Int = 3, minLines: Int = 3): DataFrame =
    df.withColumn("__c4_clean", c4KeepLines(col(textCol), minWords))
      .filter(c4DocKeep(col("__c4_clean"), col(textCol), minLines))
      .withColumn(textCol, col("__c4_clean"))
      .drop("__c4_clean")

  /** Gopher-style REPETITION signals (Rae et al. 2021 §A1.1 quality
    * filters; also used by C4/RefinedWeb-class pipelines): documents
    * dominated by a few repeated words/n-grams are boilerplate or spam.
    * Per document:
    *  - `n_words` — whitespace token count,
    *  - `dup_word_frac` — 1 − distinct/total words (repeated-token mass),
    *  - `top_word_frac` — occurrences of the most frequent word / total,
    *  - `top_bigram_frac` — occurrences of the most frequent word bigram
    *    / total bigrams (null when the document has < 2 words).
    *
    * Scale shape: one explode + two hash aggregations (doc×word, then
    * doc) — partial aggregation keeps the shuffle narrow; the bigram
    * needs one window over (doc, position), which shares the doc-id
    * shuffle. No raw text is shuffled, only (id, word) pairs.
    *
    * Ties on the max count resolve identically in any engine (max of
    * counts, not argmax of words), so the whole bundle oracles exactly.
    */
  /** Thresholds for [[gopherQualityReport]] — the Gopher §A1.1 rule
    * shapes (word-count window, mean-word-length window, symbol and
    * repetition caps), with defaults tuned so the synthetic corpus
    * splits rather than all-passing. Every rule is a pure comparison
    * over signals this file already defines.
    */
  case class GopherThresholds(
      minWords: Long = 30,
      maxWords: Long = 100000,
      minMeanTokenLen: Double = 2.0,
      maxMeanTokenLen: Double = 12.0,
      maxPunctRatio: Double = 0.2,
      maxDupWordFrac: Double = 0.6,
      maxTopWordFrac: Double = 0.12,
      maxTopBigramFrac: Double = 0.2)

  /** Composite Gopher-style quality verdict: one row per document with a
    * boolean per failed rule plus the overall `keep`. Rules over
    * missing repetition signals (docs too short for bigrams) count as
    * passed, matching Gopher's "rule does not apply" reading.
    *
    * Scale shape: the per-row signals are map-side; repetition adds its
    * usual narrow (id, word) shuffle; the final join shuffles only
    * (id, 3 doubles) rows. Booleans-only output keeps the oracle free
    * of cross-engine float formatting.
    */
  def gopherQualityReport(
      df: DataFrame,
      idCol: String,
      textCol: String,
      t: GopherThresholds = GopherThresholds()): DataFrame = {
    val base = withQualitySignals(df.select(col(idCol), col(textCol)), textCol)
    val rep = repetitionSignals(df, idCol, textCol)
      .select(col(idCol), col("dup_word_frac"), col("top_word_frac"),
        col("top_bigram_frac"))
    val failWordCount = !col("token_count").between(t.minWords, t.maxWords)
    val failMeanLen = !col("mean_token_len")
      .between(t.minMeanTokenLen, t.maxMeanTokenLen)
    val failPunct =
      coalesce(col("punct_ratio") > t.maxPunctRatio, lit(false))
    val failDupWord =
      coalesce(col("dup_word_frac") > t.maxDupWordFrac, lit(false))
    val failTopWord =
      coalesce(col("top_word_frac") > t.maxTopWordFrac, lit(false))
    val failTopBigram =
      coalesce(col("top_bigram_frac") > t.maxTopBigramFrac, lit(false))
    base.join(rep, Seq(idCol), "left")
      .select(col(idCol),
        failWordCount.as("fail_word_count"),
        failMeanLen.as("fail_mean_token_len"),
        failPunct.as("fail_punct_ratio"),
        failDupWord.as("fail_dup_word"),
        failTopWord.as("fail_top_word"),
        failTopBigram.as("fail_top_bigram"),
        (!(failWordCount || failMeanLen || failPunct || failDupWord ||
          failTopWord || failTopBigram)).as("keep"))
  }

  /** The corpus cut: documents passing every Gopher rule, original
    * columns intact (left-semi against the report).
    */
  def gopherQualityFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      t: GopherThresholds = GopherThresholds()): DataFrame =
    df.join(
      gopherQualityReport(df, idCol, textCol, t)
        .filter(col("keep")).select(col(idCol)),
      Seq(idCol), "left_semi")

  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    repetitionSignalsWithEntropy(df, idCol, textCol).drop("__ent_micro")

  /** [[repetitionSignals]] plus a hidden exact-integer entropy column
    * (`__ent_micro`, the [[tokenEntropySignals]] micro-nat sum) computed
    * from the SAME (id, word)-count aggregation — the shared token pass
    * behind [[gopherEntropyFilter]]. The per-(id, word) counts here and
    * in tokenEntropySignals are the same multiset (same tokenizer, same
    * empty-token filter), and the floor/log expression is byte-identical,
    * so the fused entropy is bit-equal to the standalone one.
    */
  private def repetitionSignalsWithEntropy(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // Bigrams come from the native [[graft.functions.TextShinglesAll]]
    // kernel (n = 2: every adjacent pair with multiplicity, leading
    // empty token skipped) instead of the former
    // posexplode + lead-over-(id, pos) window. The window shape
    // shuffle-SORTED every token in the corpus, twice (the word and
    // bigram aggregates each re-executed the generator+window branch),
    // and curation-chain attribution measured it as the dominant
    // scaling stage of `curation_pipeline` at 10× (the quality stage
    // was 4.6× at 10× data; every other stage ≤ 2×). The kernel is one
    // static call per row inside whole-stage codegen (no HOF lambdas —
    // PlanAuditSpec pins that); the only shuffles left are the two
    // partial-aggregated groupBys. Pair contents are identical:
    // adjacent non-empty tokens joined by one space, n−1 pairs per
    // doc, none for single-token docs.
    val words = df
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("w"))
      .filter(col("w") =!= "")
    val bigrams = df.select(col(idCol).as("id"),
      explode(graft.functions.TextShinglesAll(col(textCol), 2)).as("bg"))
    val wordAgg = words.groupBy(col("id"), col("w"))
      .agg(count(lit(1)).as("wc"))
      .groupBy(col("id"))
      .agg(sum(col("wc")).as("n_words"),
        count(lit(1)).as("n_distinct"),
        max(col("wc")).as("max_wc"),
        sum(floor(col("wc") * log(col("wc")) * 1e6 + 0.5).cast("long"))
          .as("__ent_s"))
    val bigramAgg = bigrams
      .groupBy(col("id"), col("bg"))
      .agg(count(lit(1)).as("bc"))
      .groupBy(col("id"))
      .agg(sum(col("bc")).as("n_bigrams"), max(col("bc")).as("max_bc"))
    wordAgg.join(bigramAgg, Seq("id"), "left")
      .select(col("id").as(idCol),
        col("n_words"),
        (lit(1.0) - col("n_distinct").cast("double") /
          col("n_words").cast("double")).as("dup_word_frac"),
        (col("max_wc").cast("double") / col("n_words").cast("double"))
          .as("top_word_frac"),
        (col("max_bc").cast("double") / col("n_bigrams").cast("double"))
          .as("top_bigram_frac"),
        (floor(col("n_words") * log(col("n_words")) * 1e6 + 0.5)
          .cast("long") - col("__ent_s")).as("__ent_micro"))
  }

  /** FUSED gopher + entropy gate: both are per-document predicates over
    * token statistics, so stacking them as separate stages pays two full
    * tokenize/explode/aggregate passes over the corpus for one
    * conjunction. This computes the Gopher report AND the token-entropy
    * floor from ONE shared (id, word)-count pass ([[
    * repetitionSignalsWithEntropy]]) and semi-joins once. Results are
    * bit-identical to `entropyFilter(gopherQualityFilter(df))` — the
    * predicates commute (each reads only the untouched text column) and
    * the entropy arithmetic is expression-identical; the curation block
    * applies this automatically when `quality_filter: [gopher, entropy]`
    * are adjacent (GopherEntropyFusionSpec pins equality and the saved
    * exchanges).
    */
  def gopherEntropyFilter(
      df: DataFrame,
      idCol: String,
      textCol: String,
      entropyMinNats: Double,
      t: GopherThresholds = GopherThresholds()): DataFrame = {
    val base = withQualitySignals(df.select(col(idCol), col(textCol)), textCol)
    val rep = repetitionSignalsWithEntropy(df, idCol, textCol)
      .select(col(idCol), col("dup_word_frac"), col("top_word_frac"),
        col("top_bigram_frac"), col("n_words"), col("__ent_micro"))
    val failWordCount = !col("token_count").between(t.minWords, t.maxWords)
    val failMeanLen = !col("mean_token_len")
      .between(t.minMeanTokenLen, t.maxMeanTokenLen)
    val failPunct =
      coalesce(col("punct_ratio") > t.maxPunctRatio, lit(false))
    val failDupWord =
      coalesce(col("dup_word_frac") > t.maxDupWordFrac, lit(false))
    val failTopWord =
      coalesce(col("top_word_frac") > t.maxTopWordFrac, lit(false))
    val failTopBigram =
      coalesce(col("top_bigram_frac") > t.maxTopBigramFrac, lit(false))
    // entropyFilter's keep, verbatim: tokenless docs (null rep row) drop
    val entropyKeep = coalesce(
      col("__ent_micro").cast("double") /
        (col("n_words").cast("double") * 1e6) >= entropyMinNats,
      lit(false))
    val keep = base.join(rep, Seq(idCol), "left")
      .filter(!(failWordCount || failMeanLen || failPunct || failDupWord ||
        failTopWord || failTopBigram) && entropyKeep)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** The n-gram half of Gopher's repetition rules (Rae et al. 2021,
    * Table A1) — the word-level signals above cover duplicate/top WORD
    * fractions; these cover the n-gram CHARACTER fractions:
    *
    *  - `top{n}gram_char_frac`, n ∈ {2,3,4}: characters covered by the
    *    MOST FREQUENT word n-gram — g* = argmax count(g), tie-broken by
    *    the longer gram (then the coverages coincide) — giving
    *    count(g*)·charlen(g*) / total, where charlen is the length of
    *    the space-joined n-gram and total is the length of the
    *    whitespace-normalized lowercase text (= the 1-gram sequence's
    *    char length). Selection is COUNT-based (Rae et al. 2021's
    *    "most frequent n-gram", cf. DataTrove's `most_common(1)`), not
    *    max coverage: a longer-but-rarer gram never wins, so the
    *    published 0.20/0.18/0.16 thresholds apply to the published
    *    signal.
    *  - `dup{n}gram_char_frac`, n ∈ {5..10}: characters covered by ALL
    *    n-grams occurring ≥ 2 times — Σ_{count(g)≥2} count(g)·charlen(g)
    *    / total.
    *
    * Overlapping occurrences each contribute their full char length
    * (the simple exact-counting definition, deterministic and
    * SQL-replayable), so values CAN exceed 1.0 on degenerate repetition
    * — thresholds still order documents correctly. Docs with no tokens
    * yield NULL (rule does not apply), same contract as punctRatio.
    *
    * Scale shape: gram building is fully MAP-SIDE — ONE
    * [[graft.functions.TextShinglesHashed]] kernel call per row
    * tokenizes the text once and emits every (n, xxhash64, charlen)
    * for all nine sizes with multiplicity, pre-hashed (no token
    * explode, no window sort, no gram strings EVER materialized — the
    * r15 formulation re-tokenized per size and allocated each gram to
    * hash it), then the one tall (id, n, gram-hash) count shuffle
    * (the postings-family rule: the shuffle never carries gram
    * strings). One per-doc rollup after.
    * 64-bit collision odds ~|grams per doc|²/2⁶⁴ — the same accepted
    * gamble as every postings join here (the DuckDB oracle groups the
    * strings themselves; a collision surfaces as a hash mismatch, not
    * a silent pass).
    */
  def repetitionNgramSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val topNs = Seq(2, 3, 4)
    val dupNs = Seq(5, 6, 7, 8, 9, 10)
    val allNs = topNs ++ dupNs
    // `total` MUST be computed in its own projection BELOW the explode:
    // non-generator expressions sharing a select with a generator land
    // in the Project ABOVE the Generate, i.e. evaluated once per GRAM —
    // a full-document regex ~400× per doc (measured 1.2 s → 20 s at
    // sf0.1 when fused into the explode select)
    val tall = df
      .select(col(idCol).as("id"),
        length(regexp_replace(lower(trim(col(textCol))), "\\s+", " "))
          .cast("long").as("total"),
        col(textCol).as("__text"))
      .select(col("id"), col("total"),
        explode(graft.functions.TextShinglesHashed(col("__text"), allNs))
          .as("s"))
      .select(col("id"), col("total"),
        col("s.n").as("n"), col("s.h").as("h"), col("s.len").as("len"))
    val counts = tall.groupBy("id", "total", "n", "h")
      .agg(count(lit(1)).as("c"), max(col("len")).as("len"))
      .withColumn("cov", col("c") * col("len"))
    // top gram = argmax (c, len): highest COUNT first (the published
    // most-frequent-gram rule), the longer gram only between equal
    // counts (ties there share c·len, so the coverage is deterministic
    // either way). The lexicographic max is packed into ONE long —
    // c·2³¹ + len, order-isomorphic while both < 2³¹ (c and len are
    // bounded by the doc's char count) — keeping the aggregate a plain
    // long max instead of an interpreted struct ordering (bench-neutral
    // at sf0.1 where the kernel dominates, but it stays inside codegen)
    val perN = counts.groupBy("id", "total", "n").agg(
      max(col("c") * lit(1L << 31) + col("len")).as("m"),
      sum(when(col("c") >= 2, col("cov")).otherwise(0L)).as("dup_cov"))
      .withColumn("top_cov",
        shiftright(col("m"), 31) * (col("m").bitwiseAND(lit((1L << 31) - 1))))
      .drop("m")
    def frac(cov: Column): Column =
      cov.cast("double") / when(col("total") > 0, col("total").cast("double"))
    val aggCols =
      topNs.map(n => max(when(col("n") === n, frac(col("top_cov"))))
        .as(s"top${n}gram_char_frac")) ++
        dupNs.map(n => max(when(col("n") === n, frac(col("dup_cov"))))
          .as(s"dup${n}gram_char_frac"))
    val wide = perN.groupBy(col("id"), col("total"))
      .agg(aggCols.head, aggCols.tail: _*)
    // docs whose longest gram size has no gram (fewer than n tokens)
    // have no (id, n) row — their fraction is 0.0, not NULL (the rule
    // applies and finds nothing); tokenless docs never reach `words`
    // and are restored with NULL via the left join
    val zeroed = wide.select(
      col("id").as(idCol) +:
        (topNs.map(n => coalesce(col(s"top${n}gram_char_frac"), lit(0.0))
            .as(s"top${n}gram_char_frac")) ++
          dupNs.map(n => coalesce(col(s"dup${n}gram_char_frac"), lit(0.0))
            .as(s"dup${n}gram_char_frac"))): _*)
    df.select(col(idCol)).distinct()
      .join(zeroed, Seq(idCol), "left")
  }

  /** Gopher's published n-gram repetition thresholds (Rae et al. 2021,
    * Table A1): documents whose top-n-gram char fraction exceeds
    * 0.20/0.18/0.16 (n = 2/3/4) or whose duplicate-n-gram char fraction
    * exceeds 0.15/0.14/0.13/0.12/0.11/0.10 (n = 5..10) are dropped.
    */
  final case class NgramRepetitionThresholds(
      top: Map[Int, Double] = Map(2 -> 0.20, 3 -> 0.18, 4 -> 0.16),
      dup: Map[Int, Double] = Map(5 -> 0.15, 6 -> 0.14, 7 -> 0.13,
        8 -> 0.12, 9 -> 0.11, 10 -> 0.10))

  /** Drop documents failing any n-gram repetition rule (schema
    * preserved, semi-join like the other gates). NULL signals
    * (tokenless docs) pass the n-gram rules — they fail word-count
    * rules elsewhere.
    */
  def gopherNgramFilter(df: DataFrame, idCol: String, textCol: String,
      t: NgramRepetitionThresholds = NgramRepetitionThresholds()): DataFrame = {
    val sig = repetitionNgramSignals(df, idCol, textCol)
    val fails = (t.top.toSeq.map { case (n, thr) =>
      coalesce(col(s"top${n}gram_char_frac") > thr, lit(false))
    } ++ t.dup.toSeq.map { case (n, thr) =>
      coalesce(col(s"dup${n}gram_char_frac") > thr, lit(false))
    }).reduce(_ || _)
    df.join(sig.filter(!fails).select(col(idCol)), Seq(idCol), "left_semi")
  }

  // ------------------------------------------------------ corpus analytics

  /** Corpus vocabulary: term frequency + document frequency per token —
    * the input to tokenizer/vocab training and data-driven stopword
    * derivation. Two-level aggregation so BOTH counts partial-aggregate:
    * the (token, doc) pre-aggregate shuffles once on the pair, then one
    * narrow shuffle per distinct token; raw postings never move twice.
    * Empty tokens (blank documents) are excluded.
    */
  def vocabCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("id"), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col("token"), col("id"))
      .agg(count(lit(1)).as("__tf"))
      .groupBy(col("token"))
      .agg(sum(col("__tf")).as("tf"), count(lit(1)).as("df_docs"))

  /** Top-`k` vocabulary by term frequency (ties → token ascending), with
    * a rank column. `orderBy(...).limit(k)` plans as
    * TakeOrderedAndProject — each partition keeps a k-bounded heap and
    * the driver merges k-item heaps, so the full vocab is never globally
    * sorted or moved to one partition; the rank window then runs over
    * exactly k rows.
    */
  def vocabTopK(df: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = vocabCounts(df, idCol, textCol)
      .orderBy(col("tf").desc, col("token"))
      .limit(k)
    val w = Window.orderBy(col("tf").desc, col("token"))
    top.withColumn("rank", row_number().over(w).cast("long"))
  }

  /** Token-count histogram of the corpus (bucket lower bounds, width
    * `bucketWidth`) — the length-distribution diagnostic a curation pass
    * reads before choosing chunk/filter thresholds. Map-side bucket
    * assignment + one narrow count shuffle.
    */
  def tokenLengthHistogram(df: DataFrame, textCol: String,
      bucketWidth: Int = 10): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    df.select((floor(tokenCount(col(textCol)) / bucketWidth) * bucketWidth)
        .cast("long").as("bucket_lo"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))
  }

  /** Token-entropy quality signals (the Dolma-family lexical-diversity
    * measure): per document, token count, distinct-token count, and
    * `ent_micro` = n·ln n·1e6 − Σ_tokens c·ln c·1e6 with each term
    * half-up quantized to micro-nats BEFORE summing — so the sum is an
    * order-independent exact BIGINT and the whole row hash-checks
    * across engines (unquantized double sums are order-dependent).
    * `ent_micro / (n_tokens · 1e6)` is the per-token Shannon entropy in
    * nats; low values flag keyword-stuffed or degenerate pages. Two
    * narrow count shuffles, both partial-aggregated.
    */
  def tokenEntropySignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val tc = df.select(col(idCol).as(idCol),
        explode(tokens(col(textCol))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col(idCol), col("tok")).agg(count(lit(1)).as("c"))
    tc.groupBy(col(idCol)).agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(floor(col("c") * log(col("c")) * 1e6 + 0.5).cast("long"))
          .as("__s"))
      .withColumn("ent_micro",
        floor(col("n_tokens") * log(col("n_tokens")) * 1e6 + 0.5)
          .cast("long") - col("__s"))
      .drop("__s")
  }

  /** Drop rows whose per-token entropy (nats) falls below `minNats`
    * (schema preserved; docs with no tokens drop — entropy of nothing
    * has no semantics). Semi-join on the id like the LM gate.
    */
  def entropyFilter(df: DataFrame, idCol: String, textCol: String,
      minNats: Double): DataFrame = {
    val keep = tokenEntropySignals(df, idCol, textCol)
      .filter(col("ent_micro").cast("double") /
        (col("n_tokens").cast("double") * 1e6) >= minNats)
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** Compression-ratio quality signals: raw UTF-8 bytes, DEFLATE bytes
    * ([[graft.functions.DeflateLen]] native kernel), and their ratio —
    * high ratios flag repetitive templated boilerplate that token-level
    * repetition rules miss. Pure map-side projection; no DuckDB replay
    * exists (no zlib), so this is spec-tested + rows-only checked, like
    * the sketch family.
    */
  def compressionSignals(df: DataFrame, idCol: String,
      textCol: String): DataFrame =
    df.select(col(idCol),
        octet_length(col(textCol)).cast("long").as("raw_bytes"),
        graft.functions.DeflateLen(col(textCol)).as("deflate_bytes"))
      .withColumn("ratio",
        col("raw_bytes").cast("double") / col("deflate_bytes"))

  /** Drop rows whose compression ratio exceeds `maxRatio` (schema
    * preserved) — the curation-block form of the signal.
    */
  def compressionFilter(df: DataFrame, textCol: String,
      maxRatio: Double): DataFrame =
    df.filter(
      octet_length(col(textCol)).cast("double") /
        graft.functions.DeflateLen(col(textCol)) <= maxRatio)

  /** Cross-source shingle-overlap matrix: for each ordered source pair
    * (a, b) the number of distinct word-`n`-gram shingles of `a` that
    * also occur in `b`, plus `a`'s distinct-shingle count — so
    * containment C(a→b) = n_shared / n_a is one division away. The
    * corpus-level twin of [[Dedup.containmentPairs]]: where that asks
    * "which DOCUMENTS include each other", this asks "how much of source
    * A's n-gram mass is already in source B" — the cross-corpus
    * contamination / redundancy dashboard read before mixing corpora.
    *
    * Scale shape: shingles collapse to distinct (source, 8-byte hash)
    * rows — ONE shuffle keyed by the hash; the self-join's per-key
    * fan-out is bounded by the number of SOURCES (each hash appears once
    * per source after the distinct), so the pair stream is ≤ |sources|²
    * per shingle no matter how hot the shingle is in documents. Pairs
    * with zero overlap are absent (sparse matrix).
    */
  def sourceShingleOverlap(df: DataFrame, idCol: String, textCol: String,
      sourceCol: String, shingleN: Int = 3): DataFrame = {
    val sh = df.select(col(sourceCol).as("source"),
        explode(Dedup.wordShingles(col(textCol), shingleN)).as("s"))
      .select(col("source"), xxhash64(col("s")).as("h"))
      .distinct()
    val sizes = sh.groupBy("source").agg(count(lit(1)).as("n_a"))
    sh.select(col("source").as("source_a"), col("h"))
      .join(sh.select(col("source").as("source_b"), col("h")), Seq("h"))
      .filter(col("source_a") =!= col("source_b"))
      .groupBy("source_a", "source_b").agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("source").as("source_a"), col("n_a"))),
        Seq("source_a"))
  }
}
