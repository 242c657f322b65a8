package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.functions.{size => arraySize} // Matchers.size shadows it

/** Differential witness for [[Search.corpusStats]]' whitespace
  * semantics (the r21 verdict's finding): SQL `split` runs with limit
  * −1 and so KEEPS trailing empty tokens, and SQL `trim` strips only
  * 0x20 — so a doc ending in `\n`/`\t` must not count one token long,
  * and a tab-only doc must not count as token-bearing. The cheap
  * arithmetic pass must agree with (a) the TokenTfLen kernel (Java
  * one-arg split, which drops trailing empties) and (b) the
  * `rlike("\\S")` doc-count idiom bm25NDocs uses, on every whitespace
  * shape.
  */
class SearchCorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  // every adversarial whitespace shape + plain docs; expected counts
  // derived by the REFERENCE tokenization (trim+lower, split \s+, drop
  // empty tokens)
  private val docs: Seq[(Long, String)] = Seq(
    1L -> "hello\n",        // trailing newline: len 1, NOT 2
    2L -> "\t",             // tab-only: tokenless, NOT a 1-token doc
    3L -> " ",              // space-only: trim eats it, tokenless
    4L -> "",               // empty: tokenless
    5L -> null,             // null: skipped entirely
    6L -> "hello world",    // plain: len 2
    7L -> " a\tb\nc ",      // inner runs + padded: len 3
    8L -> "x\n\t \n",       // mixed trailing run: len 1
    9L -> "\n\nlead me",    // leading run: len 2
    10L -> "a  b \n"        // double space + trailing: len 2
  )

  private def df = docs.toDF("doc_id", "text")

  private def referenceStats: (Long, Long) = {
    val lens = docs.flatMap { case (_, t) => Option(t) }
      .map(_.trim.toLowerCase.split("\\s+").count(_.nonEmpty).toLong)
      .filter(_ > 0)
    (lens.size.toLong, lens.sum)
  }

  test("corpusStats counts non-empty tokens only (trailing whitespace)") {
    Search.corpusStats(df, "doc_id", "text") shouldBe referenceStats
  }

  test("corpusStats agrees with the TokenTfLen kernel path") {
    val kernel = df
      .select(graft.functions.TokenTfLen(col("text")).getField("len").as("len"))
      .filter(col("len").isNotNull && col("len") > 0)
      .agg(count(col("len")).cast("long"), coalesce(sum("len"), lit(0L)))
      .collect()(0)
    Search.corpusStats(df, "doc_id", "text") shouldBe
      (kernel.getLong(0), kernel.getLong(1))
  }

  test("corpusStats n_docs agrees with the rlike(\\S) idiom (bm25NDocs)") {
    val n = df.filter(col("text").isNotNull && col("text").rlike("\\S")).count()
    Search.corpusStats(df, "doc_id", "text")._1 shouldBe n
  }

  test("corpusStats stays a map-side pass (no Exchange)") {
    val ts = split(lower(trim(col("text"))), "\\s+")
    val len = (arraySize(ts) -
      when(element_at(ts, 1) === "", 1).otherwise(0) -
      when(arraySize(ts) > 1 && element_at(ts, -1) === "", 1).otherwise(0))
      .cast("long")
    val plan = df.select(len.as("len")).filter(col("len") > 0)
      .agg(count(col("len")), coalesce(sum("len"), lit(0L)))
      .queryExecution.executedPlan.toString
    // a single partial+final aggregate over a projection: the only
    // exchange is the 1-row final-aggregate gather, never a wide one
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"corpusStats plan grew an exchange:\n$plan")
  }
}
