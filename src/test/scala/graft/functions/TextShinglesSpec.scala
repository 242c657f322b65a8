package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** TextShingles must be a drop-in for the HOF shingling it replaced in
  * operators/Dedup.scala — same tokens, same order, same distinct, same
  * null contract.
  */
class TextShinglesSpec extends SparkSpec {
  import spark.implicits._

  private def hofShingles(text: org.apache.spark.sql.Column, n: Int) = {
    // `size` is shadowed by a scalatest matcher word — qualify it
    val asize = org.apache.spark.sql.functions.size _
    val t = split(lower(trim(text)), "\\s+")
    when(asize(t) >= lit(n),
      array_distinct(transform(sequence(lit(0), asize(t) - lit(n)),
        i => array_join(slice(t, i + lit(1), lit(n)), " "))))
      .otherwise(array().cast("array<string>"))
  }

  test("parity with the HOF formulation on varied inputs") {
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "  Leading and TRAILING  spaces\tand\ttabs mixed  ",
      "a a a a a a",              // repeats → distinct collapses
      "one two",                  // shorter than n=3 → empty
      "",                         // empty → empty
      "Üñïçôdé TEXT with Ümläuts and ßharp s here", // non-ASCII lowercase
      "x y z x y z x y z"         // periodic → few distinct shingles
    ).toDF("text")
    val rows = df.select(
      TextShingles(col("text"), 3).as("native"),
      hofShingles(col("text"), 3).as("hof")).collect()
    rows.foreach { r =>
      r.getSeq[String](0) shouldBe r.getSeq[String](1)
    }
  }

  test("null text yields an empty array (HOF when-otherwise contract)") {
    val df = Seq(Some("alpha beta gamma delta"), None).toDF("text")
    val out = df.select(TextShingles(col("text"), 3).as("sh"))
      .collect().map(_.getSeq[String](0))
    out(0) should contain("alpha beta gamma")
    out(1) shouldBe empty
  }

  test("interpreted eval path (constant folding) matches") {
    val out = spark.range(1)
      .select(TextShingles(lit("p q r s"), 2).as("sh"))
      .collect().head.getSeq[String](0)
    out shouldBe Seq("p q", "q r", "r s")
  }

  test("TextShinglesAll: leading tab/newline yields no phantom empty token") {
    // trim() strips only 0x20, so split("\\s+") on "\tfoo bar" produces
    // a leading "" token; the all-grams kernel must skip it — a gram
    // like " foo" would enter the repetition counts while the oracle's
    // WHERE w <> '' excludes it
    val df = Seq("\tfoo bar foo", "\nfoo bar foo", "foo bar foo", " foo bar foo")
      .toDF("text")
    val rows = df.select(TextShinglesAll(col("text"), 2).as("g"))
      .collect().map(_.getSeq[String](0))
    rows.foreach(_ shouldBe Seq("foo bar", "bar foo"))
    // a doc with exactly n-1 real tokens behind leading whitespace has
    // NO n-gram (the phantom token must not complete one)
    Seq("\ncc dd").toDF("text")
      .select(TextShinglesAll(col("text"), 3).as("g"))
      .collect().head.getSeq[String](0) shouldBe empty
  }

  test("TextShinglesHashed: bit-identical to xxhash64/length of the string grams") {
    // the fused kernel must produce EXACTLY the rows the unfused
    // formulation (per-size TextShinglesAll → xxhash64(g), length(g))
    // yields — same hashes (same UTF-8 bytes, seed 42), same char
    // lengths (code points, not bytes — the Ümläut doc catches a
    // byte-length bug), same multiplicity, across all sizes at once
    val ns = Seq(2, 3, 4, 5)
    val df = Seq(
      "the quick brown fox jumps over the lazy dog",
      "\tleading tab then words tab\there",
      "a a a a a a",
      "one two",
      "",
      "Üñïçôdé TEXT with Ümläuts and ßharp s here",
      "x y z x y z x y z"
    ).toDF("text")
    val fused = df.select(
        explode(TextShinglesHashed(col("text"), ns)).as("s"))
      .select(col("s.n"), col("s.h"), col("s.len"))
      .as[(Int, Long, Long)].collect().sorted
    val unfused = ns.map { n =>
      df.select(explode(TextShinglesAll(col("text"), n)).as("g"))
        .select(lit(n).as("n"), xxhash64(col("g")).as("h"),
          org.apache.spark.sql.functions.length(col("g"))
            .cast("long").as("len"))
        .as[(Int, Long, Long)].collect()
    }.reduce(_ ++ _).sorted
    fused shouldBe unfused
    // null text → empty (no rows), matching the per-size kernels
    Seq(Option.empty[String]).toDF("text")
      .select(explode(TextShinglesHashed(col("text"), ns)))
      .count() shouldBe 0L
  }
}
