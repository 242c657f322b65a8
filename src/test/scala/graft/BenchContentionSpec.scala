package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** The bench's contention verdict. Calibrated against two MEASURED
  * full sf0.1 runs on this machine: a quiet run (4/82 queries with
  * median/min spread > 1.5, 0/82 > 2.0, flat sentinel series) and a
  * run deliberately co-loaded with the full test suite (15/83 > 1.5,
  * 9/83 > 2.0, sentinel quiet at both ENDS — which is exactly why the
  * sentinel is a mid-run series, not a before/after pair). The r9
  * driver bench was the loaded shape and filed phantom regressions;
  * the verdict must flag it without false-positiving on quiet noise.
  */
class BenchContentionSpec extends AnyFunSuite with Matchers {

  private val flatSentinels = Seq(0.27, 0.12, 0.11, 0.13, 0.12, 0.10)

  test("quiet run (measured shape): ~5% noisy queries, flat sentinels → not contended") {
    val spreads = Seq.fill(78)(1.08) ++ Seq(1.6, 1.7, 1.9, 1.55) // 4/82 > 1.5
    Bench.contentionVerdict(flatSentinels, spreads, reps = 3) shouldBe false
  }

  test("co-loaded run (measured shape): 18% > 1.5, 11% > 2.0 → contended") {
    val spreads = Seq.fill(68)(1.1) ++ Seq.fill(6)(1.7) ++ Seq.fill(9)(2.4)
    Bench.contentionVerdict(flatSentinels, spreads, reps = 3) shouldBe true
  }

  test("uniform r9-style inflation flags on spread alone") {
    val spreads = Seq.fill(40)(1.8) ++ Seq.fill(20)(1.2)
    Bench.contentionVerdict(flatSentinels, spreads, reps = 3) shouldBe true
  }

  test("mid-run load burst flags via the sentinel series") {
    // quiet at both ends — before/after comparison sees nothing; the
    // mid-run probes spike while the burst runs
    val sentinels = Seq(0.27, 0.12, 0.11, 1.4, 1.2, 0.12, 0.10)
    Bench.contentionVerdict(sentinels, Seq.fill(60)(1.05), reps = 3) shouldBe true
  }

  test("warm-up decay of the FIRST probe never flags") {
    // probe 0 is systematically slow (JIT/IO warm-up, measured 2-3x);
    // it is excluded from the drift check
    val sentinels = Seq(0.49, 0.12, 0.11, 0.12, 0.13, 0.09)
    Bench.contentionVerdict(sentinels, Seq.fill(60)(1.05), reps = 3) shouldBe false
  }

  test("2-rep runs never use spread (median includes warm-up residue)") {
    Bench.contentionVerdict(flatSentinels, Seq.fill(60)(2.5), reps = 2) shouldBe false
    // ...but the sentinel still works at any rep count
    val loaded = Seq(0.27, 0.12, 1.5, 1.4, 0.12, 0.11)
    Bench.contentionVerdict(loaded, Seq.fill(60)(1.0), reps = 2) shouldBe true
  }

  test("dev-loop subsets (< 20 queries) never flag on spread alone") {
    // 1 noisy query out of 3 is 33% — meaningless at that sample size
    Bench.contentionVerdict(flatSentinels, Seq(1.1, 1.1, 1.9), reps = 3) shouldBe false
  }

  test("median: odd and even counts") {
    Bench.median(Seq(3.0, 1.0, 2.0)) shouldBe 2.0
    Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) shouldBe 2.5
  }

  // ------------------------------------------------------ compact line
  // The collector that records each round's bench keeps only the final
  // ~2000 bytes of stdout and parses a line starting with '{'. These
  // tests pin the real-world case: the REGISTERED query set (the exact
  // names the driver will time) must render under the budget with the
  // slowest queries always present.

  private def realNames: Seq[String] =
    (SparkEntry.queries ++ Queries.benchOnly).keys.toSeq.sorted

  private def parseJson(s: String): com.fasterxml.jackson.databind.JsonNode =
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(s)

  test("compact line fits the tail budget for the full registered query set") {
    val results = realNames.zipWithIndex.map { case (n, i) =>
      n -> (0.05 + (i % 17) * 0.43) // realistic mixed magnitudes
    }
    val line = Bench.compactLine(123.4567, "/root/testdata/sf0.1",
      contended = false, results, reps = 3)
    line.length should be <= Bench.CompactBudget
    line should startWith("{")
    val node = parseJson(line) // valid JSON
    node.get("metric").asText() shouldBe "total"
    node.get("unit").asText() shouldBe "sec"
    node.get("sf").asText() shouldBe "sf0.1"
    node.get("value").asDouble() shouldBe 123.46 +- 1e-9
    // admission is slowest-first: no omitted query may be slower than a
    // kept one (tie-safe: equal times can fall either side of the cut),
    // and the budget must always admit a useful number of entries —
    // the registered set has outgrown "half always fits" (134 names ×
    // ~30 bytes > 1800), which is exactly why `omitted` exists
    val kept = node.get("queries")
    val (keptTimes, omittedTimes) =
      results.partition { case (n, _) => kept.has(n) } match {
        case (k, o) => (k.map(_._2), o.map(_._2))
      }
    if (omittedTimes.nonEmpty)
      keptTimes.min should be >= omittedTimes.max
    kept.size() should be >= 40
    node.get("omitted").asInt() shouldBe (results.size - kept.size())
  }

  test("compact line keeps everything when it already fits") {
    val results = Seq("q1_agg" -> 1.5, "q6_filter_agg" -> 0.3)
    val line = Bench.compactLine(1.8, "/root/testdata/sf0.01",
      contended = true, results, reps = 3)
    val node = parseJson(line)
    node.get("queries").size() shouldBe 2
    node.get("omitted").asInt() shouldBe 0
    node.get("contended").asBoolean() shouldBe true
  }

  test("swingFlags: >1.5x over the committed floor flags, same-sf only, worst first") {
    val floor = java.nio.file.Files.createTempFile("floor-", ".json")
    java.nio.file.Files.writeString(floor,
      """{"sf":"sf0.1","floors":{"a":1.0,"b":2.0,"c":0.5}}""")
    val results = Seq("a" -> 1.2, "b" -> 3.5, "c" -> 2.0, "new_q" -> 9.9)
    // a: 1.2x (inside the band), b: 1.75x, c: 4x; new_q has no floor
    val flags = Bench.swingFlags("/root/testdata/sf0.1", results,
      floor.toString)
    flags.map(_._1) shouldBe Seq("c", "b") // worst ratio first
    flags.head._2 shouldBe 4.0 +- 1e-9
    // a different sf must not adjudicate against these floors
    Bench.swingFlags("/root/testdata/sf0.01", results,
      floor.toString) shouldBe empty
    // absent/unreadable floor file: no flags, no crash
    Bench.swingFlags("/root/testdata/sf0.1", results,
      "/nonexistent/floor.json") shouldBe empty
    // corrupt floor file: the NonFatal-narrowed catch (ADVICE r20)
    // still degrades to "no flags" — only fatal throwables propagate
    val corrupt = java.nio.file.Files.createTempFile("floor-bad-", ".json")
    java.nio.file.Files.writeString(corrupt, "{not json")
    Bench.swingFlags("/root/testdata/sf0.1", results,
      corrupt.toString) shouldBe empty
  }

  test("bm25MaxDfCeiling: degenerate corpora fail loudly, never flip to exact mode") {
    // N < 2 derives ceiling 0 = the engine's disabled sentinel, while
    // the oracle's HAVING df <= 0 prunes every term — inexpressible, so
    // the constructor must throw instead of silently diverging
    Queries.bm25MaxDfCeiling(2L) shouldBe 1L
    Queries.bm25MaxDfCeiling(501L) shouldBe 250L
    an[IllegalArgumentException] should be thrownBy Queries.bm25MaxDfCeiling(1L)
    an[IllegalArgumentException] should be thrownBy Queries.bm25MaxDfCeiling(0L)
  }

  test("swing verdict survives the compact line's budget loop") {
    val results = realNames.zipWithIndex.map { case (n, i) =>
      n -> (0.05 + (i % 17) * 0.43)
    }
    val swing = Seq("dedup_tfidf_forced" -> 2.1, "dedup_simhash_pairs" -> 1.7)
    val line = Bench.compactLine(123.0, "/root/testdata/sf0.1",
      contended = false, results, reps = 3, swing = swing)
    line.length should be <= Bench.CompactBudget
    val node = parseJson(line)
    node.get("swing").get("dedup_tfidf_forced").asDouble() shouldBe 2.1 +- 1e-9
    node.get("swing").size() shouldBe 2
    // and the committed BENCH_FLOOR.json itself parses with the right sf
    val committed = parseJson(java.nio.file.Files.readString(
      java.nio.file.Paths.get("BENCH_FLOOR.json")))
    committed.get("sf").asText() shouldBe "sf0.1"
    committed.get("floors").size() should be > 100
  }

  test("compact line: pathological names degrade to omission, never overflow") {
    val results = (1 to 200).map(i => s"very_long_query_name_padding_${i}_x" * 2 -> i * 0.1)
    val line = Bench.compactLine(10.0, "sf9", contended = false, results, reps = 3)
    line.length should be <= Bench.CompactBudget
    parseJson(line).get("omitted").asInt() should be > 0
  }

  // ------------------------------------------------------ thrown queries
  // r11/r12 recorded time-to-throw for two analysis-broken queries as if
  // they ran; a thrown query must surface in `errors`, never in `queries`.

  test("a throwing query lands in errors, not in the timing map") {
    val spark = SparkSpec.session
    val queries = Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)](
      "good" -> ((s, _) => s.range(3).toDF("id")),
      "broken" -> ((s, _) =>
        s.range(1).toDF("id").selectExpr("unix_micros(cast(id as string))")))
    val (timed, errors) = Bench.timeSuite(spark, "unused", queries, reps = 2)
    timed.map(_.name) shouldBe Seq("good")
    timed.head.times should have size 2
    errors.map(_._1) shouldBe Seq("broken")
    errors.head._2 should include("AnalysisException")
    // the self-adjudication diag rides along: suite position, uptime,
    // and one in-region gc/jit delta per successful rep
    timed.head.diag.pos shouldBe 0
    timed.head.diag.uptimeS should be > 0.0
    timed.head.diag.gcMs should have size 2
    timed.head.diag.jitMs should have size 2
    all(timed.head.diag.gcMs) should be >= 0L
  }

  test("compact line carries suite jvm summary and top-slowest diag") {
    val names = realNames
    val results = names.zipWithIndex.map { case (n, i) =>
      n -> (0.05 + (i % 17) * 0.43)
    }
    val diag = names.zipWithIndex.map { case (n, i) =>
      n -> Bench.QueryDiag(i, 100.0 + i, Seq(12L, 3L), Seq(40L, 5L), 37L)
    }.toMap
    val jvm = Bench.jvmSummary()
    val line = Bench.compactLine(123.0, "/root/testdata/sf0.1",
      contended = false, results, reps = 3, errors = 0,
      diag = diag, jvm = Some(jvm))
    line.length should be <= Bench.CompactBudget
    val node = parseJson(line)
    // the suite-level jvm summary is present with the code-cache fields
    node.get("jvm").get("cc_max_mb").asLong() should be > 0L
    node.get("jvm").get("up_s").asDouble() should be > 0.0
    // diag covers exactly the slowest DiagTop queries, as
    // [pos, up_s, gc_ms, jit_ms, cc_mb]
    val slowest = results.sortBy(-_._2).take(Bench.DiagTop).map(_._1)
    val d = node.get("diag")
    d.size() shouldBe slowest.size
    slowest.foreach { n =>
      d.has(n) shouldBe true
      d.get(n).size() shouldBe 5
      d.get(n).get(2).asLong() shouldBe 15L // gc_ms summed over reps
      d.get(n).get(3).asLong() shouldBe 45L // jit_ms summed over reps
    }
    // ...and the slowest queries are still all present in the map
    slowest.foreach(n => node.get("queries").has(n) shouldBe true)
  }

  test("error map renders as valid JSON even with quotes/newlines in messages") {
    val msg = "boom \"quoted\"\nsecond line\ttab"
    val json = "{\"broken\":" + Bench.jsonStr(msg) + "}"
    parseJson(json).get("broken").asText() shouldBe msg
  }

  test("compact line carries the error count") {
    val line = Bench.compactLine(1.0, "sf9", contended = false,
      Seq("q" -> 1.0), reps = 3, errors = 2)
    parseJson(line).get("errors").asInt() shouldBe 2
  }
}
