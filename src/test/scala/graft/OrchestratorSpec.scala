package graft

import java.nio.file.Files
import java.time.LocalDateTime

class OrchestratorSpec extends SparkSpec {
  import Orchestrator._

  private val retry = JobRunner.RetryPolicy()

  test("schedule requires exactly one of cron / interval") {
    an[IllegalArgumentException] should be thrownBy
      Schedule("s", "j.yaml", Some(60), Some("* * * * *"), retry)
    an[IllegalArgumentException] should be thrownBy
      Schedule("s", "j.yaml", None, None, retry)
  }

  test("cron matcher: wildcards, lists, steps") {
    val t = LocalDateTime.of(2024, 3, 4, 10, 30) // a Monday
    cronMatches("* * * * *", t) shouldBe true
    cronMatches("30 10 * * *", t) shouldBe true
    cronMatches("0 10 * * *", t) shouldBe false
    cronMatches("*/15 * * * *", t) shouldBe true
    cronMatches("* * * * 1", t) shouldBe true // Monday = 1
    cronMatches("* * * * 0", t) shouldBe false
  }

  test("cron steps anchor at the field minimum; ranges work") {
    // day-of-month is 1-based: */2 fires on odd days (1,3,5,...)
    cronMatches("0 0 */2 * *", LocalDateTime.of(2024, 3, 3, 0, 0)) shouldBe true
    cronMatches("0 0 */2 * *", LocalDateTime.of(2024, 3, 4, 0, 0)) shouldBe false
    // month */7 fires in Jan (1) and Aug (8)
    cronMatches("0 0 1 */7 *", LocalDateTime.of(2024, 1, 1, 0, 0)) shouldBe true
    cronMatches("0 0 1 */7 *", LocalDateTime.of(2024, 8, 1, 0, 0)) shouldBe true
    cronMatches("0 0 1 */7 *", LocalDateTime.of(2024, 7, 1, 0, 0)) shouldBe false
    // ranges + mixed lists
    cronMatches("0 9-17 * * *", LocalDateTime.of(2024, 3, 4, 12, 0)) shouldBe true
    cronMatches("0 9-17 * * *", LocalDateTime.of(2024, 3, 4, 18, 0)) shouldBe false
    cronMatches("0 0 * * 1-5,0", LocalDateTime.of(2024, 3, 3, 0, 0)) shouldBe true // Sunday
  }

  test("nextRun: interval adds seconds; cron finds next matching minute") {
    val s1 = Schedule("i", "j", Some(300), None, retry)
    val t = LocalDateTime.of(2024, 1, 1, 0, 0, 30)
    nextRun(s1, t) shouldBe t.plusSeconds(300)
    val s2 = Schedule("c", "j", None, Some("15 * * * *"), retry)
    nextRun(s2, t) shouldBe LocalDateTime.of(2024, 1, 1, 0, 15)
  }

  test("tick runs due schedules with retry and reschedules them") {
    val s = Schedule("every-min", "job.yaml", Some(60), None, retry)
    val now = LocalDateTime.of(2024, 1, 1, 12, 0)
    var ran = Vector.empty[String]
    val out = tick(spark,
      Seq((s, now.minusSeconds(1)), (s.copy(name = "later"), now.plusMinutes(5))),
      now,
      runJob = (_, path, _) => { ran :+= path; 0 })
    ran shouldBe Vector("job.yaml")
    out.head._3 shouldBe Some(0)
    out.head._2 shouldBe now.plusSeconds(60)
    out(1)._3 shouldBe None // not due yet
  }

  test("tick concurrency=2: due jobs overlap, order + reschedule preserved") {
    val now = LocalDateTime.of(2024, 1, 1, 12, 0)
    val s = Schedule("a", "a.yaml", Some(60), None, retry)
    val gate = new java.util.concurrent.CountDownLatch(2)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = tick(spark,
      Seq((s, now.minusSeconds(1)),
        (s.copy(name = "b", jobPath = "b.yaml"), now.minusSeconds(1)),
        (s.copy(name = "later"), now.plusMinutes(5))),
      now,
      runJob = (_, path, _) => {
        // increment OUTSIDE the CAS-retried update fn (it may re-run)
        val cur = inFlight.incrementAndGet()
        maxInFlight.getAndUpdate(m => math.max(m, cur))
        gate.countDown()
        gate.await(10, java.util.concurrent.TimeUnit.SECONDS)
        inFlight.decrementAndGet()
        if (path == "b.yaml") 2 else 0
      },
      concurrency = 2)
    maxInFlight.get() shouldBe 2
    out.map(_._1.name) shouldBe Seq("a", "b", "later")
    out.map(_._3) shouldBe Seq(Some(0), Some(2), None)
    out.head._2 shouldBe now.plusSeconds(60)
  }

  test("tick: a throwing job maps to exit 2, tick survives") {
    val now = LocalDateTime.of(2024, 1, 1, 12, 0)
    val s = Schedule("boom", "x.yaml", Some(60), None, retry)
    val out = tick(spark, Seq((s, now.minusSeconds(1))), now,
      runJob = (_, _, _) => throw new RuntimeException("nope"))
    out.head._3 shouldBe Some(graft.core.ExitCodes.Failure)
  }

  test("runScheduled dispatches a BuildIndex YAML: builds the store, config errors never retry, transient failures do") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orch-idx-")
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j * 1.13).toFloat))
    }.toDF("vec_id", "embedding")
    emb.write.parquet(dir.resolve("emb").toString)
    val policy = JobRunner.RetryPolicy(maxRetries = 3, initialDelayMs = 1)
    // a valid index config builds on schedule, exit 0
    val good = dir.resolve("index.yaml")
    Files.writeString(good,
      s"""kind: sq
         |input: ${dir.resolve("emb")}
         |store: ${dir.resolve("sqstore")}
         |id_field: vec_id
         |vector_field: embedding
         |dim: 8
         |""".stripMargin)
    var slept = 0
    runScheduled(spark, good.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Success
    slept shouldBe 0
    graft.operators.Similarity.readSqTrainParams(
      spark, dir.resolve("sqstore").toString)._1.length shouldBe 8
    // a CONFIG error fails once, loudly, with zero backoff burned —
    // retrying a refusal replays the same refusal
    val bad = dir.resolve("bad.yaml")
    Files.writeString(bad,
      s"""kind: sq
         |input: ${dir.resolve("emb")}
         |store: ${dir.resolve("badstore")}
         |id_field: vec_id
         |vector_field: embedding
         |dim: 64
         |""".stripMargin)
    runScheduled(spark, bad.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Failure
    slept shouldBe 0
    // a MISSING input path is indistinguishable from a path typo —
    // it fails ONCE with zero backoff burned (previously it burned the
    // full budget on every tick); the retried "upstream not landed"
    // state is an EXISTING input with no rows, driven below
    val transient = dir.resolve("transient.yaml")
    Files.writeString(transient,
      s"""kind: sq
         |input: ${dir.resolve("not_yet_written")}
         |store: ${dir.resolve("tstore")}
         |id_field: vec_id
         |vector_field: embedding
         |dim: 8
         |""".stripMargin)
    runScheduled(spark, transient.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Failure
    slept shouldBe 0
    // a genuinely transient failure (not a refusal, not a missing
    // path) still retries under the schedule's policy: corrupt input
    // files throw at scan time, not analysis time
    Files.createDirectories(dir.resolve("corrupt"))
    Files.writeString(dir.resolve("corrupt").resolve("part-0.parquet"),
      "this is not parquet")
    val corrupt = dir.resolve("corrupt.yaml")
    Files.writeString(corrupt,
      s"""kind: sq
         |input: ${dir.resolve("corrupt")}
         |store: ${dir.resolve("cstore")}
         |id_field: vec_id
         |vector_field: embedding
         |dim: 8
         |""".stripMargin)
    runScheduled(spark, corrupt.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Failure
    slept shouldBe 3 // maxRetries backoffs burned
    // a non-index YAML falls through to the JobRunner path (whose
    // loader rejects it as a job, after retries)
    val notIdx = dir.resolve("job.yaml")
    Files.writeString(notIdx, "tenant_id: t1\n")
    runScheduled(spark, notIdx.toString, policy,
      sleep = _ => (), log = _ => ()) should not be
      graft.core.ExitCodes.Success
  }

  test("runScheduled retries a data-not-ready build: empty input on attempt 1, rows on attempt 2, success without intervention") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orch-dnr-")
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 0.37 + j * 1.13).toFloat))
    }.toDF("vec_id", "embedding")
    // the input EXISTS (schema-bearing parquet) but holds no rows yet —
    // the upstream ingestion job hasn't landed
    emb.filter($"vec_id" < 0).write.parquet(dir.resolve("emb").toString)
    val cfg = dir.resolve("index.yaml")
    Files.writeString(cfg,
      s"""kind: sq
         |input: ${dir.resolve("emb")}
         |store: ${dir.resolve("sqstore")}
         |id_field: vec_id
         |vector_field: embedding
         |dim: 8
         |""".stripMargin)
    val policy = JobRunner.RetryPolicy(maxRetries = 3, initialDelayMs = 1)
    var slept = 0
    // the backoff sleep doubles as "upstream lands between attempts"
    val rc = runScheduled(spark, cfg.toString, policy,
      sleep = _ => {
        slept += 1
        emb.write.mode("overwrite").parquet(dir.resolve("emb").toString)
      },
      log = _ => ())
    rc shouldBe graft.core.ExitCodes.Success
    slept shouldBe 1 // one backoff, then the build went through
    graft.operators.Similarity.readSqTrainParams(
      spark, dir.resolve("sqstore").toString)._1.length shouldBe 8
  }

  test("runScheduled drives kind: compact — segmented index and flat store, probes bit-identical across compaction") {
    import spark.implicits._
    val dir = Files.createTempDirectory("orch-cpt-")
    val policy = JobRunner.RetryPolicy(maxRetries = 2, initialDelayMs = 1)
    var slept = 0
    // segmented BM25 index: two appended segments → one
    val docs = Seq((1L, "spark scala engine"), (2L, "scala query engine"),
      (3L, "parquet files store")).toDF("doc_id", "text")
    val idx = dir.resolve("idx").toString
    graft.operators.Search.writeIndexSegment(
      docs.filter($"doc_id" <= 2), "doc_id", "text", idx, buckets = 4)
    graft.operators.Search.writeIndexSegment(
      docs.filter($"doc_id" > 2), "doc_id", "text", idx, buckets = 4)
    val queries = Seq((100L, "scala engine")).toDF("qid", "qtext")
    def probe() = graft.operators.Search.bm25TopKSegmented(
      spark, idx, queries, "qid", "qtext", k = 5)
      .collect().map(_.toString).sorted.toSeq
    val before = probe()
    spark.read.parquet(s"$idx/_meta").count() shouldBe 2
    val segCfg = dir.resolve("compact_seg.yaml")
    Files.writeString(segCfg,
      s"kind: compact\nstore: $idx\nfamily: segments\n")
    BuildIndex.isIndexConfig(segCfg.toString) shouldBe true
    runScheduled(spark, segCfg.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Success
    slept shouldBe 0
    spark.read.parquet(s"$idx/_meta").count() shouldBe 1
    probe() shouldBe before
    // flat store: two appends of 8 files each → size-targeted rewrite,
    // row multiset unchanged
    val flat = dir.resolve("flat").toString
    val rows = (0L until 100L).map(i => (i, s"bk$i")).toDF("id", "bk")
    rows.repartition(8).write.parquet(flat)
    rows.repartition(8).write.mode("append").parquet(flat)
    val beforeRows = spark.read.parquet(flat)
      .collect().map(_.toString).sorted.toSeq
    val flatCfg = dir.resolve("compact_flat.yaml")
    Files.writeString(flatCfg,
      s"kind: compact\nstore: $flat\nfamily: flat\n" +
        "target_file_bytes: 134217728\n")
    runScheduled(spark, flatCfg.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Success
    slept shouldBe 0
    val fs = new java.io.File(flat).listFiles()
      .count(f => f.isFile && !f.getName.startsWith("_") &&
        !f.getName.startsWith("."))
    fs shouldBe 1 // 200 tiny rows land well under one target file
    spark.read.parquet(flat).collect().map(_.toString).sorted.toSeq shouldBe
      beforeRows
    // a compaction target that doesn't exist is a CONFIG error (path
    // typo / schedule misordering): fails once, no backoff burned
    val missing = dir.resolve("compact_missing.yaml")
    Files.writeString(missing,
      s"kind: compact\nstore: ${dir.resolve("nowhere")}\nfamily: flat\n")
    runScheduled(spark, missing.toString, policy,
      sleep = _ => slept += 1, log = _ => ()) shouldBe
      graft.core.ExitCodes.Failure
    slept shouldBe 0
  }

  test("recognized kind missing its other keys still dispatches to the build path and fails once, loudly") {
    val dir = Files.createTempDirectory("orch-shape-")
    val policy = JobRunner.RetryPolicy(maxRetries = 3, initialDelayMs = 1)
    // kind: compact without family — must reach BuildIndex's one loud
    // 'requires family' refusal, not fall through to the JobRunner and
    // burn the schedule's retries on a not-a-job error
    val noFam = dir.resolve("compact_nofam.yaml")
    Files.writeString(noFam, s"kind: compact\nstore: ${dir.resolve("s")}\n")
    BuildIndex.isIndexConfig(noFam.toString) shouldBe true
    var slept = 0
    val logs = scala.collection.mutable.ArrayBuffer[String]()
    runScheduled(spark, noFam.toString, policy,
      sleep = _ => slept += 1, log = logs += _) shouldBe
      graft.core.ExitCodes.Failure
    slept shouldBe 0 // config error: fail once, no backoff burned
    logs.mkString(" ") should include("requires family")
    // same for a build kind missing input
    val noInput = dir.resolve("bm25_noinput.yaml")
    Files.writeString(noInput, s"kind: bm25\nstore: ${dir.resolve("s2")}\n")
    BuildIndex.isIndexConfig(noInput.toString) shouldBe true
    logs.clear()
    runScheduled(spark, noInput.toString, policy,
      sleep = _ => slept += 1, log = logs += _) shouldBe
      graft.core.ExitCodes.Failure
    slept shouldBe 0
    logs.mkString(" ") should include("requires input")
  }

  test("runner config loads schedules with retry settings") {
    val dir = Files.createTempDirectory("orch-")
    val p = dir.resolve("runner.yaml")
    Files.writeString(p,
      """schedules:
        |  - name: nightly
        |    job_path: jobs/a.yaml
        |    cron: "0 2 * * *"
        |    retry_config: {max_retries: 5, initial_delay_seconds: 1}
        |  - name: fast
        |    job_path: jobs/b.yaml
        |    interval_seconds: 30
        |""".stripMargin)
    val ss = Orchestrator.loadSchedules(p.toString)
    ss.map(_.name) shouldBe Seq("nightly", "fast")
    ss.head.retry.maxRetries shouldBe 5
    ss.head.retry.initialDelayMs shouldBe 1000
    ss(1).intervalSeconds shouldBe Some(30)
    Orchestrator.loadConcurrency(p.toString) shouldBe 1 // absent → sequential
    val p2 = dir.resolve("runner2.yaml")
    Files.writeString(p2,
      "concurrency_per_tenant: 4\nschedules: []\n")
    Orchestrator.loadConcurrency(p2.toString) shouldBe 4
  }
}
