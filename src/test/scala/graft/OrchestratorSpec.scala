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
    // a TRANSIENT failure (missing input path is an AnalysisException,
    // not a config refusal) retries under the schedule's policy
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
    slept shouldBe 3 // maxRetries backoffs burned
    // a non-index YAML falls through to the JobRunner path (whose
    // loader rejects it as a job, after retries)
    val notIdx = dir.resolve("job.yaml")
    Files.writeString(notIdx, "tenant_id: t1\n")
    runScheduled(spark, notIdx.toString, policy,
      sleep = _ => (), log = _ => ()) should not be
      graft.core.ExitCodes.Success
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
