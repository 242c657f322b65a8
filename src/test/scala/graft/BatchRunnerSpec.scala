package graft

import graft.core.ExitCodes
import java.nio.file.{Files, Path, Paths}

/** §3.2 `run --job-dir` batch runner: recursive load skipping broken
  * YAMLs (config.py:887-945), tenant inference/override (cli.py:162-181),
  * warn-only startup checks, sequential execution, and exit 0 only if
  * every job exits 0 (cli.py:316-323).
  */
class BatchRunnerSpec extends SparkSpec {

  private def write(p: Path, content: String): Path = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p
  }

  /** shared/ holds the recipes+asset (NOT under the job dir, so the
    * recursive job load only sees jobs); jobs/ holds the job YAMLs.
    */
  private def scaffold(): (Path, Path) = {
    val root = Files.createTempDirectory("graft-batch-")
    val shared = root.resolve("shared")
    write(shared.resolve("recipe_csv.yaml"),
      """name: csv
        |type: csv
        |roles: [source, target]
        |default_engine:
        |  type: native
        |  options:
        |    native: {delimiter: ",", quote_char: '"'}
        |""".stripMargin)
    write(shared.resolve("recipe_parquet.yaml"),
      """name: parquet
        |type: parquet
        |roles: [source, target]
        |default_engine: {type: native}
        |""".stripMargin)
    write(shared.resolve("asset.yaml"),
      """asset:
        |  name: people
        |  version: "1.0"
        |  domain: hr
        |  data_product: core
        |  schema:
        |    - {name: id, type: integer, required: true}
        |    - {name: name, type: string, required: true}
        |""".stripMargin)
    (root, root.resolve("jobs"))
  }

  private def jobYaml(tenant: String, csv: String, out: String): String =
    s"""tenant_id: $tenant
       |source_connector_path: ../shared/recipe_csv.yaml
       |target_connector_path: ../shared/recipe_parquet.yaml
       |asset_path: ../shared/asset.yaml
       |schema_validation_mode: strict
       |source:
       |  files:
       |    - {path: $csv}
       |target:
       |  connection: {path: $out}
       |""".stripMargin

  private def goodCsv(root: Path, name: String): String =
    write(root.resolve(name), "id,name\n1,alice\n2,bob\n").toString

  private def badCsv(root: Path, name: String): String =
    write(root.resolve(name), "id,name\n,missing\n").toString

  test("all jobs green: exit 0, every job executed in path order") {
    val (root, jobs) = scaffold()
    write(jobs.resolve("a.yaml"),
      jobYaml("t1", goodCsv(root, "a.csv"), root.resolve("out_a").toString))
    write(jobs.resolve("nested/b.yaml"), // recursive discovery; paths are job-relative
      jobYaml("t1", goodCsv(root, "b.csv"), root.resolve("out_b").toString)
        .replace("../shared/", "../../shared/"))
    val logged = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val r = BatchRunner.runAll(spark, jobs, log = m => logged.add(m))
    r.exitCode shouldBe 0
    r.results.map(_._2) shouldBe Seq(0, 0)
    r.startup.tenantId shouldBe "t1"
    spark.read.parquet(root.resolve("out_a/hr/core/people").toString)
      .count() shouldBe 2
    // tenant-level rollup: every job's records/bytes aggregated, and the
    // summary line is the batch's last log entry
    r.summary.tenantId shouldBe "t1"
    r.summary.jobsRun shouldBe 2
    r.summary.jobsSucceeded shouldBe 2
    r.summary.totalRecords shouldBe 4 // 2 csv rows per job
    r.summary.totalValidRecords shouldBe 4
    r.summary.totalBytesWritten should be > 0L
    r.summary.wallClockSeconds should be > 0.0
    import scala.jdk.CollectionConverters.ListHasAsScala
    logged.asScala.last should startWith("tenant=t1 jobs=2 succeeded=2")
  }

  test("concurrency=2: jobs overlap, results keep job order, exit contract holds") {
    val (root, jobs) = scaffold()
    for (n <- Seq("a", "b", "c", "d"))
      write(jobs.resolve(s"$n.yaml"),
        jobYaml("t1", goodCsv(root, s"$n.csv"), root.resolve(s"out_$n").toString))
    // latch-proof of overlap: with 2 workers, two jobs must be inside the
    // runner simultaneously at least once
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CountDownLatch(2)
    val order = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val r = BatchRunner.runAll(spark, jobs, concurrency = 2, log = _ => (),
      runJobOverride = Some { (_, p, _) =>
        val now = inFlight.incrementAndGet()
        maxInFlight.getAndUpdate(m => math.max(m, now))
        gate.countDown()
        // first two jobs wait for each other — deadlock-free because the
        // pool has exactly 2 workers and both latch holders are running
        gate.await(10, java.util.concurrent.TimeUnit.SECONDS)
        order.add(p.getFileName.toString)
        inFlight.decrementAndGet()
        if (p.getFileName.toString == "c.yaml") 2 else 0
      })
    maxInFlight.get() shouldBe 2
    // results preserve deterministic job order regardless of completion order
    r.results.map(_._1.getFileName.toString) shouldBe
      Seq("a.yaml", "b.yaml", "c.yaml", "d.yaml")
    r.results.map(_._2) shouldBe Seq(0, 0, 2, 0)
    r.exitCode shouldBe ExitCodes.Failure
  }

  test("concurrency=2 with real jobs: all outputs land, exit 0") {
    val (root, jobs) = scaffold()
    for (n <- Seq("a", "b", "c"))
      write(jobs.resolve(s"$n.yaml"),
        jobYaml("t1", goodCsv(root, s"$n.csv"), root.resolve(s"out_$n").toString))
    val r = BatchRunner.runAll(spark, jobs, concurrency = 2, log = _ => ())
    r.exitCode shouldBe 0
    for (n <- Seq("a", "b", "c"))
      spark.read.parquet(root.resolve(s"out_$n/hr/core/people").toString)
        .count() shouldBe 2
  }

  test("broken YAML is skipped with a warning, rest still run (config.py:887-945)") {
    val (root, jobs) = scaffold()
    write(jobs.resolve("a.yaml"),
      jobYaml("t1", goodCsv(root, "a.csv"), root.resolve("out_a").toString))
    write(jobs.resolve("broken.yaml"), "tenant_id: [unclosed\n  nope")
    var logged = Vector.empty[String]
    val r = BatchRunner.runAll(spark, jobs, log = logged :+= _)
    r.exitCode shouldBe 0
    r.results.size shouldBe 1
    r.startup.warnings.exists(_.startsWith("job skipped:")) shouldBe true
    logged.exists(_.contains("1 skipped")) shouldBe true
  }

  test("one failing job: batch exit 2, remaining jobs still execute (cli.py:316-323)") {
    val (root, jobs) = scaffold()
    write(jobs.resolve("a_fails.yaml"), // strict + missing required ⇒ exit 2
      jobYaml("t1", badCsv(root, "bad.csv"), root.resolve("out_bad").toString))
    write(jobs.resolve("b_ok.yaml"),
      jobYaml("t1", goodCsv(root, "ok.csv"), root.resolve("out_ok").toString))
    val r = BatchRunner.runAll(spark, jobs, log = _ => ())
    r.exitCode shouldBe ExitCodes.Failure
    r.results.map(_._2) shouldBe Seq(ExitCodes.Failure, 0)
    // the failing job did not stop b_ok
    spark.read.parquet(root.resolve("out_ok/hr/core/people").toString)
      .count() shouldBe 2
  }

  test("nothing loads: fatal (config.py:941-945)") {
    val (_, jobs) = scaffold()
    write(jobs.resolve("broken.yaml"), "tenant_id: [unclosed")
    an[IllegalArgumentException] should be thrownBy
      BatchRunner.loadJobsFromDirectory(jobs)
    an[IllegalArgumentException] should be thrownBy
      BatchRunner.loadJobsFromDirectory(Paths.get("/no/such/dir"))
  }

  test("tenant inference: conflicting tenants fatal; override must match every job (cli.py:162-181)") {
    val (root, jobs) = scaffold()
    write(jobs.resolve("a.yaml"),
      jobYaml("t1", goodCsv(root, "a.csv"), root.resolve("oa").toString))
    write(jobs.resolve("b.yaml"),
      jobYaml("t2", goodCsv(root, "b.csv"), root.resolve("ob").toString))
    val loaded = BatchRunner.loadJobsFromDirectory(jobs)
    val e = the[IllegalArgumentException] thrownBy
      BatchRunner.resolveTenant(loaded.jobs, None)
    e.getMessage should include("conflicting tenant_ids")
    val e2 = the[IllegalArgumentException] thrownBy
      BatchRunner.resolveTenant(loaded.jobs, Some("t1"))
    e2.getMessage should include("Tenant ID mismatch")
    BatchRunner.resolveTenant(loaded.jobs.take(1), Some("t1")) shouldBe "t1"
  }

  test("env-var validation: unset ${VAR} in recipe template surfaces as a warning (config.py:825-885)") {
    val (root, jobs) = scaffold()
    write(root.resolve("shared/recipe_pg.yaml"),
      """name: pg
        |type: postgres
        |roles: [source]
        |connection_template:
        |  host: ${GRAFT_TEST_UNSET_HOST}
        |  password: ${GRAFT_TEST_UNSET_PW}
        |""".stripMargin)
    val p = write(jobs.resolve("a.yaml"),
      jobYaml("t1", goodCsv(root, "a.csv"), root.resolve("oa").toString)
        .replace("../shared/recipe_csv.yaml", "../shared/recipe_pg.yaml"))
    val job = BatchRunner.LoadedJob(p, graft.config.JobConfig.fromYaml(p.toString))
    val missing = BatchRunner.missingEnvVars(job, env = Map.empty)
    missing should contain allOf ("GRAFT_TEST_UNSET_HOST", "GRAFT_TEST_UNSET_PW")
    BatchRunner.missingEnvVars(job,
      env = Map("GRAFT_TEST_UNSET_HOST" -> "h", "GRAFT_TEST_UNSET_PW" -> "x")) shouldBe empty
  }

  test("infrastructure presence: iceberg needs S3_ENDPOINT (+NESSIE_URI with catalog)") {
    val (root, jobs) = scaffold()
    write(root.resolve("shared/recipe_iceberg.yaml"),
      """name: ice
        |type: iceberg
        |roles: [target]
        |""".stripMargin)
    val p = write(jobs.resolve("a.yaml"),
      s"""tenant_id: t1
         |source_connector_path: ../shared/recipe_csv.yaml
         |target_connector_path: ../shared/recipe_iceberg.yaml
         |asset_path: ../shared/asset.yaml
         |source:
         |  files:
         |    - {path: ${goodCsv(root, "a.csv")}}
         |target:
         |  catalog: {type: nessie}
         |""".stripMargin)
    val job = BatchRunner.LoadedJob(p, graft.config.JobConfig.fromYaml(p.toString))
    val errs = BatchRunner.infrastructureErrors(job, env = Map.empty)
    errs.exists(_.contains("S3_ENDPOINT")) shouldBe true
    errs.exists(_.contains("NESSIE_URI")) shouldBe true
    val up: graft.infra.HttpProbe = (_, _) => graft.infra.ProbeResult.Status(200)
    BatchRunner.infrastructureErrors(job,
      env = Map("S3_ENDPOINT" -> "http://localhost:9000",
        "NESSIE_URI" -> "http://localhost:19120/api/v1"),
      probe = up) shouldBe empty
    // reachable env vars but dead endpoints ⇒ connectivity errors
    val down: graft.infra.HttpProbe = (_, _) => graft.infra.ProbeResult.ConnectFailed("refused")
    val dead = BatchRunner.infrastructureErrors(job,
      env = Map("S3_ENDPOINT" -> "http://localhost:9000",
        "NESSIE_URI" -> "http://localhost:19120/api/v1"),
      probe = down)
    dead.exists(_.contains("S3 connectivity failed")) shouldBe true
    dead.exists(_.contains("Nessie connectivity failed")) shouldBe true
  }
}
