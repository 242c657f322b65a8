package graft.infra

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers
import java.net.ServerSocket

/** Health checks vs infrastructure.py: port probing against a real local
  * listener, Nessie/S3 reachability decision tables via a scripted probe.
  */
class InfrastructureSpec extends AnyFunSuite with Matchers {

  private def probe(f: String => ProbeResult): HttpProbe = (url, _) => f(url)

  test("validateRequiredPorts: open port passes, closed port throws listing it") {
    val srv = new ServerSocket(0)
    try {
      val open = srv.getLocalPort
      Infrastructure.validateRequiredPorts(Seq(open)) // no throw
      val closed = { val s = new ServerSocket(0); val p = s.getLocalPort; s.close(); p }
      val e = the[IllegalArgumentException] thrownBy
        Infrastructure.validateRequiredPorts(Seq(open, closed), timeoutMs = 300)
      e.getMessage should include(closed.toString)
      e.getMessage should not include s"[$open"
    } finally srv.close()
  }

  test("nessie: /config 200 or 404 is up; fallback accepts 405; other codes fail (infrastructure.py:44-85)") {
    Infrastructure.checkNessieConnectivity("http://h:19120/api/v1",
      probe(url => if (url.endsWith("/api/v1/config")) ProbeResult.Status(200)
                   else fail("fallback should not run")))
    Infrastructure.checkNessieConnectivity("http://h:19120/api/v1",
      probe(_ => ProbeResult.Status(404)))
    // 500 on config, 405 on base api => up (server responding)
    Infrastructure.checkNessieConnectivity("http://h:19120/api/v1",
      probe(url => if (url.endsWith("/config")) ProbeResult.Status(500)
                   else ProbeResult.Status(405)))
    val e = the[IllegalArgumentException] thrownBy
      Infrastructure.checkNessieConnectivity("http://h:19120/api/v1",
        probe(_ => ProbeResult.Status(500)))
    e.getMessage should include("HTTP 500")
    the[IllegalArgumentException] thrownBy {
      Infrastructure.checkNessieConnectivity("http://h:19120/api/v1",
        probe(_ => ProbeResult.ConnectFailed("refused")))
    } should have message "Cannot connect to Nessie at http://h:19120/api/v1: refused"
    the[IllegalArgumentException] thrownBy {
      Infrastructure.checkNessieConnectivity("http://h:19120/api/v1",
        probe(_ => ProbeResult.TimedOut))
    } should have message "Nessie connection timeout at http://h:19120/api/v1"
  }

  test("s3: minio liveness 200 is up; otherwise ANY endpoint response (even 403) is up (infrastructure.py:88-130)") {
    Infrastructure.checkS3Connectivity("http://h:9000",
      probe(url => if (url.endsWith("/minio/health/live")) ProbeResult.Status(200)
                   else fail("endpoint fallback should not run")))
    // liveness missing (404), endpoint answers 403 => reachable
    Infrastructure.checkS3Connectivity("http://h:9000",
      probe(url => if (url.endsWith("/minio/health/live")) ProbeResult.Status(404)
                   else ProbeResult.Status(403)))
    the[IllegalArgumentException] thrownBy {
      Infrastructure.checkS3Connectivity("http://h:9000",
        probe(_ => ProbeResult.ConnectFailed("refused")))
    } should have message "Cannot connect to S3 at http://h:9000: refused"
  }

  test("validateTarget iceberg: env presence + connectivity are errors, ports + missing catalog are warnings (infrastructure.py:132-229)") {
    // nothing set
    val r0 = Infrastructure.validateTarget("iceberg", hasCatalog = true,
      env = Map.empty, probe = probe(_ => ProbeResult.Status(200)),
      portCheck = (_, _) => ())
    r0.errors should contain("S3_ENDPOINT environment variable is not set")
    r0.errors.exists(_.contains("NESSIE_URI")) shouldBe true
    // all up, ports open
    val env = Map("S3_ENDPOINT" -> "http://localhost:9000",
      "NESSIE_URI" -> "http://localhost:19120/api/v1")
    val r1 = Infrastructure.validateTarget("iceberg", hasCatalog = true,
      env = env, probe = probe(_ => ProbeResult.Status(200)), portCheck = (_, _) => ())
    r1.errors shouldBe empty
    r1.warnings shouldBe empty
    // no catalog => warning, nessie never probed
    val r2 = Infrastructure.validateTarget("iceberg", hasCatalog = false,
      env = env, probe = probe(url => {
        url should not include "19120"; ProbeResult.Status(200)
      }), portCheck = (_, _) => ())
    r2.warnings.exists(_.contains("No catalog configured")) shouldBe true
    // closed ports downgrade to warnings, with the port parsed from the URI
    var probed = Vector.empty[Seq[Int]]
    val r3 = Infrastructure.validateTarget("iceberg", hasCatalog = true,
      env = Map("S3_ENDPOINT" -> "http://localhost:9123",
        "NESSIE_URI" -> "http://localhost:19125/api/v1"),
      probe = probe(_ => ProbeResult.Status(200)),
      portCheck = (ps, _) => { probed :+= ps; throw new IllegalArgumentException(s"closed $ps") })
    r3.errors shouldBe empty
    probed shouldBe Vector(Seq(19125), Seq(9123))
    r3.warnings.exists(_.startsWith("Nessie port check:")) shouldBe true
    r3.warnings.exists(_.startsWith("S3 port check:")) shouldBe true
  }

  test("validateTarget s3 + non-network targets; validateOrThrow joins errors") {
    Infrastructure.validateTarget("s3", hasCatalog = false, env = Map.empty)
      .errors shouldBe Seq("S3_ENDPOINT environment variable is not set")
    Infrastructure.validateTarget("parquet", hasCatalog = false, env = Map.empty)
      .errors shouldBe empty
    var logged = Vector.empty[String]
    val e = the[IllegalArgumentException] thrownBy
      Infrastructure.validateOrThrow("iceberg", hasCatalog = false,
        env = Map.empty, probe = probe(_ => ProbeResult.Status(200)),
        log = logged :+= _)
    e.getMessage should include("S3_ENDPOINT")
    logged.exists(_.contains("Infrastructure warning")) shouldBe true
  }
}
