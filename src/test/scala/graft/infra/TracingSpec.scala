package graft.infra

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Span tracing (reference tracing.py): nesting, duration, error status,
  * and the log-line degradation format.
  */
class TracingSpec extends AnyFunSuite with Matchers {

  test("spans nest: child records the enclosing span as parent") {
    val (tracer, spans) = Tracing.collector()
    tracer.span("job.x") {
      tracer.span("phase.extract") { 1 }
      tracer.span("phase.commit") { 2 }
    }
    val byName = spans().map(s => s.name -> s).toMap
    byName("phase.extract").parent shouldBe Some("job.x")
    byName("phase.commit").parent shouldBe Some("job.x")
    byName("job.x").parent shouldBe None
    // children emitted before the root (they end first)
    spans().map(_.name) shouldBe Seq("phase.extract", "phase.commit", "job.x")
  }

  test("duration uses the injected clock; result passes through") {
    var t = 0L
    val buf = scala.collection.mutable.ArrayBuffer[Span]()
    val tracer = new Tracer(buf += _, () => { t += 5000000L; t })
    val out = tracer.span("s") { "value" }
    out shouldBe "value"
    buf.head.durationMs shouldBe 5.0 +- 0.001
  }

  test("exception: error status recorded, exception re-thrown (tracing.py:55-63)") {
    val (tracer, spans) = Tracing.collector()
    val e = intercept[RuntimeException] {
      tracer.span("job.boom") {
        tracer.span("phase.extract") { throw new RuntimeException("nope") }
      }
    }
    e.getMessage shouldBe "nope"
    spans().map(s => s.name -> s.ok) shouldBe
      Seq("phase.extract" -> false, "job.boom" -> false)
    spans().head.error shouldBe Some("nope")
  }

  test("logTracer emits one structured line per span") {
    var lines = Vector.empty[String]
    val tracer = Tracing.logTracer(lines :+= _)
    tracer.span("phase.commit", Map("target.type" -> "parquet")) { () }
    lines should have size 1
    lines.head should startWith("span=phase.commit parent=- dur_ms=")
    lines.head should include("status=ok")
    lines.head should include("target.type=parquet")
  }

  test("disabled tracer is transparent") {
    Tracing.disabled.span("x") { 42 } shouldBe 42
    intercept[IllegalStateException] {
      Tracing.disabled.span("x") { throw new IllegalStateException("boom") }
    }
  }
}
