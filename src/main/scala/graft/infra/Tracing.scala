package graft.infra

/** Span-style execution tracing (reference tracing.py:1-168).
  *
  * The reference wraps job execution and its phases in OpenTelemetry
  * spans when the OTel SDK is importable and degrades to debug logging
  * otherwise. This build has no OTel on the classpath (zero-egress, no
  * extra deps), so the degradation path IS the implementation: spans are
  * recorded with wall-clock + outcome and emitted through an injectable
  * sink — a structured log line by default, a collector in tests, an
  * OTel bridge in a deployment that ships the SDK.
  *
  * Driver-side only by design: Spark executors have their own metrics
  * system; what tracing adds is the DRIVER phase timeline (plan, commit,
  * state persist) that executor metrics can't see.
  */
final case class Span(
    name: String,
    parent: Option[String],
    attributes: Map[String, String],
    startNanos: Long,
    endNanos: Long,
    error: Option[String]) {
  def durationMs: Double = (endNanos - startNanos) / 1e6
  def ok: Boolean = error.isEmpty
}

/** Nesting tracer: `span("phase.extract") { ... }` records wall-clock and
  * outcome, parenting to the enclosing span on the same thread (the
  * reference's context-manager nesting). Exceptions are recorded as
  * error status and re-thrown (tracing.py:55-63).
  */
final class Tracer(emit: Span => Unit, clock: () => Long = () => System.nanoTime()) {
  private val stack = new ThreadLocal[List[String]] {
    override def initialValue(): List[String] = Nil
  }

  def span[T](name: String, attributes: Map[String, String] = Map.empty)(body: => T): T = {
    val t0 = clock()
    stack.set(name :: stack.get())
    val parent = stack.get().drop(1).headOption
    try {
      val result = body
      emit(Span(name, parent, attributes, t0, clock(), None))
      result
    } catch {
      case e: Throwable =>
        emit(Span(name, parent, attributes, t0, clock(),
          Some(Option(e.getMessage).getOrElse(e.getClass.getName))))
        throw e
    } finally stack.set(stack.get().drop(1))
  }
}

object Tracing {

  /** Spans vanish; zero overhead beyond the clock reads. */
  val disabled: Tracer = new Tracer(_ => ())

  /** One structured line per completed span — the log-degradation path
    * (tracing.py:110-115). Route `log` through the secret Redactor when
    * attributes could carry tainted values.
    */
  def logTracer(log: String => Unit): Tracer = new Tracer({ s =>
    val attrs =
      if (s.attributes.isEmpty) ""
      else s.attributes.toSeq.sorted.map { case (k, v) => s" $k=$v" }.mkString
    log(f"span=${s.name} parent=${s.parent.getOrElse("-")} " +
      f"dur_ms=${s.durationMs}%.1f status=${if (s.ok) "ok" else "error"}" +
      s.error.map(e => s" error=$e").getOrElse("") + attrs)
  })

  /** Collect spans into a buffer (tests; an OTel exporter would sit here). */
  def collector(): (Tracer, () => Seq[Span]) = {
    val buf = new scala.collection.mutable.ArrayBuffer[Span]()
    (new Tracer(s => buf.synchronized { buf += s }),
      () => buf.synchronized(buf.toVector))
  }
}
