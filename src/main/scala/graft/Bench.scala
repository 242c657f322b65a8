package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // min over `reps` runs per query: single-run local[32] timings swing
    // ±20% with GC/JIT noise; the minimum is the stable "cost of the
    // plan" estimate. Per-rep times are ALSO emitted so a contended run
    // (uniform inflation across untouched queries — the r9 failure mode)
    // is distinguishable from a real plan regression after the fact.
    val reps = sys.env.getOrElse("GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // absorb one-time JVM/codegen/IO warm-up outside the timed region
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // Contention sentinel: time a tiny fixed probe before the suite,
    // after every 10th query, and after — a SERIES, because a two-point
    // before/after check is blind to load that starts and ends mid-run
    // (measured: a concurrent test suite inflated 15 queries and still
    // left before ≈ after). Its plan never changes, so on a quiet
    // machine the series is flat after the first (still-warming) probe.
    // min-of-3 per probe so the sentinel isn't noisier than what it
    // guards.
    // Option, not a bare Double: if the probe file is missing the bench
    // must still run (without the contention check), matching the
    // swallow-Throwable warm-up above — a dev pointing SPARK_GRAFT_SF_DIR
    // at a partial dataset shouldn't crash at startup.
    def sentinelProbe(): Option[Double] =
      try {
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(s"$sfDir/region.parquet").count()
          (System.nanoTime() - t0) / 1e9
        }
        Some(ts.min)
      } catch { case _: Throwable => None }
    val sentinels = scala.collection.mutable.ArrayBuffer[Double]()
    sentinels ++= sentinelProbe()
    // optional args filter to isolated queries (dev loop; driver passes none)
    val only = args.toSet
    val registered = (SparkEntry.queries ++ Queries.benchOnly).toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
    val (perRep, errors) = timeSuite(spark, sfDir, registered, reps,
      onTick = qi => if (qi > 0 && qi % 10 == 0) sentinels ++= sentinelProbe())
    sentinels ++= sentinelProbe()
    val spreads = perRep.map { case (n, ts) =>
      n -> (if (ts.min > 0) median(ts) / ts.min else 1.0)
    }
    val contended =
      contentionVerdict(sentinels.toSeq, spreads.map(_._2), reps)
    val results = perRep.map { case (n, ts) => n -> ts.min }
    val total = results.map(_._2).sum
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, 4) }
      .mkString("{", ",", "}")
    val repJson = perRep.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt(_, 4)).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val spreadJson = spreads.map { case (k, v) => "\"" + k + "\":" + fmt(v, 4) }
      .mkString("{", ",", "}")
    val sentinelJson = sentinels.map(fmt(_, 4)).mkString("[", ",", "]")
    val sentinelObj =
      if (sentinels.isEmpty) s"""{"series":[]}"""
      else s"""{"series":$sentinelJson,"before":${fmt(sentinels.head, 4)},"after":${fmt(sentinels.last, 4)}}"""
    val errJson = errors.map { case (k, m) => "\"" + k + "\":" + jsonStr(m) }
      .mkString("{", ",", "}")
    // A thrown query must be LOUD: the r11/r12 benches recorded
    // time-to-throw for two analysis-broken queries as if they ran.
    if (errors.nonEmpty)
      System.err.println(s"[bench] ${errors.size} queries FAILED: " +
        errors.map(_._1).mkString(", "))
    val full = s"""{"metric":"total","value":${fmt(total, 4)},"unit":"sec","queries":$qs,"rep_times":$repJson,"spread":$spreadJson,"sentinel":$sentinelObj,"contended":$contended,"errors":$errJson,"sf":"$sfDir","reps":$reps,"agg":"min"}"""
    // Full detail also lands in a FILE: the driver that collects this
    // run keeps only a bounded tail of stdout, so the per-rep evidence
    // must survive somewhere a reviewer can always reach.
    val detailPath = sys.env.getOrElse("GRAFT_BENCH_DETAIL", "BENCH_DETAIL.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(detailPath),
      (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    catch { case _: Throwable => () }
    // Two stdout lines, full first, compact LAST. The collector keeps
    // only the final ~2000 characters of output and parses a line that
    // starts with '{': the full line alone is ~4 kB and gets its head
    // truncated away, so the parseable record must be the short one.
    // The compact line keeps the slowest queries (where the perf signal
    // lives) under a hard byte budget; the full map is one line up and
    // in the detail file.
    println(full)
    println(compactLine(total, sfDir, contended, results, reps, errors.size))
    spark.stop()
  }

  /** Time each registered query `reps` times. A query whose execution
    * THROWS lands in the returned error map (exception class + first
    * message line) instead of the timing map, and its remaining reps are
    * skipped — recording time-to-throw as a legitimate number made two
    * analysis-broken queries look benched for two rounds (r11/r12).
    *
    * Each timed run is isolated: operators that persist() intermediates
    * (dedup/ANN families) would otherwise leave cached blocks that tax
    * every query after them in the alphabetical order — the r7 bench
    * showed code-unchanged small queries slowing 2-8x from exactly this.
    * Cache clear + GC happen OUTSIDE the timed region, then a 200 ms
    * drain so the async ContextCleaner's broadcast/shuffle cleanup does
    * not land inside whichever small query runs next (mdkv_doc_level
    * measured 0.7 s isolated vs ~3 s mid-suite from exactly this).
    *
    * The noop sink, not count(): count() lets Catalyst prune every
    * unreferenced projection, so projection-heavy queries would time a
    * bare scan instead of the operator. The noop sink consumes every row
    * and column with zero write cost.
    */
  private[graft] def timeSuite(spark: SparkSession, sfDir: String,
      queries: Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)],
      reps: Int, onTick: Int => Unit = _ => ())
      : (Seq[(String, Seq[Double])], Seq[(String, String)]) = {
    val timed = queries.zipWithIndex.map { case ((name, fn), qi) =>
      onTick(qi)
      var err: Option[String] = None
      val times = scala.collection.mutable.ArrayBuffer[Double]()
      var rep = 0
      while (rep < reps && err.isEmpty) {
        spark.catalog.clearCache()
        System.gc()
        Thread.sleep(200)
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          times += (System.nanoTime() - t0) / 1e9
        } catch {
          case e: Throwable =>
            err = Some(e.getClass.getSimpleName + ": " +
              Option(e.getMessage).getOrElse("")
                .linesIterator.take(1).mkString.take(200))
        }
        rep += 1
      }
      (name, times.toSeq, err)
    }
    (timed.collect { case (n, ts, None) => n -> ts },
      timed.collect { case (n, _, Some(m)) => n -> m })
  }

  /** Minimal JSON string escape for exception messages. */
  private[graft] def jsonStr(s: String): String =
    s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }.mkString("\"", "", "\"")

  /** Locale.ROOT: the f-interpolator honors the JVM default locale, and
    * a comma-decimal locale would emit invalid JSON.
    */
  private[graft] def fmt(d: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(d))

  /** The machine-readable benchmark record, sized to survive tail
    * truncation: one line, starting at column zero with '{', at most
    * [[CompactBudget]] bytes INCLUDING everything that follows it on a
    * collector's 2000-byte tail (sbt's trailing "[success] ..." line).
    *
    * Queries are admitted slowest-first until the budget is reached —
    * regressions surface in the slow tail, so those names must always
    * be present — and the count of dropped fast queries is recorded as
    * `omitted` (their time is still inside `value`). Values carry 2
    * decimals: at the ≥50 ms magnitude where queries can be omitted,
    * ±5 ms resolution is already below run-to-run noise.
    */
  private[graft] val CompactBudget = 1800
  private[graft] def compactLine(total: Double, sfDir: String,
      contended: Boolean, results: Seq[(String, Double)], reps: Int,
      errors: Int = 0): String = {
    val sfName = sfDir.replaceAll("/+$", "").split('/').lastOption.getOrElse(sfDir)
    def render(entries: Seq[(String, Double)], omitted: Int): String = {
      val qs = entries.sortBy(_._1)
        .map { case (k, v) => "\"" + k + "\":" + fmt(v, 2) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","sf":"$sfName","reps":$reps,"agg":"min","contended":$contended,"errors":$errors,"omitted":$omitted,"detail":"BENCH_DETAIL.json","queries":$qs}"""
    }
    val bySlowest = results.sortBy(-_._2)
    // admit slowest-first until the rendered line fits the budget
    var keep = bySlowest.size
    while (keep > 0 &&
        render(bySlowest.take(keep), bySlowest.size - keep).length > CompactBudget)
      keep -= 1
    render(bySlowest.take(keep), bySlowest.size - keep)
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Contention verdict from two independent signals; flagged when
    * EITHER fires (each alone can miss a load shape):
    *
    *  - Sentinel drift: any post-warm-up probe (the FIRST probe still
    *    carries JIT/IO warm-up and is excluded) exceeding 2.5× the
    *    series minimum means the machine slowed mid-run even if it was
    *    quiet at both ends.
    *  - Spread: per-query median/min over the reps. A quiet full run
    *    measures ~5% of queries above 1.5 and none above 2.0; a run
    *    co-loaded with a test suite measures 18% / 11%. Thresholds sit
    *    between: >10% above 1.5 or >5% above 2.0. Needs >= 3 reps
    *    (with 2, the median averages in the first rep's legitimate
    *    warm-up residual) and >= 20 queries (on a dev-loop subset one
    *    GC-unlucky query dominates the fraction; the driver's full run
    *    always qualifies).
    */
  private[graft] def contentionVerdict(sentinels: Seq[Double],
      spreads: Seq[Double], reps: Int): Boolean = {
    val post = sentinels.drop(1).filter(_ > 0)
    val sentinelDrift = post.size >= 2 && post.max / post.min > 2.5
    def frac(thr: Double): Double =
      if (spreads.nonEmpty) spreads.count(_ > thr).toDouble / spreads.size
      else 0.0
    val spreadFlag = reps >= 3 && spreads.size >= 20 &&
      (frac(1.5) > 0.10 || frac(2.0) > 0.05)
    sentinelDrift || spreadFlag
  }
}
