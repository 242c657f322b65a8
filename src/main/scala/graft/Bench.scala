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
    def sentinelProbe(): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/region.parquet").count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val sentinels = scala.collection.mutable.ArrayBuffer(sentinelProbe())
    // optional args filter to isolated queries (dev loop; driver passes none)
    val only = args.toSet
    val perRep = (SparkEntry.queries ++ Queries.benchOnly).toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .zipWithIndex
      .map { case ((name, fn), qi) =>
        if (qi > 0 && qi % 10 == 0) sentinels += sentinelProbe()
        val times = (1 to reps).map { _ =>
          // isolate each timed run: operators that persist() intermediates
          // (dedup/ANN families) would otherwise leave cached blocks that
          // tax every query running after them in the alphabetical order —
          // the r7 bench showed code-unchanged small queries slowing 2-8x
          // from exactly this. Clear the cache and nudge GC OUTSIDE the
          // timed region so each number is attributable to its own plan.
          spark.catalog.clearCache()
          System.gc()
          // the GC above queues broadcast/shuffle cleanup on the async
          // ContextCleaner; give it a moment to drain OFF the timed
          // region, or the heavy dedup/ANN families' cleanup lands
          // inside whichever small query runs next (mdkv_doc_level
          // measured 0.7 s isolated vs ~3 s mid-suite from exactly this)
          Thread.sleep(200)
          val t0 = System.nanoTime()
          // noop sink, not count(): count() lets Catalyst prune every
          // unreferenced projection, so projection-heavy queries would time
          // a bare scan instead of the operator. The noop sink consumes
          // every row and column with zero write cost.
          try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          catch { case _: Throwable => () }
          (System.nanoTime() - t0) / 1e9
        }
        name -> times
      }
    sentinels += sentinelProbe()
    val spreads = perRep.map { case (n, ts) =>
      n -> (if (ts.min > 0) median(ts) / ts.min else 1.0)
    }
    val contended =
      contentionVerdict(sentinels.toSeq, spreads.map(_._2), reps)
    val results = perRep.map { case (n, ts) => n -> ts.min }
    // Locale.ROOT: the f-interpolator honors the JVM default locale, and
    // a comma-decimal locale would emit invalid JSON
    def fmt(d: Double): String =
      String.format(java.util.Locale.ROOT, "%.4f", Double.box(d))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val repJson = perRep.map { case (k, ts) =>
      "\"" + k + "\":[" + ts.map(fmt).mkString(",") + "]"
    }.mkString("{", ",", "}")
    val spreadJson = spreads.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val sentinelJson = sentinels.map(fmt).mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"rep_times":$repJson,"spread":$spreadJson,"sentinel":{"series":$sentinelJson,"before":${fmt(sentinels.head)},"after":${fmt(sentinels.last)}},"contended":$contended,"sf":"$sfDir","reps":$reps,"agg":"min"}""")
    spark.stop()
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
