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
    // Contention sentinel: time a tiny fixed probe before and after the
    // suite. Its plan never changes, so if the machine is quiet the two
    // timings agree; drift marks the whole run as untrustworthy. min-of-3
    // on the probe itself so the sentinel isn't noisier than what it guards.
    def sentinelProbe(): Double = {
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        spark.read.parquet(s"$sfDir/region.parquet").count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.min
    }
    val sentinelBefore = sentinelProbe()
    // optional args filter to isolated queries (dev loop; driver passes none)
    val only = args.toSet
    val perRep = (SparkEntry.queries ++ Queries.benchOnly).toSeq.sortBy(_._1)
      .filter { case (name, _) => only.isEmpty || only.contains(name) }
      .map { case (name, fn) =>
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
    val sentinelAfter = sentinelProbe()
    val sentinelRatio =
      if (sentinelBefore > 0) sentinelAfter / sentinelBefore else 1.0
    val spreads = perRep.map { case (n, ts) =>
      n -> (if (ts.min > 0) median(ts) / ts.min else 1.0)
    }
    val contended = contentionVerdict(sentinelRatio, spreads.map(_._2), reps)
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
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"rep_times":$repJson,"spread":$spreadJson,"sentinel":{"before":${fmt(sentinelBefore)},"after":${fmt(sentinelAfter)},"ratio":${fmt(sentinelRatio)}},"contended":$contended,"sf":"$sfDir","reps":$reps,"agg":"min"}""")
    spark.stop()
  }

  private[graft] def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    if (s.size % 2 == 1) s(s.size / 2)
    else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
  }

  /** Per-query spread is median/min over the reps: a quiet run sits near
    * 1.0; a loaded box inflates the median uniformly. Either signal
    * alone can false-positive (sentinel: a burst between the two
    * probes; spread: one GC-unlucky rep), so the run is flagged on
    * sentinel drift OR a BROADLY inflated median — more than 25% of
    * queries with median/min > 1.5. Spread needs >= 3 reps to mean
    * anything (with 2 the median averages in the first rep's residual
    * warm-up, which legitimately exceeds 1.5 on a quiet machine).
    */
  private[graft] def contentionVerdict(sentinelRatio: Double,
      spreads: Seq[Double], reps: Int): Boolean = {
    val inflatedFrac =
      if (spreads.nonEmpty) spreads.count(_ > 1.5).toDouble / spreads.size
      else 0.0
    sentinelRatio > 1.5 || (reps >= 3 && inflatedFrac > 0.25)
  }
}
